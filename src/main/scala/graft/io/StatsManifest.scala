package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max stats manifest + pruned reads — the data-skipping
  * layer over a clustered write ([[graft.ops.Layout.zorderWrite]] or any
  * sorted layout).
  *
  * Why a manifest when Parquet footers already carry min/max? Planning
  * cost: at 100 TB a table is ~10⁵ files, and footer-based skipping reads
  * every footer at PLAN time (10⁵ remote reads before the first task
  * launches). Lifting the stats into ONE small JSON (the same move
  * Delta/Iceberg make with their manifests and the repo's own
  * `_graft_manifest` shard digests) makes pruning a driver-side scan of
  * one object: O(files) in-memory rows, zero data reads for fully-pruned
  * files.
  *
  * Correctness contract: pruning is SOUND (a file is skipped only when
  * its [min, max] envelope provably misses the predicate range — NULL
  * envelopes, meaning all-NULL or missing columns, are never skipped)
  * and reads re-apply the exact predicate, so `readRange` equals a full
  * scan + filter row-for-row (asserted in StatsManifestSpec). The
  * manifest collector is ONE distributed pass grouped on
  * `input_file_name` — partial aggregates per file, no shuffle of data
  * columns beyond the stat values themselves.
  */
object StatsManifest {

  val ManifestDir = "_graft_stats"

  /** The min/max collector body, parameterized by the scan so the full
    * build and the incremental delta share one aggregation shape. */
  private def statsOf(scan: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "statCols must be non-empty")
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    scan.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-file min/max of `statCols` over the parquet dataset at `path` —
    * columns `file`, then `<c>_min`, `<c>_max` per stat column. */
  def collect(spark: SparkSession, path: String,
              statCols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(path), statCols)

  /** Rows-derived manifests never see ZERO-ROW part files (an empty
    * write partition still lands a file), which would make the freshness
    * gate read them as "appended" and permanently fall back. Synthesize
    * a row per such file in `candidates` — `file` plus whatever
    * `defaults` say, stat columns NULL (range pruning keeps them
    * conservatively; a bloom treats them as key-less and skips them
    * soundly). */
  private def withEmptyFilesOf(spark: SparkSession,
                               candidates: Seq[String], m: DataFrame,
                               defaults: Seq[(String, Any)]): DataFrame = {
    import spark.implicits._
    val seen = m.select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val missing = candidates
      .filterNot(p => seen.contains(new org.apache.hadoop.fs.Path(p).getName))
    if (missing.isEmpty) m
    else {
      val extra = defaults.foldLeft(missing.toDF("file")) {
        case (df, (c, v)) => df.withColumn(c, lit(v))
      }
      m.unionByName(extra, allowMissingColumns = true)
    }
  }

  private def withEmptyFiles(spark: SparkSession, path: String,
                             m: DataFrame,
                             defaults: Seq[(String, Any)]): DataFrame =
    withEmptyFilesOf(spark, liveDataPaths(spark, path), m, defaults)

  /** Persist a manifest frame as ONE JSON object under `dir`, staging to
    * a sibling temp dir first: an incremental update's plan READS the
    * live manifest dir, so a direct overwrite would delete its own input
    * mid-execution. The stage-then-rename also shrinks the reader-visible
    * gap to the two renames (vs. overwrite's full delete+write window). */
  private def writeManifest(spark: SparkSession, dir: String,
                            m: DataFrame, coalesceOne: Boolean = true): Unit = {
    val target = new org.apache.hadoop.fs.Path(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".staging")
    // stats manifests are bytes-per-file and coalesce to ONE object; the
    // Bloom index is bits-per-ROW (GBs at 100 TB) and keeps its
    // partitioning so neither the write nor the probe ever single-threads
    (if (coalesceOne) m.coalesce(1) else m).sortWithinPartitions("file")
      .write.mode("overwrite").json(tmp.toString)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // rename-aside swap (BucketedTables' discipline), NOT delete+rename:
    // a crash between a delete and a rename would leave NO manifest and
    // every later update would fail on the read instead of recovering
    // (ADVICE r12) — here the previous manifest survives as `.old` until
    // the new one is in place, and [[recoverSwap]] at update entry rolls
    // a half-finished swap back
    graft.ops.BucketedTables.swapInto(fs, tmp, target)
  }

  /** Collect and persist the manifest under `<path>/_graft_stats` (one
    * JSON file — the planning object). Returns the manifest frame. */
  def write(spark: SparkSession, path: String,
            statCols: Seq[String]): DataFrame = {
    val m = withEmptyFiles(spark, path, collect(spark, path, statCols), Nil)
    writeManifest(spark, s"$path/$ManifestDir", m)
    m
  }

  /** Shared incremental-refresh skeleton: keep manifest rows whose file
    * is still live, DROP rows for vanished files (compaction/delete —
    * driver-side, no data read), and run `scan` over ONLY the files the
    * manifest has never seen. At 100 TB this is the difference between
    * re-indexing the table and indexing the day's append: cost is
    * O(appended bytes) + O(files) planning, never a full rescan.
    *
    * Stat values ride the manifest's JSON types (integral stats stay
    * exact; that is the documented manifest surface — `prunedFiles`
    * takes Long bounds). */
  private def update(spark: SparkSession, path: String, manifestDir: String,
                     defaults: Seq[(String, Any)],
                     coalesceOne: Boolean = true)
                    (scan: Seq[String] => DataFrame): DataFrame = {
    val dir = s"$path/$manifestDir"
    // a previous update may have crashed mid-swap (manifest moved aside
    // but its replacement not yet renamed in) — restore the previous
    // manifest instead of failing the json read
    graft.ops.BucketedTables.recoverSwap(
      new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(dir))
    val old = spark.read.json(dir)
    val liveP = liveDataPaths(spark, path)
    def base(p: String) = new org.apache.hadoop.fs.Path(p).getName
    val liveNames = liveP.map(base).toSet
    val oldNames = old.select("file").collect().map(r => base(r.getString(0))).toSet
    val newPaths = liveP.filterNot(p => oldNames.contains(base(p)))
    val kept = old.filter(
      element_at(split(col("file"), "/"), -1).isin(liveNames.toSeq: _*))
    val merged =
      if (newPaths.isEmpty) kept
      else kept.unionByName(
        withEmptyFilesOf(spark, newPaths, scan(newPaths), defaults),
        allowMissingColumns = true)
    writeManifest(spark, dir, merged, coalesceOne)
    spark.read.json(dir)
  }

  /** Incremental refresh of the stats manifest after appends/compaction —
    * scans only the unseen files; see [[update]]. */
  def updateStats(spark: SparkSession, path: String,
                  statCols: Seq[String]): DataFrame =
    update(spark, path, ManifestDir, Nil) { newPaths =>
      statsOf(spark.read.option("basePath", path).parquet(newPaths: _*),
        statCols)
    }

  /** Driver-side pruning over an already-loaded manifest frame: the
    * files whose `[min, max]` envelope on `statCol` overlaps `[lo, hi]`.
    * Files with NULL stats (all-NULL column, schema drift) are
    * conservatively KEPT — pruning must be sound, not tight. */
  private def prunedFilesOf(m: DataFrame, statCol: String,
                            lo: Long, hi: Long): Seq[String] = {
    val cols = m.columns.toSet
    // the JSON writer drops all-NULL fields: a manifest whose stat
    // columns are entirely missing prunes NOTHING (sound, not tight)
    if (!cols.contains(s"${statCol}_min") || !cols.contains(s"${statCol}_max"))
      m.select("file").collect().map(_.getString(0)).toSeq
    else
      m.filter(
          col(s"${statCol}_min").isNull || col(s"${statCol}_max").isNull ||
          (col(s"${statCol}_min") <= hi && col(s"${statCol}_max") >= lo))
        .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Driver-side pruning: [[prunedFilesOf]] over the persisted manifest. */
  def prunedFiles(spark: SparkSession, path: String, statCol: String,
                  lo: Long, hi: Long): Seq[String] =
    prunedFilesOf(spark.read.json(s"$path/$ManifestDir"), statCol, lo, hi)

  /** Full paths of the live (non-hidden) data files under `path`.
    * Driver-side O(files) listing, the same planning cost class as
    * reading the manifest itself. */
  def liveDataPaths(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(d: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(d).toSeq
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s.getPath.toString))
    walk(root)
  }

  /** Basenames of the live data files — the freshness fingerprint a
    * manifest is validated against. Basenames (not full URIs) because
    * `input_file_name()` and the Hadoop listing render the same file
    * with different scheme spellings; part-file names are unique within
    * a dataset. */
  def liveDataFiles(spark: SparkSession, path: String): Seq[String] =
    liveDataPaths(spark, path)
      .map(p => new org.apache.hadoop.fs.Path(p).getName)

  /** Does the persisted manifest still describe the live dataset? False
    * when files were added (their rows would be silently dropped by a
    * pruned read) or removed/compacted (a pruned read would fail on the
    * missing path) since `write`. */
  def isFresh(spark: SparkSession, path: String,
              manifestDir: String = ManifestDir): Boolean = {
    val manifest = spark.read.json(s"$path/$manifestDir")
      .select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    manifest == liveDataFiles(spark, path).toSet
  }

  /** Manifest-pruned range read: rows of the dataset with
    * `statCol ∈ [lo, hi]`, reading ONLY the overlapping files. Equals
    * full-scan + filter exactly (the residual filter re-applies the
    * predicate inside kept files; pruning only skips provable misses).
    *
    * Freshness gate (ADVICE r11): the manifest's file listing is
    * validated against the live directory at PLAN time — a manifest
    * that has gone stale (files appended, compacted, or deleted since
    * `write`) falls back to the unpruned full scan + filter, so a
    * completed writer can never make a pruned read silently drop rows
    * or fail on a vanished path. The fallback is logged; rewrite the
    * manifest to restore pruning. Scope honesty: the gate closes the
    * stale-manifest class, not filesystem races — a writer landing
    * BETWEEN this check and the action's file reads can still be
    * missed, exactly as with any non-transactional path-based table
    * (eliminating that window needs snapshot isolation, i.e. a
    * transaction log, which is outside this engine's sanctioned scope).
    * The manifest is read ONCE per call and serves both the freshness
    * check and the pruning (review r12 — the first cut read it twice,
    * doubling the O(files) planning cost the gate is documented as
    * matching). */
  def readRange(spark: SparkSession, path: String, statCol: String,
                lo: Long, hi: Long): DataFrame = {
    val m = spark.read.json(s"$path/$ManifestDir").persist()
    try {
      val manifestNames = m.select("file").collect()
        .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
      if (manifestNames != liveDataFiles(spark, path).toSet) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"StatsManifest at $path is stale (file listing changed since write) — " +
            "falling back to full scan; re-run StatsManifest.write to restore pruning")
        return spark.read.parquet(path)
          .filter(col(statCol) >= lo && col(statCol) <= hi)
      }
      val files = prunedFilesOf(m, statCol, lo, hi)
      val base =
        if (files.isEmpty)
          // keep the dataset schema at zero scan cost
          spark.read.parquet(path).filter(lit(false))
        else
          // basePath keeps Hive-style partition columns alive when
          // reading explicit leaf files (review r12: without it the
          // pruned branch's schema silently dropped partition columns,
          // diverging from the fallback and empty branches)
          spark.read.option("basePath", path).parquet(files: _*)
      base.filter(col(statCol) >= lo && col(statCol) <= hi)
    } finally m.unpersist(blocking = false)
  }

  // ----------------------------------------------------------- point lookups

  val BloomDir = "_graft_bloom"

  /** Per-file Bloom aggregation: inserts every key string, merges by bit
    * OR (order-independent, so the serialized filter is deterministic for
    * a given key set regardless of task scheduling). */
  private class FileBloomAgg(expectedItems: Long, fpp: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
    import org.apache.spark.util.sketch.BloomFilter
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, k: String): BloomFilter = {
      if (k != null) b.putString(k); b
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    def finish(b: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos); bos.toByteArray
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** Per-file Bloom index on `keyCol` — the POINT-lookup complement of
    * the min/max manifest: range envelopes prune nothing for a
    * high-cardinality key the layout wasn't clustered on (every file's
    * [min, max] spans the domain), but a per-file Bloom answers "which
    * files might hold THIS key" in one driver-side manifest scan, with
    * ~fpp false-file reads and zero false negatives. This is the
    * id-lookup path an audit / takedown / lineage probe takes against a
    * 10⁵-file table: O(files) planning, ~1 file read instead of 10⁵.
    *
    * One distributed pass grouped on `input_file_name`; the aggregation
    * buffer is the filter itself (bit arrays OR together), so the
    * exchange carries one serialized Bloom per file per partial, bounded
    * by `expectedItemsPerFile`·fpp sizing, never the keys. Written as
    * `<path>/_graft_bloom` JSON beside the stats manifest. */
  private def bloomOf(scan: DataFrame, keyCol: String,
                      expectedItemsPerFile: Long, fpp: Double): DataFrame = {
    require(expectedItemsPerFile > 0 && fpp > 0 && fpp < 1)
    val agg = udaf(new FileBloomAgg(expectedItemsPerFile, fpp),
      org.apache.spark.sql.Encoders.STRING)
    scan
      .select(input_file_name().as("file"), col(keyCol).cast("string").as("k"))
      .groupBy("file")
      .agg(base64(agg(col("k"))).as("bloom_b64"), count(lit(1)).as("nb_rows"))
  }

  def writeBloom(spark: SparkSession, path: String, keyCol: String,
                 expectedItemsPerFile: Long, fpp: Double = 0.01): DataFrame = {
    val m = withEmptyFiles(spark, path,
      bloomOf(spark.read.parquet(path), keyCol, expectedItemsPerFile, fpp),
      Seq("nb_rows" -> 0L))
    writeManifest(spark, s"$path/$BloomDir", m, coalesceOne = false)
    m
  }

  /** Incremental refresh of the Bloom index after appends/compaction —
    * per-file filters are independent, so only the unseen files are
    * scanned and hashed; see [[update]]. */
  def updateBloom(spark: SparkSession, path: String, keyCol: String,
                  expectedItemsPerFile: Long, fpp: Double = 0.01): DataFrame =
    update(spark, path, BloomDir, Seq("nb_rows" -> 0L),
      coalesceOne = false) { newPaths =>
      bloomOf(spark.read.option("basePath", path).parquet(newPaths: _*),
        keyCol, expectedItemsPerFile, fpp)
    }

  /** Files whose Bloom might contain ANY of `keys` — sound (no false
    * negatives: a key present in a file always keeps that file), tight
    * up to the filter's fpp.
    *
    * The probe is a DISTRIBUTED scan of the index that collects only the
    * hit file names: unlike the min/max manifest (a few dozen bytes per
    * file), a Bloom index weighs ~9.6 bits per ROW at 1% fpp — ~0.12% of
    * the table, GBs at 100 TB — so it must never be required to fit on
    * the driver. The keys ride the task closure (point probes are a
    * handful of ids), and the driver holds O(hit files). */
  def pointFiles(spark: SparkSession, path: String,
                 keys: Seq[String]): Seq[String] = {
    require(keys.nonEmpty, "keys must be non-empty")
    val m = spark.read.json(s"$path/$BloomDir")
    // zero-row files carry no bloom (NULL / column absent when ALL files
    // are empty) — no rows means no keys, so skipping them is sound
    if (!m.columns.contains("bloom_b64")) return Seq.empty
    val keyArr = keys.toArray
    val hit = udf { (b64: String) =>
      b64 != null && {
        // MIME decoder: Spark's base64() chunks output with CRLF breaks
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(
            java.util.Base64.getMimeDecoder.decode(b64)))
        keyArr.exists(bf.mightContainString)
      }
    }
    m.filter(hit(col("bloom_b64"))).select("file")
      .collect().map(_.getString(0)).toSeq
  }

  /** Bloom-pruned point read: rows with `keyCol ∈ keys`, reading only
    * the files whose Bloom might hold one of them. Equals full scan +
    * IN-filter row-for-row: pruning has no false negatives, and the
    * exact predicate re-applies inside kept files (clearing Bloom false
    * positives). Same freshness gate as [[readRange]] — a stale index
    * (files appended/compacted since [[writeBloom]]) falls back to the
    * unpruned scan rather than silently dropping rows. */
  def readPoints(spark: SparkSession, path: String, keyCol: String,
                 keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val pred = col(keyCol).cast("string").isin(keys: _*)
    val manifestNames = spark.read.json(s"$path/$BloomDir")
      .select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    if (manifestNames != liveDataFiles(spark, path).toSet) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Bloom index at $path is stale — falling back to full scan; " +
          "re-run StatsManifest.writeBloom to restore point pruning")
      return spark.read.parquet(path).filter(pred)
    }
    val files = pointFiles(spark, path, keys)
    val base =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.option("basePath", path).parquet(files: _*)
    base.filter(pred)
  }
}

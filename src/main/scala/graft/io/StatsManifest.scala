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

  /** Per-file min/max of `statCols` over the parquet dataset at `path` —
    * columns `file`, then `<c>_min`, `<c>_max` per stat column. */
  def collect(spark: SparkSession, path: String,
              statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "statCols must be non-empty")
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Collect and persist the manifest under `<path>/_graft_stats` (one
    * JSON file — the planning object). Returns the manifest frame. */
  def write(spark: SparkSession, path: String,
            statCols: Seq[String]): DataFrame = {
    val m = collect(spark, path, statCols)
    m.coalesce(1).sortWithinPartitions("file")
      .write.mode("overwrite").json(s"$path/$ManifestDir")
    m
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

  /** Basenames of the live (non-hidden) data files under `path` — the
    * freshness fingerprint a manifest is validated against. Driver-side
    * O(files) listing, the same planning cost class as reading the
    * manifest itself. Basenames (not full URIs) because
    * `input_file_name()` and the Hadoop listing render the same file
    * with different scheme spellings; part-file names are unique within
    * a dataset. */
  def liveDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(d: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(d).toSeq
        .filterNot { s =>
          val n = s.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .flatMap(s => if (s.isDirectory) walk(s.getPath) else Seq(s.getPath.getName))
    walk(root)
  }

  /** Does the persisted manifest still describe the live dataset? False
    * when files were added (their rows would be silently dropped by a
    * pruned read) or removed/compacted (a pruned read would fail on the
    * missing path) since `write`. */
  def isFresh(spark: SparkSession, path: String): Boolean = {
    val manifest = spark.read.json(s"$path/$ManifestDir")
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
}

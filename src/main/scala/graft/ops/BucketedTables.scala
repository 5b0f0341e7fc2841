package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.col

/** Shared plumbing for PERSISTED BUCKETED lake tables — the pattern both
  * the incremental-curation state ([[CurateIncremental]]) and the ANN
  * index ([[AnnIndex]]) are built on: corpus-scale tables bucketed by
  * their probe keys so a daily/query join plans NO exchange on the
  * big side, with crash-safe mutation (temp-sibling writes + atomic
  * swap + half-swap recovery) and catalog re-registration over existing
  * files on fresh sessions (bucket metadata lives in the in-memory
  * session catalog; the count is pinned in a caller-owned sidecar).
  *
  * Everything here is directory-path-based and caller-agnostic; the
  * owning operator decides layout, sidecar format and write order. */
private[graft] object BucketedTables {

  def hadoopFs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Atomically replace `live` with `tmp`: live → live.old, tmp → live,
    * delete live.old. The live data is never deleted before its
    * replacement is complete on disk; a crash between the renames leaves
    * `.old` for [[recoverSwap]] to roll back. */
  def swapInto(fs: FileSystem, tmp: Path, live: Path): Unit = {
    val old = new Path(live.toString + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live) && !fs.rename(live, old))
      sys.error(s"state swap: could not move $live aside")
    if (!fs.rename(tmp, live)) {
      if (fs.exists(old)) fs.rename(old, live) // restore the previous state
      sys.error(s"state swap: could not move $tmp into place")
    }
    fs.delete(old, true)
    ()
  }

  /** Roll a half-finished [[swapInto]] back: if the live dir is missing
    * but its `.old` sibling exists, the crash hit between the two
    * renames — restore the previous snapshot. */
  def recoverSwap(fs: FileSystem, live: Path): Unit = {
    val old = new Path(live.toString + ".old")
    if (!fs.exists(live) && fs.exists(old)) { fs.rename(old, live); () }
  }

  def registerBucketed(spark: SparkSession, dir: String, table: String,
                       buckets: Int, bucketCols: Seq[String]): Unit = {
    val schema = spark.read.parquet(dir).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schema) USING PARQUET
         |CLUSTERED BY (${bucketCols.mkString(", ")})
         |SORTED BY (${bucketCols.mkString(", ")}) INTO $buckets BUCKETS
         |LOCATION '$dir'""".stripMargin)
    ()
  }

  /** Make `table` resolve to the bucketed files at `dir` — reuse a live
    * catalog entry when it already points there, re-register via DDL
    * otherwise (fresh session, or the name is held by another root). */
  def ensureRegistered(spark: SparkSession, dir: String, table: String,
                       buckets: Int, bucketCols: Seq[String]): Unit = {
    recoverSwap(hadoopFs(spark, new Path(dir)), new Path(dir))
    val cat = spark.sessionState.catalog
    val ident = TableIdentifier(table)
    val current =
      if (cat.tableExists(ident))
        Some(new Path(cat.getTableMetadata(ident).location).toUri.getPath)
      else None
    if (current.contains(new Path(dir).toUri.getPath))
      spark.catalog.refreshTable(table)
    else registerBucketed(spark, dir, table, buckets, bucketCols)
  }

  /** Snapshot-write `df` as a bucketed table at `dir`: write to a temp
    * sibling (never into the live dir — `df`'s lineage may read it),
    * swap atomically, re-register the catalog entry over the new files.
    * `repartition` on the bucket columns aligns write partitions with
    * buckets (same murmur3 hash), so each bucket lands in exactly one
    * file instead of one per task. */
  def writeBucketedSnapshot(df: DataFrame, dir: String, table: String,
                            buckets: Int, bucketCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val live = new Path(dir)
    val fs = hadoopFs(spark, live)
    recoverSwap(fs, live)
    val tmp = new Path(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    // df is fully resolved (its file listing is captured), so dropping the
    // catalog entry first is safe — and saveAsTable must not see a live
    // entry pointing at a different path than the temp target
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", tmp.toString).mode("overwrite").saveAsTable(table)
    swapInto(fs, tmp, live)
    registerBucketed(spark, dir, table, buckets, bucketCols)
  }

  /** Plain-parquet snapshot with the same temp-sibling + swap discipline. */
  def writePlainSnapshot(df: DataFrame, dir: String, partitions: Int): Unit = {
    val spark = df.sparkSession
    val live = new Path(dir)
    val fs = hadoopFs(spark, live)
    recoverSwap(fs, live)
    val tmp = new Path(dir + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    df.repartition(partitions).write.mode("overwrite").parquet(tmp.toString)
    swapInto(fs, tmp, live)
    spark.catalog.refreshByPath(dir)
  }

  def appendBucketed(df: DataFrame, dir: String, table: String,
                     buckets: Int, bucketCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    ensureRegistered(spark, dir, table, buckets, bucketCols)
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", dir).mode("append").saveAsTable(table)
  }

  /** part-files currently under `dir` (0 when the dir is missing) — the
    * observable behind the files-per-bucket auto-compaction policies:
    * every bucketed append lands one file per bucket, so
    * count/buckets ≈ appends-since-compaction + 1. */
  def partFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(s => s.isFile && s.getPath.getName.startsWith("part-"))
  }

  /** Catalog table name for a persisted table — deterministic in the
    * directory path, so two roots in one session never collide. */
  def tableName(prefix: String, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    s"graft_${prefix}_" + md.take(5).map("%02x".format(_)).mkString
  }

  /** Overwrite a tiny JSON sidecar ATOMICALLY: write a dot-prefixed tmp
    * sibling, then rename over the target (delete-first —
    * RawLocalFileSystem's rename refuses to replace). Two invariants
    * hang off the tmp-then-rename (ADVICE r15): a crash mid-write can
    * never leave a TORN body a later load mis-parses (readers see the
    * old sidecar, the new one, or — in the delete-rename sliver — none,
    * which every reader already treats as absent), and the write always
    * allocates a NEW inode, so a hardlinked clone of the old sidecar
    * (the copyTree fixture discipline) can never be mutated through a
    * shared inode by an in-place truncate. */
  def writeJsonSidecar(spark: SparkSession, p: Path, body: String): Unit = {
    val fs = hadoopFs(spark, p)
    val tmp = new Path(p.getParent,
      "." + p.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      sys.error(s"sidecar rename failed: $tmp -> $p")
    ()
  }

  /** Read a JSON sidecar; None when absent. */
  def readJsonSidecar(spark: SparkSession, p: Path): Option[String] = {
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Pull an integer field out of a sidecar body. */
  def jsonInt(body: String, field: String): Option[Int] =
    s""""$field"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)

  /** Pull a long field out of a sidecar body — for values that can
    * legitimately exceed Int.MaxValue (threshold numerators, row
    * counts): parsing those through [[jsonInt]] crashes every LOAD with
    * NumberFormatException after the WRITE silently succeeded
    * (ADVICE r13). */
  def jsonLong(body: String, field: String): Option[Long] =
    s""""$field"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)

  /** Pull a double field out of a sidecar body (accepts integers too). */
  def jsonDouble(body: String, field: String): Option[Double] =
    s""""$field"\\s*:\\s*(-?\\d+(?:\\.\\d+)?([eE]-?\\d+)?)""".r
      .findFirstMatchIn(body).map(_.group(1).toDouble)
}

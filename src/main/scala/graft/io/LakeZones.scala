package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Lake-zone Parquet writers (SURVEY.md §2.1 S7/S9/S10).
  *
  * Layout mirrors the reference's export zones
  * (`scripts/export/export_to_parquet.py:27-37,55-60,100,109`):
  *
  * {{{ <lakeRoot>/<zone>/<name>/snapshot_date=<YYYY-MM-DD>/part-….parquet }}}
  *
  * The reference's per-day idempotency — `INSERT … ON CONFLICT DO UPDATE`
  * re-running a day replaces that day's rows
  * (`scripts/load/load_raw_to_postgres.py:103-110`) — maps to Spark
  * dynamic partition overwrite: only the snapshot_date partitions present
  * in the incoming batch are replaced, other days are untouched, and the
  * swap is atomic at partition granularity (SURVEY §2.1 S7 route (a)).
  */
object LakeZones {

  /** S10: partitioned snappy Parquet write, dynamic overwrite. `df` must
    * carry a `snapshot_date` column (the partition key). Re-running the
    * same batch is a no-op on content — the idempotency property the
    * reference gets from its keyed upsert. */
  def writePartitioned(df: DataFrame, root: String, zone: String, name: String): String = {
    val path = s"$root/$zone/$name"
    df.write
      .mode("overwrite")
      // per-write option, not session conf: a concurrent caller keeps
      // static full-table overwrite semantics everywhere else
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .partitionBy("snapshot_date")
      .parquet(path)
    path
  }

  /** S7 (full write half): upsert a keyed batch into a partitioned table.
    * Within the batch, the PK `(snapshot_date, keys…)` is enforced by
    * last-write-wins dedup under `order`; across runs, dynamic partition
    * overwrite replaces exactly the days present in the batch. */
  def upsertByDay(batch: DataFrame, root: String, zone: String, name: String,
                  keys: Seq[String],
                  order: Seq[org.apache.spark.sql.Column]): String = {
    val deduped = Relational.lastWriteWins(batch, "snapshot_date" +: keys, order: _*)
    writePartitioned(deduped, root, zone, name)
  }

  /** S7 (streaming face): merge-upsert a micro-batch into a partitioned
    * lake table. [[upsertByDay]] assumes the batch carries the COMPLETE
    * refreshed content of every day it touches (true for batch snapshot
    * runs); a streaming update-mode batch instead carries only the CHANGED
    * keys, so here the batch is merged with the existing rows of exactly
    * the touched day partitions under keyed last-write-wins, and only
    * those partitions are rewritten.
    *
    * Scale posture: the read-modify-write is bounded by the partitions
    * present in the batch, not the table — the `days` list collected to
    * the driver is one value per touched day (small by construction), and
    * partition pruning keeps the merge read to those directories. The
    * merged days are STAGED to a sibling temp directory and then swapped
    * into place per partition: the staging write's plan reads the live
    * table (no self-overwriting scan), and nothing is pinned in executor
    * storage — r4 materialized the touched days via `localCheckpoint`,
    * which held a full day's partition in executor local storage and
    * would not survive a 100 TB day.
    *
    * Crash safety: the swap is a backup-rename protocol, not
    * delete+rename. Per staged day directory (taken by its LITERAL name
    * under the staging dir, so Hive-escaped and
    * `__HIVE_DEFAULT_PARTITION__` values swap correctly): (1) rename the
    * live partition into a hidden per-table undo dir, (2) rename the
    * staged partition into place, (3) drop the backup. Every
    * `FileSystem.rename` boolean is checked — HDFS reports several
    * failure modes by returning false, not throwing — so a failed swap
    * is loud and the staged data survives for the caller's replay. A
    * hard crash at ANY point leaves a state [[sweepStaleDirs]] repairs
    * at next entry: a backup with no live partition is restored, a
    * backup with a live partition is dropped, and orphaned staging dirs
    * are removed. Re-running the same batch then converges to the merged
    * state with no window where a day's rows are lost (golden-tested by
    * simulating a crash between the two renames).
    *
    * SINGLE WRITER per table, externally serialized — the same contract
    * as the reference's daily Airflow DAG (one task writes a table at a
    * time) and as Spark's own dynamic partition overwrite. Two
    * concurrent merge-upserts on one table are not merely racy: the
    * entry sweep treats the other run's staging/undo dirs as crash
    * leftovers and repairs them away. Streaming callers get this for
    * free (foreachBatch serializes batches per query); anything else
    * must hold an external lock or write disjoint tables. */
  def mergeUpsertByDay(batch: DataFrame, root: String, zone: String, name: String,
                       keys: Seq[String],
                       order: Seq[org.apache.spark.sql.Column]): String = {
    val spark = batch.sparkSession
    val path = s"$root/$zone/$name"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sweepStaleDirs(fs, root, zone, name)
    if (!fs.exists(hPath))
      return upsertByDay(batch, root, zone, name, keys, order)
    val dayStrs = batch.select(col("snapshot_date").cast("string")).distinct()
      .collect().map(r => Option(r.getString(0))).toSeq
    if (dayStrs.isEmpty) return path // empty batch: nothing to rewrite
    val nonNullDays = dayStrs.flatten
    val touchesNullDay = dayStrs.exists(_.isEmpty)
    val dayPred = {
      val base = col("snapshot_date").cast("string").isin(nonNullDays: _*)
      if (touchesNullDay) base || col("snapshot_date").isNull else base
    }
    val existing = readTable(spark, root, zone, name)
      .filter(dayPred)
      .select(batch.columns.map(col).toIndexedSeq: _*)
    val merged = Relational.lastWriteWins(
      existing.unionByName(batch), "snapshot_date" +: keys, order: _*)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$root/$zone/.staging_${name}_${java.util.UUID.randomUUID().toString.take(8)}")
    merged.write
      .mode("overwrite")
      .option("compression", "snappy")
      .partitionBy("snapshot_date")
      .parquet(tmp.toString)
    val undo = undoDir(root, zone, name)
    var swapFailed = false
    try {
      // swap the partition dirs that were ACTUALLY staged, by literal
      // name — never reconstructed from the collected day strings, which
      // would mis-resolve Hive-escaped or null partition values
      stagedPartitionDirs(fs, tmp).foreach { st =>
        val partName = st.getPath.getName
        val target = new org.apache.hadoop.fs.Path(hPath, partName)
        val backup = new org.apache.hadoop.fs.Path(undo, partName)
        if (fs.exists(target)) {
          if (!fs.mkdirs(undo))
            throw new java.io.IOException(s"mergeUpsertByDay: mkdirs failed for $undo")
          if (fs.exists(backup)) fs.delete(backup, true)
          if (!fs.rename(target, backup)) {
            swapFailed = true
            throw new java.io.IOException(
              s"mergeUpsertByDay: backup rename failed for $partName (staged data kept at $tmp)")
          }
        }
        if (!fs.rename(st.getPath, target)) {
          swapFailed = true
          throw new java.io.IOException(
            s"mergeUpsertByDay: swap rename failed for $partName (staged data kept at $tmp)")
        }
        fs.delete(backup, true)
      }
      if (fs.exists(undo) && fs.listStatus(undo).isEmpty) fs.delete(undo, true)
    } finally {
      // only clean up the staging dir on success — on a failed swap the
      // staged merge is the sole complete copy of the day's rows, and the
      // next entry's sweep (after backup restore) removes it
      if (!swapFailed) { fs.delete(tmp, true); () }
    }
    path
  }

  private def undoDir(root: String, zone: String, name: String) =
    new org.apache.hadoop.fs.Path(s"$root/$zone/.undo_$name")

  private def stagedPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: org.apache.hadoop.fs.Path) =
    fs.listStatus(dir).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("snapshot_date="))

  /** Repair after a crash mid-swap (called at every [[mergeUpsertByDay]]
    * entry; idempotent, no-op when nothing is stale):
    *   - a backup partition in `.undo_<name>/` whose live partition is
    *     MISSING means the crash hit between the two renames — restore it
    *     (the re-run's merge then sees the pre-crash rows);
    *   - a backup whose live partition EXISTS means the crash hit after
    *     the swap completed — the live dir is newer, drop the backup;
    *   - any `.staging_<name>_*` dir is a dead run's scratch — drop it
    *     (after restore, so a staged-but-unswapped merge is never the
    *     only copy when it's deleted). */
  def sweepStaleDirs(fs: org.apache.hadoop.fs.FileSystem,
                     root: String, zone: String, name: String): Unit = {
    val zonePath = new org.apache.hadoop.fs.Path(s"$root/$zone")
    val tablePath = new org.apache.hadoop.fs.Path(s"$root/$zone/$name")
    val undo = undoDir(root, zone, name)
    if (fs.exists(undo)) {
      fs.listStatus(undo).foreach { st =>
        val live = new org.apache.hadoop.fs.Path(tablePath, st.getPath.getName)
        if (fs.exists(live)) fs.delete(st.getPath, true)
        else if (!fs.rename(st.getPath, live))
          throw new java.io.IOException(
            s"sweepStaleDirs: restore rename failed for ${st.getPath}")
      }
      fs.delete(undo, true)
    }
    if (fs.exists(zonePath)) {
      fs.listStatus(zonePath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(s".staging_${name}_"))
        .foreach(st => fs.delete(st.getPath, true))
    }
  }

  /** S11: read a lake table back (all days, partition column recovered from
    * the directory layout; filter on snapshot_date prunes partitions).
    * `mergeSchema = true` reconciles per-day schema evolution — a column
    * added in later day partitions reads as NULL for earlier days (at the
    * cost of a footer scan per file, so leave it off for pinned-schema
    * tables). */
  def readTable(spark: SparkSession, root: String, zone: String, name: String,
                mergeSchema: Boolean = false): DataFrame =
    spark.read
      .option("basePath", s"$root/$zone/$name")
      .option("mergeSchema", mergeSchema)
      .parquet(s"$root/$zone/$name")

  /** S9: the reference's EXPORTS manifest
    * (`export_to_parquet.py:27-37`) — (zone, exported name) per model. */
  val exports: Map[String, (String, String)] = Map(
    "stg_tmdb_popular" -> ("formatted", "tmdb_popular"),
    "stg_tmdb_details" -> ("formatted", "tmdb_details"),
    "stg_omdb_ratings" -> ("formatted", "omdb_ratings"),
    "movies_enriched_daily" -> ("usage", "movies_enriched"),
    "kpi_daily_summary" -> ("usage", "kpi_daily")
  )

  /** Export all five model tables per the manifest (stage 5 of the
    * lifecycle, SURVEY §3.3). Returns name → written path.
    *
    * The writes are INDEPENDENT outputs of one lineage, so they submit
    * CONCURRENTLY (Spark sessions accept multi-threaded job submission;
    * [[writePartitioned]] uses per-write options, no session conf, so
    * there is no shared mutable state between them). Sequential writes
    * pay five scheduling waits end-to-end — concurrent submission packs
    * them into the idle task slots of each other's tail stages, which is
    * both the per-day backfill win measured in q82 and how a 1000-
    * executor cluster keeps its slots busy during a many-table export. */
  def exportAll(models: Map[String, DataFrame], root: String): Map[String, String] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(models.size, 5)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      // every write is wrapped in Try and ALL are awaited before any
      // failure is rethrown (review r12): Await.result on a plain
      // Future.sequence rethrows on the first failure while queued and
      // in-flight writes keep running, racing whatever cleanup/retry the
      // caller starts against directories still being written
      val results = Await.result(
        Future.sequence(models.toSeq.map { case (model, df) =>
          val (zone, name) = exports(model)
          Future(scala.util.Try(model -> writePartitioned(df, root, zone, name)))
        }), Duration.Inf)
      results.foreach {
        case scala.util.Failure(e) => throw e
        case _ => ()
      }
      results.map(_.get).toMap
    } finally pool.shutdown()
  }
}

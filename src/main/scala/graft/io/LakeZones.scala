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
    * would not survive a 100 TB day. The swap (delete + rename per day
    * directory) has the same partition-granularity atomicity as dynamic
    * partition overwrite. */
  def mergeUpsertByDay(batch: DataFrame, root: String, zone: String, name: String,
                       keys: Seq[String],
                       order: Seq[org.apache.spark.sql.Column]): String = {
    val spark = batch.sparkSession
    val path = s"$root/$zone/$name"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath))
      return upsertByDay(batch, root, zone, name, keys, order)
    val days = batch.select(col("snapshot_date").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (days.isEmpty) return path // empty batch: nothing to rewrite
    val existing = readTable(spark, root, zone, name)
      .filter(col("snapshot_date").cast("string").isin(days: _*))
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
    try {
      days.foreach { day =>
        val target = new org.apache.hadoop.fs.Path(hPath, s"snapshot_date=$day")
        val staged = new org.apache.hadoop.fs.Path(tmp, s"snapshot_date=$day")
        if (fs.exists(staged)) {
          if (fs.exists(target)) fs.delete(target, true)
          fs.rename(staged, target)
        }
      }
    } finally fs.delete(tmp, true)
    path
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
    * lifecycle, SURVEY §3.3). Returns name → written path. */
  def exportAll(models: Map[String, DataFrame], root: String): Map[String, String] =
    models.map { case (model, df) =>
      val (zone, name) = exports(model)
      model -> writePartitioned(df, root, zone, name)
    }
}

package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Raw-zone JSON IO (SURVEY.md §2.1 S4–S6).
  *
  * Layout mirrors the reference's lake
  * (`scripts/ingest/fetch_tmdb.py:54,70`; `load_raw_to_postgres.py:83,117,161`):
  *
  * {{{ <root>/<source>/<endpoint>/date=<YYYY-MM-DD>/<file>.json }}}
  *
  * Every record carries the `_meta` lineage envelope
  * (`fetch_tmdb.py:30-43`); readers also accept bare payloads
  * (`load_raw_to_postgres.py:35-39` `unwrap`). Corrupt files are tolerated
  * per-record (the reference's per-file `try/except continue`,
  * `load_raw_to_postgres.py:153-155`) via PERMISSIVE mode, and a missing
  * date partition is skip-with-warning (`load_raw_to_postgres.py:83-85`),
  * yielding an empty frame instead of failing the run.
  */
object RawZone {

  def partitionPath(root: String, source: String, endpoint: String, date: String): String =
    s"$root/$source/$endpoint/date=$date"

  private val CORRUPT = "_corrupt_record"

  /** S4: wrap `dataCol` in the `{_meta, data}` envelope and write one JSON
    * line per record under the date partition. Lineage fields match
    * `fetch_tmdb.py:32-38`. */
  def writeEnveloped(df: DataFrame, dataCol: String, root: String, source: String,
                     endpoint: String, snapshotDate: String, runId: String): Unit = {
    df.select(
        struct(
          lit(snapshotDate).as("snapshot_date"),
          lit(runId).as("run_id"),
          date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .as("extracted_at_utc"),
          lit(source).as("source"),
          lit(endpoint).as("endpoint")
        ).as("_meta"),
        col(dataCol).as("data"))
      .write.mode("overwrite")
      .json(partitionPath(root, source, endpoint, snapshotDate))
  }

  /** S5+S6: read one date partition of a feed with a pinned payload schema.
    *
    * Returns columns `(_meta, data, _src_file)`. Accepts both enveloped and
    * bare payloads: the read schema carries the payload fields at BOTH the
    * top level and under `data`, and unwrap prefers `data` when present.
    * Unparseable records (PERMISSIVE `_corrupt_record`) and records with no
    * recognizable payload are dropped, matching the reference's per-file
    * error isolation. A missing partition dir returns an empty frame.
    *
    * `multiLine=true` accepts the reference's pretty-printed
    * one-object-per-file form (`fetch_tmdb.py:41-43`) as well as JSON lines.
    */
  def readEnveloped(spark: SparkSession, root: String, source: String, endpoint: String,
                    snapshotDate: String, dataSchema: StructType,
                    multiLine: Boolean = false): DataFrame = {
    val path = partitionPath(root, source, endpoint, snapshotDate)
    val readSchema = StructType(
      Seq(
        StructField("_meta", Schemas.metaSchema),
        StructField("data", dataSchema),
        StructField(CORRUPT, StringType)
      ) ++ dataSchema.fields // bare-payload form: fields at top level
    )
    if (!pathExists(spark, path)) {
      System.err.println(s"[raw] missing partition, skipping: $path")
      return emptyUnwrapped(spark, dataSchema)
    }
    val raw = spark.read
      .schema(readSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT)
      .option("multiLine", multiLine)
      .json(path)
      .withColumn("_src_file", input_file_name())
    val bare = struct(dataSchema.fields.map(f => col(f.name)): _*)
    raw
      .withColumn("data", when(col("data").isNotNull, col("data")).otherwise(bare))
      // a record is garbage when it failed the parse outright, or parsed to
      // a payload with every field null (e.g. an empty object)
      .filter(col(CORRUPT).isNull &&
        dataSchema.fields.map(f => col(s"data.${f.name}").isNotNull)
          .foldLeft(lit(false))(_ || _))
      .select(col("_meta"), col("data"), col("_src_file"))
  }

  /** File stem of the source path (OMDb files are keyed by name:
    * `raw/omdb/ratings/date=…/<imdb_id>.json`, `load_raw_to_postgres.py:179`). */
  def srcFileStem: org.apache.spark.sql.Column =
    regexp_extract(col("_src_file"), "([^/]+)\\.json$", 1)

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def emptyUnwrapped(spark: SparkSession, dataSchema: StructType): DataFrame = {
    val schema = StructType(Seq(
      StructField("_meta", Schemas.metaSchema),
      StructField("data", dataSchema),
      StructField("_src_file", StringType)
    ))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}

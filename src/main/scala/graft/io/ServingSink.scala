package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving sink (SURVEY.md §2.1 S12/S13): Elasticsearch bulk-index payload
  * builder, written to disk as a dry-run in this offline environment.
  *
  * Reproduces `scripts/index/index_elasticsearch.py`:
  *  - explicit mapping bootstrap per index, create-iff-missing
  *    (`index_elasticsearch.py:41-59,179-225`);
  *  - `_bulk` NDJSON: an action line `{"index":{"_index":…,"_id":…}}` then
  *    the document line per row (`index_elasticsearch.py:114-128`);
  *  - stable doc `_id` = `"_".join(id_cols)` → idempotent re-index
  *    (`index_elasticsearch.py:123,245-246`);
  *  - date/timestamp columns serialized as `YYYY-MM-DD` strings and
  *    NaN→null (`index_elasticsearch.py:107-112`).
  *
  * The payload is built as one string column, partition-parallel — a live
  * sink would `foreachPartition` POST chunks to `/_bulk`; the dry run
  * writes the identical bytes as text files.
  */
object ServingSink {

  /** ES field type for a Spark column (the reference pins these by hand at
    * `index_elasticsearch.py:179-225`; same vocabulary). */
  private def esType(dt: DataType): String = dt match {
    case DateType | TimestampType => "date"
    case DoubleType | FloatType | _: DecimalType => "double"
    case LongType => "long"
    case IntegerType | ShortType | ByteType => "integer"
    case BooleanType => "boolean"
    case _ => "keyword"
  }

  /** Per-field mapping overrides mirroring the reference's hand-pinned
    * movie mapping (`index_elasticsearch.py:179-207`):
    *  - `textKeywordFields` → full-text `text` with a `.keyword` subfield
    *    (exact-match aggregations AND free-text search — the reference's
    *    Kibana dashboards rely on both for `title`/`director`);
    *  - `textFields` → plain `text` (`actors`);
    *  - `typeOverrides` → verbatim type pin (e.g. `metascore` staged as
    *    int but mapped `double`, `index_elasticsearch.py:196`). */
  case class FieldSpec(
      textKeywordFields: Set[String] = Set.empty,
      textFields: Set[String] = Set.empty,
      typeOverrides: Map[String, String] = Map.empty)

  /** The reference's pinned choices for the movies index
    * (`index_elasticsearch.py:179-207`): `metascore` staged int but mapped
    * `double`, `imdb_votes` staged long but mapped `integer`. */
  val movieFieldSpec: FieldSpec = FieldSpec(
    textKeywordFields = Set("title", "director"),
    textFields = Set("actors"),
    typeOverrides = Map("metascore" -> "double", "imdb_votes" -> "integer"))

  /** The reference's pinned choices for the KPI index
    * (`index_elasticsearch.py:210-225`): the four counts are mapped
    * `integer` even though Spark `count()` produces longs. */
  val kpiFieldSpec: FieldSpec = FieldSpec(
    typeOverrides = Map(
      "nb_movies" -> "integer",
      "nb_movies_with_omdb" -> "integer",
      "nb_overhyped" -> "integer",
      "nb_hidden_gems" -> "integer"))

  private def fieldJson(f: StructField, spec: FieldSpec): String =
    if (spec.textKeywordFields(f.name))
      s""""${f.name}":{"type":"text","fields":{"keyword":{"type":"keyword"}}}"""
    else if (spec.textFields(f.name))
      s""""${f.name}":{"type":"text"}"""
    else {
      val t = spec.typeOverrides.getOrElse(f.name, esType(f.dataType))
      s""""${f.name}":{"type":"$t"}"""
    }

  /** S12: index mapping JSON derived from the frame's schema (1 shard,
    * 0 replicas — `index_elasticsearch.py:180,211`), with per-field
    * overrides for the reference's text/numeric pins. */
  def mappingJson(df: DataFrame, spec: FieldSpec = FieldSpec()): String = {
    val props = df.schema.fields.map(fieldJson(_, spec)).mkString(",")
    s"""{"settings":{"number_of_shards":1,"number_of_replicas":0},"mappings":{"properties":{$props}}}"""
  }

  /** S12: bootstrap the index mapping file iff missing (the reference's
    * 200→skip / 404→create check, `index_elasticsearch.py:41-59`).
    * Returns true when created. */
  def bootstrapMapping(df: DataFrame, outDir: String, index: String,
                       spec: FieldSpec = FieldSpec()): Boolean = {
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve(s"$index.mapping.json")
    if (java.nio.file.Files.exists(f)) false
    else { java.nio.file.Files.writeString(f, mappingJson(df, spec)); true }
  }

  /** S13: one NDJSON bulk line-pair per row, as a single-column frame of
    * strings. Dates/timestamps → `YYYY-MM-DD`; nulls kept explicit in the
    * doc JSON (Python `json.dumps` writes them; Spark's `to_json` is told
    * not to drop them). */
  def bulkLines(df: DataFrame, index: String, idCols: Seq[String]): DataFrame = {
    val normalized: Seq[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case DateType | TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd").as(f.name)
        // NaN→null, the header contract (`index_elasticsearch.py:107-112`)
        // — review r12: to_json would otherwise emit the STRING "NaN",
        // which ES rejects for a double-mapped field
        case DoubleType | FloatType =>
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq
    val norm = df.select(normalized: _*)
    // the action line is hand-framed NDJSON, so the id must be
    // JSON-string-escaped (review r12): a quote/backslash/newline in an
    // id column would otherwise corrupt the bulk framing and shift every
    // subsequent action/doc pairing. Backslash first, then quote, then
    // the whitespace control characters.
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
        "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    val idCol = esc(concat_ws("_",
      idCols.map(c => coalesce(col(c).cast("string"), lit("None"))): _*))
    val action = concat(
      lit(s"""{"index":{"_index":"$index","_id":""""),
      idCol, lit("\"}}"))
    val doc = to_json(
      struct(norm.columns.map(col): _*),
      Map("ignoreNullFields" -> "false"))
    norm.select(concat(action, lit("\n"), doc).as("value"))
  }

  /** Dry-run bulk index: write the exact NDJSON payload under
    * `<outDir>/<index>.bulk/`. Partition-parallel text write. */
  def writeBulk(df: DataFrame, outDir: String, index: String, idCols: Seq[String]): String = {
    val path = s"$outDir/$index.bulk"
    bulkLines(df, index, idCols).write.mode("overwrite").text(path)
    path
  }
}

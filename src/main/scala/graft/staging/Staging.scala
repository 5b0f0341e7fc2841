package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.RawZone
import graft.ops.Relational

/** Raw-table shaping + staging models (SURVEY.md §2.1 S7-S8, §2.2 P1-P6).
  *
  * The raw layer mirrors the reference's `raw.*` Postgres tables
  * (`scripts/load/load_raw_to_postgres.py:45-77`): typed key columns +
  * the full payload, PK `(snapshot_date, tmdb_id|imdb_id)` enforced as
  * last-write-wins dedup (the `ON CONFLICT DO UPDATE` upsert,
  * `load_raw_to_postgres.py:103-110`). The staging layer projects typed
  * columns out of the payload exactly as the three dbt models do.
  */
object Staging {

  /** The run's snapshot date keys every row — matching the reference,
    * where the loader stamps rows from the SNAPSHOT_DATE env var
    * (`load_raw_to_postgres.py:202-224`; `dags/movies_analytics.py:34`)
    * and `_meta.snapshot_date` is lineage, not the PK source. Re-loading
    * old files under a new date therefore re-keys them to the new day. */
  private def snapshotDateCol(runDate: String): Column =
    to_date(lit(runDate))

  /** Upsert discipline for a raw table: one row per PK, latest extract wins,
    * source file as deterministic tiebreak (SURVEY §7.4.1). */
  private def upsertDedup(df: DataFrame, keys: Seq[String]): DataFrame =
    Relational.lastWriteWins(df, keys,
      col("extracted_at_utc").desc_nulls_last, col("_src_file").desc)

  /** raw_tmdb_popular: explode the page's `results` array, skip entries
    * without a tmdb id (`load_raw_to_postgres.py:100-101`), one row per
    * (snapshot_date, tmdb_id). */
  def rawTmdbPopular(enveloped: DataFrame, snapshotDate: String): DataFrame = {
    val exploded = enveloped
      .select(col("_meta"), col("_src_file"),
        explode(col("data.results")).as("payload"))
    upsertDedup(
      exploded.select(
        snapshotDateCol(snapshotDate).as("snapshot_date"),
        col("payload.id").as("tmdb_id"),
        col("payload.title").as("title"),
        col("payload"),
        col("_meta.extracted_at_utc").as("extracted_at_utc"),
        col("_src_file"))
        .filter(col("tmdb_id").isNotNull),
      Seq("snapshot_date", "tmdb_id"))
      .drop("extracted_at_utc", "_src_file")
  }

  /** raw_tmdb_details: one file per movie (`load_raw_to_postgres.py:130-150`). */
  def rawTmdbDetails(enveloped: DataFrame, snapshotDate: String): DataFrame =
    upsertDedup(
      enveloped.select(
        snapshotDateCol(snapshotDate).as("snapshot_date"),
        col("data.id").as("tmdb_id"),
        col("data.imdb_id").as("imdb_id"),
        col("data.title").as("title"),
        col("data").as("payload"),
        col("_meta.extracted_at_utc").as("extracted_at_utc"),
        col("_src_file"))
        .filter(col("tmdb_id").isNotNull),
      Seq("snapshot_date", "tmdb_id"))
      .drop("extracted_at_utc", "_src_file")

  /** raw_omdb_ratings: imdb_id comes from the FILE STEM, not the payload
    * (`load_raw_to_postgres.py:179`); docs with `Response != "True"` are
    * dropped before load (S8, `load_raw_to_postgres.py:182-183`). */
  def rawOmdbRatings(enveloped: DataFrame, snapshotDate: String): DataFrame =
    upsertDedup(
      enveloped
        .filter(col("data.Response") === "True")
        .select(
          snapshotDateCol(snapshotDate).as("snapshot_date"),
          RawZone.srcFileStem.as("imdb_id"),
          col("data.Title").as("title"),
          col("data").as("payload"),
          col("_meta.extracted_at_utc").as("extracted_at_utc"),
          col("_src_file"))
        .filter(col("imdb_id").isNotNull && col("imdb_id") =!= ""),
      Seq("snapshot_date", "imdb_id"))
      .drop("extracted_at_utc", "_src_file")

  /** `nullif(x,'')::date` (P2, `stg_tmdb_popular.sql:22`). */
  private def emptyAsNullDate(c: Column): Column =
    to_date(when(c === "", lit(null)).otherwise(c))

  /** `'N/A'`-sentinel scrub then cast (P4, `stg_omdb_ratings.sql:24-40`). */
  private def scrubNA(c: Column): Column =
    when(c.isNull || c === "N/A", lit(null)).otherwise(c)

  /** stg_tmdb_popular (`stg_tmdb_popular.sql:22-27`). Retained JSON arrays
    * become `to_json` string twins of the typed payload (SURVEY §7.4.3). */
  def stgTmdbPopular(raw: DataFrame): DataFrame =
    raw.select(
      col("snapshot_date"),
      col("tmdb_id"),
      col("title"),
      emptyAsNullDate(col("payload.release_date")).as("release_date"),
      col("payload.popularity").as("popularity"),
      col("payload.vote_average").as("tmdb_rating"),
      col("payload.vote_count").as("tmdb_vote_count"),
      col("payload.original_language").as("original_language"),
      to_json(col("payload.genre_ids")).as("genre_ids_json"))

  /** stg_tmdb_details (`stg_tmdb_details.sql:26-37`). */
  def stgTmdbDetails(raw: DataFrame): DataFrame =
    raw.select(
      col("snapshot_date"),
      col("tmdb_id"),
      col("imdb_id"),
      col("title"),
      emptyAsNullDate(col("payload.release_date")).as("release_date"),
      when(col("payload.runtime") === "", lit(null))
        .otherwise(col("payload.runtime")).cast("int").as("runtime_minutes"),
      col("payload.status").as("status"),
      col("payload.original_language").as("original_language"),
      to_json(col("payload.genres")).as("genres_json"),
      to_json(col("payload.production_countries")).as("production_countries_json"))

  /** stg_omdb_ratings (`stg_omdb_ratings.sql:21-52`): N/A scrub on the three
    * stat fields, thousands-separator strip on imdbVotes (P5). */
  def stgOmdbRatings(raw: DataFrame): DataFrame =
    raw.select(
      col("snapshot_date"),
      col("imdb_id"),
      col("title").as("title_omdb"),
      scrubNA(col("payload.imdbRating")).cast("double").as("imdb_rating"),
      regexp_replace(scrubNA(col("payload.imdbVotes")), ",", "")
        .cast("long").as("imdb_votes"),
      scrubNA(col("payload.Metascore")).cast("int").as("metascore"),
      col("payload.Rated").as("rated"),
      col("payload.Type").as("type"),
      col("payload.Year").as("year_text"),
      col("payload.Country").as("country"),
      col("payload.Genre").as("genre"),
      col("payload.Director").as("director"),
      col("payload.Actors").as("actors"),
      to_json(col("payload.Ratings")).as("ratings_json"))
}

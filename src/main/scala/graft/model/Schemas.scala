package graft.model

import org.apache.spark.sql.types._

/** Pinned schemas for the movie pipeline (no schema inference anywhere —
  * FIXTURES.md; reference regime SURVEY.md §1.3).
  *
  * Payload schemas mirror what the reference's loaders/staging models consume:
  * TMDB popular page (`scripts/load/load_raw_to_postgres.py:91-110`), TMDB
  * details (`load_raw_to_postgres.py:130-150`), OMDb ratings — inferred, the
  * fetch script is missing from the reference (`stg_omdb_ratings.sql:24-52`).
  */
object Schemas {

  /** Lineage envelope every raw file is wrapped in
    * (`scripts/ingest/fetch_tmdb.py:30-43`). */
  val metaSchema: StructType = StructType(Seq(
    StructField("snapshot_date", StringType),
    StructField("run_id", StringType),
    StructField("extracted_at_utc", StringType),
    StructField("source", StringType),
    StructField("endpoint", StringType)
  ))

  /** One movie object in the TMDB popular `results` array. */
  val popularMovieSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("release_date", StringType),
    StructField("popularity", DoubleType),
    StructField("vote_average", DoubleType),
    StructField("vote_count", IntegerType),
    StructField("original_language", StringType),
    StructField("genre_ids", ArrayType(IntegerType))
  ))

  /** TMDB popular page payload: `data.results` is the movie array. */
  val popularPageSchema: StructType = StructType(Seq(
    StructField("page", IntegerType),
    StructField("results", ArrayType(popularMovieSchema))
  ))

  val genreSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType)
  ))

  val productionCountrySchema: StructType = StructType(Seq(
    StructField("iso_3166_1", StringType),
    StructField("name", StringType)
  ))

  /** TMDB details payload (per-movie file). `runtime` is STRING on purpose:
    * the staging model applies `nullif(x,'')::int` (empty string → NULL,
    * `stg_tmdb_details.sql:29`), which only makes sense over text — and raw
    * JSON ints read fine as strings under Spark's permissive JSON coercion. */
  val detailsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("imdb_id", StringType),
    StructField("title", StringType),
    StructField("release_date", StringType),
    StructField("runtime", StringType),
    StructField("status", StringType),
    StructField("original_language", StringType),
    StructField("genres", ArrayType(genreSchema)),
    StructField("production_countries", ArrayType(productionCountrySchema))
  ))

  val omdbRatingSchema: StructType = StructType(Seq(
    StructField("Source", StringType),
    StructField("Value", StringType)
  ))

  /** OMDb ratings payload (per-movie file; stem = imdb_id). All stats are
    * text with `"N/A"` sentinels (`stg_omdb_ratings.sql:24-40`). */
  val omdbSchema: StructType = StructType(Seq(
    StructField("Response", StringType),
    StructField("Title", StringType),
    StructField("imdbRating", StringType),
    StructField("imdbVotes", StringType),
    StructField("Metascore", StringType),
    StructField("Rated", StringType),
    StructField("Type", StringType),
    StructField("Year", StringType),
    StructField("Country", StringType),
    StructField("Genre", StringType),
    StructField("Director", StringType),
    StructField("Actors", StringType),
    StructField("Ratings", ArrayType(omdbRatingSchema))
  ))

  /** Columns of the movies_enriched_daily mart, in reference order
    * (`movies_enriched_daily.sql:34-120`; ES mapping cross-check
    * `scripts/index/index_elasticsearch.py:179-210`). */
  val enrichedColumns: Seq[String] = Seq(
    "snapshot_date", "tmdb_id", "imdb_id", "title", "release_date",
    "release_year", "runtime_minutes", "status", "original_language",
    "popularity", "tmdb_rating", "tmdb_vote_count", "genres_json",
    "production_countries_json", "imdb_rating", "imdb_votes", "metascore",
    "rated", "type", "omdb_country", "omdb_genre", "director", "actors",
    "omdb_ratings_json", "missing_omdb_data", "composite_score",
    "is_overhyped", "is_hidden_gem"
  )

  /** kpi_daily_summary row (`kpi_daily_summary.sql:19-54`): fixed 9-column
    * schema, one row per snapshot_date. */
  case class KpiDailySummary(
      snapshot_date: java.sql.Date,
      nb_movies: Long,
      nb_movies_with_omdb: Long,
      omdb_coverage_ratio: java.math.BigDecimal,
      avg_tmdb_rating: java.math.BigDecimal,
      avg_imdb_rating: java.math.BigDecimal,
      avg_popularity: java.math.BigDecimal,
      nb_overhyped: Long,
      nb_hidden_gems: Long
  )
}

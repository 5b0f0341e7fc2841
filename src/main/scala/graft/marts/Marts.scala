package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Mart models (SURVEY.md §2.3 J1-J2, §2.2 P7-P11, §2.4 A1-A5).
  *
  * Faithful Spark restatement of the two dbt marts
  * (`movies_enriched_daily.sql`, `kpi_daily_summary.sql`), with rounding
  * routed through DECIMAL casts (Postgres `round(numeric, 2)` is half-up;
  * Spark's double→decimal cast is also HALF_UP, so the quantized values
  * agree).
  */
object Marts {

  /** movies_enriched_daily (`movies_enriched_daily.sql:8-122`):
    * popular ⟕ details on (snapshot_date, tmdb_id), then ⟕ omdb on
    * (snapshot_date, imdb_id) — NULL imdb_id never matches, leaving OMDb
    * columns NULL and `missing_omdb_data = true` (J2 + P10).
    *
    * Scale posture: both joins are plain equi-joins on composite keys; no
    * broadcast hints — at reference scale (≤20 rows/day) AQE broadcasts,
    * at 100 TB the same plan degrades gracefully to sort-merge on
    * co-partitioned keys.
    */
  def moviesEnrichedDaily(stgPopular: DataFrame, stgDetails: DataFrame,
                          stgOmdb: DataFrame): DataFrame = {
    // pop/det/omdb CTE projections (`movies_enriched_daily.sql:8-32,56-72`)
    val pop = stgPopular.select("snapshot_date", "tmdb_id", "title",
      "release_date", "popularity", "tmdb_rating", "tmdb_vote_count",
      "original_language", "genre_ids_json")
    val det = stgDetails.select("snapshot_date", "tmdb_id", "imdb_id",
      "runtime_minutes", "status", "genres_json", "production_countries_json")
    val omdb = stgOmdb
      .select("snapshot_date", "imdb_id", "imdb_rating", "imdb_votes",
        "metascore", "rated", "type", "country", "genre", "director",
        "actors", "ratings_json")
      .withColumnRenamed("country", "omdb_country")
      .withColumnRenamed("genre", "omdb_genre")
      .withColumnRenamed("ratings_json", "omdb_ratings_json")
      // marker for the missing-match flag: stands in for `o.imdb_id IS NULL`
      // (`movies_enriched_daily.sql:91-94`) — equivalent because imdb_id is
      // the omdb PK and never NULL on that side
      .withColumn("__omdb_matched", lit(true))

    // tmdb CTE: popular ⟕ details (J1, `movies_enriched_daily.sql:50-53`)
    val tmdb = pop.join(det, Seq("snapshot_date", "tmdb_id"), "left")
      .withColumn("release_year", year(col("release_date")))

    // joined CTE: tmdb ⟕ omdb (J2, `movies_enriched_daily.sql:116-119`)
    val joined = tmdb.join(omdb, Seq("snapshot_date", "imdb_id"), "left")
      .withColumn("missing_omdb_data", col("__omdb_matched").isNull)
      // composite score, exact 3-branch CASE (`movies_enriched_daily.sql:97-103`):
      // both stats → weighted 60/40 rounded to 2dp; imdb only → raw imdb;
      // else → tmdb_rating. All branches surfaced as DECIMAL(18,2) (the
      // reference's ::numeric face).
      .withColumn("composite_score",
        when(col("imdb_rating").isNotNull && col("metascore").isNotNull,
          (col("imdb_rating") * 0.6 + (col("metascore") / 10.0) * 0.4)
            .cast("decimal(18,2)"))
          .when(col("imdb_rating").isNotNull, col("imdb_rating").cast("decimal(18,2)"))
          .otherwise(col("tmdb_rating").cast("decimal(18,2)")))
      // threshold flags (P11, `movies_enriched_daily.sql:106-114`); NULL
      // popularity falls through to ELSE false in both engines
      .withColumn("is_overhyped",
        when(col("popularity") >= 50 &&
          coalesce(col("imdb_rating"), col("tmdb_rating")) < 6.0, lit(true))
          .otherwise(lit(false)))
      .withColumn("is_hidden_gem",
        when(col("popularity") < 30 &&
          coalesce(col("imdb_rating"), col("tmdb_rating")) >= 7.5, lit(true))
          .otherwise(lit(false)))

    joined.select(Schemas.enrichedColumns.map(col): _*)
  }

  /** kpi_daily_summary (`kpi_daily_summary.sql:19-54`): one row per
    * snapshot_date — counts, OMDb coverage ratio, null-skipping means, flag
    * counts. Single partial+final hash aggregation; the group key is the
    * partition key, so at scale this is a near-map-side-only rollup. */
  def kpiDailySummary(enriched: DataFrame): DataFrame =
    enriched
      .groupBy("snapshot_date")
      .agg(
        count(lit(1)).as("nb_movies"),
        sum(when(!col("missing_omdb_data"), 1L).otherwise(0L))
          .as("nb_movies_with_omdb"),
        (sum(when(!col("missing_omdb_data"), 1L).otherwise(0L))
          .cast("decimal(18,6)") / count(lit(1)))
          .cast("decimal(18,2)").as("omdb_coverage_ratio"),
        avg(col("tmdb_rating")).cast("decimal(18,2)").as("avg_tmdb_rating"),
        avg(col("imdb_rating")).cast("decimal(18,2)").as("avg_imdb_rating"),
        avg(col("popularity")).cast("decimal(18,2)").as("avg_popularity"),
        sum(when(col("is_overhyped"), 1L).otherwise(0L)).as("nb_overhyped"),
        sum(when(col("is_hidden_gem"), 1L).otherwise(0L)).as("nb_hidden_gems"))

  /** Typed face of the KPI mart (SURVEY §1.3: `Dataset[T]` where the
    * schema is fixed) — compile-time column safety for consumers. */
  def kpiDailySummaryTyped(enriched: DataFrame):
      org.apache.spark.sql.Dataset[Schemas.KpiDailySummary] = {
    implicit val enc: org.apache.spark.sql.Encoder[Schemas.KpiDailySummary] =
      org.apache.spark.sql.Encoders.product[Schemas.KpiDailySummary]
    kpiDailySummary(enriched).as[Schemas.KpiDailySummary]
  }
}

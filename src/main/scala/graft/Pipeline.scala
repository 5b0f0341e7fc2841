package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.io.{LakeZones, RawZone, ServingSink}
import graft.marts.Marts
import graft.model.Schemas
import graft.ops.Relational
import graft.staging.Staging

/** End-to-end run for one snapshot date (SURVEY.md §3.1: the reference's
  * 6-task Airflow chain `fetch → load → dbt run → export → index`,
  * `dags/movies_analytics.py:105`, collapsed into one Spark lineage).
  *
  * Stages 3–5 of the reference (load_postgres, dbt_run, export_parquet) are
  * a single DataFrame DAG here — Catalyst optimizes across what dbt treats
  * as per-model fences (SURVEY §3.2). Stage 6 (index_elasticsearch) is the
  * dry-run serving sink. Stages 1–2 (API fetch) are ingestion adapters
  * outside the engine; their output contract — enveloped JSON under
  * `date=` partitions — is the pipeline's input.
  */
object Pipeline {

  case class Config(
      rawRoot: String,
      lakeRoot: String,
      servingDir: String,
      snapshotDate: String,
      runId: String,
      /** true for the reference's pretty-printed one-object-per-file raw
        * form; false for JSON-lines raw zones. */
      multiLineRaw: Boolean = true)

  case class Result(
      stgTmdbPopular: DataFrame,
      stgTmdbDetails: DataFrame,
      stgOmdbRatings: DataFrame,
      moviesEnrichedDaily: DataFrame,
      kpiDailySummary: DataFrame,
      exportedPaths: Map[String, String])

  /** Read the three raw feeds for the date and shape them into the raw
    * tables (stage 3: `load_raw_to_postgres.py`). */
  def loadRaw(spark: SparkSession, cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val pop = RawZone.readEnveloped(spark, cfg.rawRoot, "tmdb", "popular",
      cfg.snapshotDate, Schemas.popularPageSchema, cfg.multiLineRaw)
    val det = RawZone.readEnveloped(spark, cfg.rawRoot, "tmdb", "details",
      cfg.snapshotDate, Schemas.detailsSchema, cfg.multiLineRaw)
    val omdb = RawZone.readEnveloped(spark, cfg.rawRoot, "omdb", "ratings",
      cfg.snapshotDate, Schemas.omdbSchema, cfg.multiLineRaw)
    (Staging.rawTmdbPopular(pop, cfg.snapshotDate),
     Staging.rawTmdbDetails(det, cfg.snapshotDate),
     Staging.rawOmdbRatings(omdb, cfg.snapshotDate))
  }

  /** Full run: raw → staging → marts → quality gates → lake export →
    * serving sink. Throws on data-quality violations (the dbt-test
    * contract, SURVEY §2.6). */
  def run(spark: SparkSession, cfg: Config): Result = {
    val (rawPop, rawDet, rawOmdb) = loadRaw(spark, cfg)

    // staging models (dbt stage, parallelizable — here one lazy DAG)
    val stgPop = Staging.stgTmdbPopular(rawPop)
    val stgDet = Staging.stgTmdbDetails(rawDet)
    val stgOmdb = Staging.stgOmdbRatings(rawOmdb)

    // marts; enriched feeds four consumers (kpi, quality, export, serving)
    // so persist it once instead of recomputing the 3-way join per action
    val enriched = Marts.moviesEnrichedDaily(stgPop, stgDet, stgOmdb)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kpi = Marts.kpiDailySummary(enriched)

    try {
      // quality gates — dbt schema tests (Q1-Q3, models/*/schema.yml).
      // The five gates run as ONE action (r17-opt): each reduces to a
      // (gate, nulls, dups) row and the rows union into a single
      // collect — one driver round-trip per day instead of five
      // concurrently-submitted ones (the previous Future-per-gate form
      // still paid ~4 AQE stage-jobs per gate; measured on the q82
      // lifecycle macro the gates were ~100 tiny jobs over 5 days).
      // Violation still throws before any materialization — dbt's
      // test-then-materialize barrier is preserved.
      Relational.assertQualityAll(Seq(
        ("raw_tmdb_popular", rawPop, Seq("tmdb_id"), Seq("snapshot_date", "tmdb_id")),
        ("raw_tmdb_details", rawDet, Seq("tmdb_id"), Seq("snapshot_date", "tmdb_id")),
        ("raw_omdb_ratings", rawOmdb, Seq("imdb_id"), Seq("snapshot_date", "imdb_id")),
        ("movies_enriched_daily", enriched, Seq("snapshot_date", "tmdb_id", "title"),
          Seq("snapshot_date", "tmdb_id")),
        ("kpi_daily_summary", kpi, Seq("snapshot_date", "nb_movies"),
          Seq("snapshot_date"))))

      // lake export (3 staging → formatted/, 2 marts → usage/, S9/S10)
      // and the serving sinks (`index_elasticsearch.py:22-23,245-246`)
      // are independent consumers of the gated frames — they overlap the
      // same way the gates do (exportAll itself fans its five writes out
      // concurrently); the two serving indexes stay internally ordered
      // (mapping bootstrap before bulk, the ES contract)
      val exported = {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val exp = Future(LakeZones.exportAll(Map(
            "stg_tmdb_popular" -> stgPop,
            "stg_tmdb_details" -> stgDet,
            "stg_omdb_ratings" -> stgOmdb,
            "movies_enriched_daily" -> enriched,
            "kpi_daily_summary" -> kpi), cfg.lakeRoot))
          val serveMovies = Future {
            ServingSink.bootstrapMapping(enriched, cfg.servingDir,
              "movies_enriched_daily", ServingSink.movieFieldSpec)
            ServingSink.writeBulk(enriched, cfg.servingDir,
              "movies_enriched_daily", Seq("snapshot_date", "tmdb_id"))
          }
          val serveKpis = Future {
            ServingSink.bootstrapMapping(kpi, cfg.servingDir,
              "movies_kpis_daily", ServingSink.kpiFieldSpec)
            ServingSink.writeBulk(kpi, cfg.servingDir,
              "movies_kpis_daily", Seq("snapshot_date"))
          }
          Await.result(serveMovies, Duration.Inf)
          Await.result(serveKpis, Duration.Inf)
          Await.result(exp, Duration.Inf)
        } finally pool.shutdown()
      }

      Result(stgPop, stgDet, stgOmdb, enriched, kpi, exported)
    } finally enriched.unpersist()
  }

  /** SQL-surface face: expose the five model tables under their dbt model
    * names as temp views, so a `spark.sql` user queries the pipeline's
    * outputs exactly as the reference's warehouse user queries the dbt
    * models (the SQL files under `dbt/models/staging` and `dbt/models/marts`). */
  def registerModelViews(r: Result): Unit = {
    r.stgTmdbPopular.createOrReplaceTempView("stg_tmdb_popular")
    r.stgTmdbDetails.createOrReplaceTempView("stg_tmdb_details")
    r.stgOmdbRatings.createOrReplaceTempView("stg_omdb_ratings")
    r.moviesEnrichedDaily.createOrReplaceTempView("movies_enriched_daily")
    r.kpiDailySummary.createOrReplaceTempView("kpi_daily_summary")
  }

  /** Backfill: run a range of snapshot dates sequentially (the engine's
    * equivalent of re-triggering the reference's daily DAG per day,
    * `dags/movies_analytics.py:22-28`), with the DAG's failure policy
    * (`dags/movies_analytics.py:6-10`: `retries: 1`,
    * `retry_delay=timedelta(minutes=3)` — hence the 180 000 ms default) —
    * each failed day is retried `retries` more times after `retryDelayMs`
    * before the backfill aborts.
    *
    * Resume contract: every completed day writes a marker under
    * `<lakeRoot>/_backfill_done/`, and a re-run SKIPS marked days — a
    * 400-day backfill that dies on day 250 reprocesses nothing on resume.
    * (Each day is also independently idempotent — dynamic partition
    * overwrite touches only its own partitions — so re-running an
    * unmarked, half-written day is safe.) The returned map holds only the
    * days this invocation actually ran; skipped days are absent.
    * INTENTIONAL reprocessing after a code or config change: pass
    * `force = true` (markers for the requested dates are ignored and
    * rewritten) or clear markers first with [[clearBackfillMarkers]].
    *
    * `sleeper` and `runDay` are injection seams for tests (fake clock,
    * fault injection) — production callers take the defaults. */
  def backfill(spark: SparkSession, cfg: Config, dates: Seq[String],
               retries: Int = 1, retryDelayMs: Long = 180000L,
               force: Boolean = false,
               sleeper: Long => Unit = Thread.sleep,
               runDay: (SparkSession, Config) => Result = run): Map[String, Result] = {
    import org.apache.hadoop.fs.Path
    import scala.util.control.NonFatal
    val doneDir = new Path(cfg.lakeRoot, "_backfill_done")
    val fs = doneDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done: Set[String] =
      if (force || !fs.exists(doneDir)) Set.empty
      else fs.listStatus(doneDir).map(_.getPath.getName).toSet
    dates.flatMap { d =>
      if (done(d)) None
      else {
        var attempt = 0
        var result: Option[Result] = None
        var lastErr: Throwable = null
        while (result.isEmpty && attempt <= retries) {
          try result = Some(runDay(spark, cfg.copy(snapshotDate = d)))
          catch {
            case NonFatal(e) =>
              lastErr = e
              attempt += 1
              if (attempt <= retries) sleeper(retryDelayMs)
          }
        }
        result match {
          case Some(r) =>
            fs.create(new Path(doneDir, d), true).close()
            Some(d -> r)
          case None =>
            throw new RuntimeException(
              s"backfill day $d failed after ${retries + 1} attempts", lastErr)
        }
      }
    }.toMap
  }

  /** Invalidate `_backfill_done` markers so the next [[backfill]]
    * reprocesses those days — the explicit "my code changed, recompute"
    * path. `dates` empty clears every marker. Returns the dates whose
    * markers were actually removed. */
  def clearBackfillMarkers(spark: SparkSession, cfg: Config,
                           dates: Seq[String] = Nil): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val doneDir = new Path(cfg.lakeRoot, "_backfill_done")
    val fs = doneDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(doneDir)) Nil
    else {
      val present = fs.listStatus(doneDir).map(_.getPath.getName).toSeq
      val targets = if (dates.isEmpty) present else present.filter(dates.contains)
      targets.filter(d => fs.delete(new Path(doneDir, d), false))
    }
  }
}

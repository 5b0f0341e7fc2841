package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

/** Volume + plan-shape checks for the pipeline: a generated 1000-movie day
  * in the JSON-lines raw form (multiLineRaw=false), and partition-pruning
  * evidence on the lake read path. */
class PipelineScaleSpec extends SparkSpec {

  private val Day = "2026-02-20"

  /** Deterministic 1000-movie raw zone, JSON-lines (one file per feed). */
  private def writeJsonlRawZone(root: Path): String = {
    val d = s"date=$Day"
    def meta(src: String, ep: String) =
      s""""_meta":{"snapshot_date":"$Day","run_id":"r","extracted_at_utc":"2026-02-20T00:00:00+00:00","source":"$src","endpoint":"$ep"}"""

    val results = (1 to 1000).map { i =>
      s"""{"id":$i,"title":"M$i","release_date":"20${10 + i % 15}-01-0${1 + i % 9}","popularity":${i % 100}.5,"vote_average":${1 + i % 9}.25,"vote_count":$i,"original_language":"en","genre_ids":[${i % 20}]}"""
    }.mkString(",")
    val popDir = root.resolve(s"tmdb/popular/$d")
    Files.createDirectories(popDir)
    Files.writeString(popDir.resolve("popular.json"),
      s"""{${meta("tmdb", "popular")},"data":{"page":1,"results":[$results]}}""" + "\n")

    val detDir = root.resolve(s"tmdb/details/$d")
    Files.createDirectories(detDir)
    // details for 90% of movies; imdb ids for 80% of those
    val detLines = (1 to 1000).filter(_ % 10 != 0).map { i =>
      val imdb = if (i % 5 == 0) "null" else s""""tt$i""""
      s"""{${meta("tmdb", "details")},"data":{"id":$i,"imdb_id":$imdb,"title":"M$i","release_date":"","runtime":${60 + i % 120},"status":"Released","original_language":"en","genres":[{"id":1,"name":"G"}],"production_countries":[{"iso_3166_1":"US","name":"US"}]}}"""
    }
    Files.writeString(detDir.resolve("details.json"), detLines.mkString("\n") + "\n")

    val omdbDir = root.resolve(s"omdb/ratings/$d")
    Files.createDirectories(omdbDir)
    // OMDb docs exist for half the imdb ids; JSONL needs per-file stems, so
    // one file per doc here (file stem = imdb_id contract)
    (1 to 1000).filter(i => i % 10 != 0 && i % 5 != 0 && i % 2 == 0).foreach { i =>
      Files.writeString(omdbDir.resolve(s"tt$i.json"),
        s"""{${meta("omdb", "ratings")},"data":{"Response":"True","Title":"M$i","imdbRating":"${1 + i % 9}.1","imdbVotes":"${i},000","Metascore":"${i % 100}","Rated":"PG","Type":"movie","Year":"2020","Country":"US","Genre":"G","Director":"D","Actors":"A","Ratings":[]}}""")
    }
    root.toString
  }

  test("pipeline handles a 1000-movie day in JSON-lines raw form") {
    val base = Files.createTempDirectory("graft-scale-")
    val cfg = Pipeline.Config(
      rawRoot = writeJsonlRawZone(base.resolve("raw")),
      lakeRoot = base.resolve("lake").toString,
      servingDir = base.resolve("serving").toString,
      snapshotDate = Day, runId = "r", multiLineRaw = false)
    val result = Pipeline.run(spark, cfg)
    assert(result.moviesEnrichedDaily.count() == 1000)
    val kpi = result.kpiDailySummary.collect()(0)
    assert(kpi.getAs[Long]("nb_movies") == 1000L)
    // coverage: 900 detail rows, 800 with imdb ids (i≡5 mod 10 are null),
    // 400 OMDb docs (even, not divisible by 5)
    assert(kpi.getAs[Long]("nb_movies_with_omdb") == 400L)
    val enriched = result.moviesEnrichedDaily
    assert(enriched.filter(col("runtime_minutes").isNotNull).count() == 900)
    assert(enriched.filter(col("imdb_id").isNotNull).count() == 800)
    assert(enriched.filter(!col("missing_omdb_data")).count() == 400)
  }

  test("lake reads prune snapshot_date partitions (plan evidence)") {
    val cfg = MovieFixtures.tempConfig()
    Pipeline.run(spark, cfg)
    val pruned = io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "movies_enriched")
      .filter(col("snapshot_date") === MovieFixtures.SnapshotDate)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.contains("snapshot_date"), plan.take(500))
    // and the scan carries the partition filter, not a post-scan filter only
    assert(plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(snapshot_date") ||
           plan.replaceAll("\\s", "").contains("PartitionFilters:[(snapshot_date"), plan.take(800))
  }
}

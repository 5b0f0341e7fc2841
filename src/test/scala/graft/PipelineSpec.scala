package graft

import org.apache.spark.sql.Row

/** Golden end-to-end test: checked-in JSON fixtures → full pipeline → exact
  * expected staging/mart rows (SURVEY.md §5 layer 2), plus re-run
  * idempotency (S7) and the serving payload (S13). */
class PipelineSpec extends SparkSpec {

  private lazy val cfg = MovieFixtures.tempConfig()
  private lazy val result = Pipeline.run(spark, cfg)

  test("staging: OMDb Response filter, N/A scrub, comma strip, LWW upsert") {
    val omdb = result.stgOmdbRatings.collect().map(r =>
      r.getAs[String]("imdb_id") -> r).toMap
    // tt0105 (Response False) dropped; orphan tt9999 still staged
    assert(omdb.keySet == Set("tt0101", "tt0102", "tt9999"))
    assert(omdb("tt0101").getAs[Double]("imdb_rating") == 7.5)
    assert(omdb("tt0101").getAs[Long]("imdb_votes") == 1234567L)
    assert(omdb("tt0101").getAs[Int]("metascore") == 80)
    assert(omdb("tt0102").isNullAt(omdb("tt0102").fieldIndex("imdb_rating")))
    assert(omdb("tt0102").isNullAt(omdb("tt0102").fieldIndex("imdb_votes")))
    assert(omdb("tt0102").getAs[Int]("metascore") == 55)

    val det = result.stgTmdbDetails.collect().map(r =>
      r.getAs[Long]("tmdb_id") -> r).toMap
    // corrupt file dropped; 101's bare stale duplicate lost to the
    // enveloped record (runtime 120, not 999); empty runtime/date → NULL
    assert(det.keySet == Set(101L, 102L, 103L, 105L))
    assert(det(101L).getAs[Int]("runtime_minutes") == 120)
    assert(det(101L).getAs[String]("status") == "Released")
    assert(det(102L).isNullAt(det(102L).fieldIndex("runtime_minutes")))
    assert(det(102L).isNullAt(det(102L).fieldIndex("release_date")))
    assert(det(103L).isNullAt(det(103L).fieldIndex("imdb_id")))
    assert(det(101L).getAs[String]("genres_json") == """[{"id":18,"name":"Drama"}]""")
  }

  test("mart: movies_enriched_daily matches the reference semantics row-for-row") {
    val rows = result.moviesEnrichedDaily.collect().map(r =>
      r.getAs[Long]("tmdb_id") -> r).toMap
    assert(rows.keySet == Set(101L, 102L, 103L, 104L, 105L))

    def dec(r: Row, c: String): BigDecimal = BigDecimal(r.getAs[java.math.BigDecimal](c))
    def b(r: Row, c: String): Boolean = r.getAs[Boolean](c)

    val m1 = rows(101L)
    assert(m1.getAs[String]("imdb_id") == "tt0101")
    assert(m1.getAs[Int]("release_year") == 2020)
    assert(!b(m1, "missing_omdb_data"))
    assert(dec(m1, "composite_score") == BigDecimal("7.70")) // .6*7.5 + .4*8.0
    assert(!b(m1, "is_overhyped") && b(m1, "is_hidden_gem"))

    val m2 = rows(102L) // N/A imdb rating → composite falls PAST metascore to tmdb
    assert(!b(m2, "missing_omdb_data"))
    assert(m2.isNullAt(m2.fieldIndex("release_year")))
    assert(dec(m2, "composite_score") == BigDecimal("6.50"))
    assert(m2.getAs[Int]("metascore") == 55)

    val m3 = rows(103L) // NULL imdb_id: J2 join can never match
    assert(b(m3, "missing_omdb_data"))
    assert(m3.isNullAt(m3.fieldIndex("imdb_rating")))
    assert(dec(m3, "composite_score") == BigDecimal("5.00"))
    assert(b(m3, "is_overhyped") && !b(m3, "is_hidden_gem"))

    val m4 = rows(104L) // no details row (J1 unmatched)
    assert(m4.isNullAt(m4.fieldIndex("imdb_id")))
    assert(m4.isNullAt(m4.fieldIndex("runtime_minutes")))
    assert(b(m4, "missing_omdb_data"))
    assert(dec(m4, "composite_score") == BigDecimal("7.00"))
    assert(!b(m4, "is_hidden_gem")) // pop < 30 but rating 7.0 < 7.5

    val m5 = rows(105L) // OMDb doc dropped by Response filter
    assert(b(m5, "missing_omdb_data"))
    assert(dec(m5, "composite_score") == BigDecimal("6.90"))
  }

  test("mart: typed Dataset face round-trips the KPI row") {
    val ks = marts.Marts.kpiDailySummaryTyped(result.moviesEnrichedDaily).collect()
    assert(ks.length == 1)
    assert(ks(0).nb_movies == 5L)
    assert(BigDecimal(ks(0).omdb_coverage_ratio) == BigDecimal("0.40"))
  }

  test("mart: kpi_daily_summary is the exact expected single row") {
    val rows = result.kpiDailySummary.collect()
    assert(rows.length == 1)
    val r = rows(0)
    def dec(c: String): BigDecimal = BigDecimal(r.getAs[java.math.BigDecimal](c))
    assert(r.getAs[java.sql.Date]("snapshot_date").toString == MovieFixtures.SnapshotDate)
    assert(r.getAs[Long]("nb_movies") == 5L)
    assert(r.getAs[Long]("nb_movies_with_omdb") == 2L)
    assert(dec("omdb_coverage_ratio") == BigDecimal("0.40"))
    assert(dec("avg_tmdb_rating") == BigDecimal("6.70"))
    assert(dec("avg_imdb_rating") == BigDecimal("7.50")) // null-skipping avg
    assert(dec("avg_popularity") == BigDecimal("34.66"))
    assert(r.getAs[Long]("nb_overhyped") == 1L)
    assert(r.getAs[Long]("nb_hidden_gems") == 1L)
  }

  test("sql surface: the five model views answer a pure-SQL mart query") {
    Pipeline.registerModelViews(result)
    // the dbt user's query, verbatim SQL over the model views: join the
    // enriched mart back to staging and cross-check the KPI row
    val row = spark.sql(
      """SELECT k.nb_movies,
        |       (SELECT count(*) FROM movies_enriched_daily) AS nb_enriched,
        |       (SELECT count(*) FROM stg_tmdb_popular) AS nb_popular,
        |       (SELECT count(*) FROM movies_enriched_daily e
        |          JOIN stg_omdb_ratings o ON e.imdb_id = o.imdb_id) AS nb_with_omdb
        |FROM kpi_daily_summary k""".stripMargin).head()
    assert(row.getLong(0) == 5L) // nb_movies
    assert(row.getLong(1) == 5L) // enriched rows
    assert(row.getLong(2) == 5L) // staging popular rows
    assert(row.getLong(3) == 2L) // omdb-matched movies
  }

  test("lake: re-running the day is idempotent (dynamic partition overwrite)") {
    result // first run
    Pipeline.run(spark, cfg) // second run, same day
    val enriched = io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "movies_enriched")
    assert(enriched.count() == 5) // replaced, not appended
    val kpi = io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "kpi_daily")
    assert(kpi.count() == 1)
    // all five exports exist with the manifest's names
    for ((zone, name) <- io.LakeZones.exports.values)
      assert(io.LakeZones.readTable(spark, cfg.lakeRoot, zone, name).count() > 0)
  }

  test("lake: a second snapshot date lands beside the first, untouched by re-runs") {
    // own config: this test writes day-2 serving payloads that would
    // otherwise clobber the shared cfg's day-1 artifacts
    val cfg = MovieFixtures.tempConfig()
    Pipeline.run(spark, cfg) // day 1 in the lake
    // build a second day by copying the fixture raw zone under a new date
    val base = java.nio.file.Paths.get(cfg.rawRoot)
    val d2 = "2026-02-19"
    for (feed <- Seq("tmdb/popular", "tmdb/details", "omdb/ratings")) {
      val src = base.resolve(s"$feed/date=${MovieFixtures.SnapshotDate}")
      val dst = base.resolve(s"$feed/date=$d2")
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(src).forEach { f =>
        java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    Pipeline.run(spark, cfg.copy(snapshotDate = d2))
    val enriched = io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "movies_enriched")
    val byDay = enriched.groupBy("snapshot_date").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byDay == Map(MovieFixtures.SnapshotDate -> 5L, d2 -> 5L))
    // re-running day 2 must not disturb day 1 (dynamic partition overwrite)
    Pipeline.run(spark, cfg.copy(snapshotDate = d2))
    assert(io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "movies_enriched")
      .count() == 10)
  }

  test("serving: movies mapping matches the reference's pinned dict field-for-field") {
    result
    val mapping = java.nio.file.Files.readString(java.nio.file.Paths
      .get(cfg.servingDir).resolve("movies_enriched_daily.mapping.json"))
    // every field the reference's movies_mapping pins
    // (`index_elasticsearch.py:179-207`) must carry the identical type spec
    val expected = Seq(
      """"snapshot_date":{"type":"date"}""",
      """"tmdb_id":{"type":"long"}""",
      """"imdb_id":{"type":"keyword"}""",
      """"title":{"type":"text","fields":{"keyword":{"type":"keyword"}}}""",
      """"original_language":{"type":"keyword"}""",
      """"release_date":{"type":"date"}""",
      """"release_year":{"type":"integer"}""",
      """"popularity":{"type":"double"}""",
      """"tmdb_rating":{"type":"double"}""",
      """"tmdb_vote_count":{"type":"integer"}""",
      """"imdb_rating":{"type":"double"}""",
      """"imdb_votes":{"type":"integer"}""",
      """"metascore":{"type":"double"}""",
      """"composite_score":{"type":"double"}""",
      """"runtime_minutes":{"type":"integer"}""",
      """"status":{"type":"keyword"}""",
      """"rated":{"type":"keyword"}""",
      """"director":{"type":"text","fields":{"keyword":{"type":"keyword"}}}""",
      """"actors":{"type":"text"}""",
      """"missing_omdb_data":{"type":"boolean"}""",
      """"is_overhyped":{"type":"boolean"}""",
      """"is_hidden_gem":{"type":"boolean"}""")
    for (f <- expected) assert(mapping.contains(f), s"missing/mismatched: $f")
    assert(mapping.contains(""""number_of_shards":1"""))
    assert(mapping.contains(""""number_of_replicas":0"""))
  }

  test("serving: KPI mapping matches the reference's pinned dict field-for-field") {
    result
    val mapping = java.nio.file.Files.readString(java.nio.file.Paths
      .get(cfg.servingDir).resolve("movies_kpis_daily.mapping.json"))
    // the reference pins the four counts as `integer` even though they are
    // 64-bit counts upstream (`index_elasticsearch.py:210-225`)
    val expected = Seq(
      """"snapshot_date":{"type":"date"}""",
      """"nb_movies":{"type":"integer"}""",
      """"nb_movies_with_omdb":{"type":"integer"}""",
      """"omdb_coverage_ratio":{"type":"double"}""",
      """"avg_tmdb_rating":{"type":"double"}""",
      """"avg_imdb_rating":{"type":"double"}""",
      """"avg_popularity":{"type":"double"}""",
      """"nb_overhyped":{"type":"integer"}""",
      """"nb_hidden_gems":{"type":"integer"}""")
    for (f <- expected) assert(mapping.contains(f), s"missing/mismatched: $f")
    assert(mapping.contains(""""number_of_shards":1"""))
    assert(mapping.contains(""""number_of_replicas":0"""))
  }

  test("serving: bulk NDJSON payload has stable ids, date strings, explicit nulls") {
    result
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(cfg.servingDir)
    assert(java.nio.file.Files.exists(dir.resolve("movies_enriched_daily.mapping.json")))
    val mapping = java.nio.file.Files.readString(dir.resolve("movies_kpis_daily.mapping.json"))
    assert(mapping.contains(""""snapshot_date":{"type":"date"}"""))
    assert(mapping.contains(""""number_of_shards":1"""))

    val kpiLines = java.nio.file.Files.list(dir.resolve("movies_kpis_daily.bulk")).iterator().asScala
      .filter(_.toString.endsWith(".txt"))
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .toSeq
    assert(kpiLines.size == 2) // action + doc for the single KPI row
    assert(kpiLines.head ==
      s"""{"index":{"_index":"movies_kpis_daily","_id":"${MovieFixtures.SnapshotDate}"}}""")
    assert(kpiLines(1).contains(s""""snapshot_date":"${MovieFixtures.SnapshotDate}""""))
    assert(kpiLines(1).contains(""""nb_movies":5"""))

    val bulkLines = java.nio.file.Files.list(dir.resolve("movies_enriched_daily.bulk")).iterator().asScala
      .filter(_.toString.endsWith(".txt"))
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
      .toSeq
    assert(bulkLines.size == 10) // 5 docs × (action + doc)
    val actions = bulkLines.filter(_.startsWith("""{"index":"""))
    assert(actions.contains(
      s"""{"index":{"_index":"movies_enriched_daily","_id":"${MovieFixtures.SnapshotDate}_101"}}"""))
    // docs keep nulls explicit (Python json.dumps parity)
    val m4doc = bulkLines.find(_.contains(""""tmdb_id":104""")).get
    assert(m4doc.contains(""""imdb_id":null"""))
  }

  test("lake: per-day schema evolution reads back with mergeSchema") {
    import org.apache.spark.sql.functions.{col, lit, to_date}
    import graft.io.LakeZones
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-evolve-").toString
    val day1 = Seq((1L, 10.0)).toDF("k", "v")
      .withColumn("snapshot_date", to_date(lit("2026-03-01")))
    val day2 = Seq((2L, 20.0, "fresh")).toDF("k", "v", "added")
      .withColumn("snapshot_date", to_date(lit("2026-03-02")))
    LakeZones.writePartitioned(day1, root, "usage", "evolving")
    LakeZones.writePartitioned(day2, root, "usage", "evolving")
    val merged = LakeZones.readTable(spark, root, "usage", "evolving",
      mergeSchema = true)
    assert(merged.columns.toSet == Set("k", "v", "added", "snapshot_date"))
    val rows = merged.orderBy("k").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("added")))
    assert(rows.toSeq == Seq(1L -> None, 2L -> Some("fresh")))
    // default pinned-schema read still works (first-footer schema)
    assert(LakeZones.readTable(spark, root, "usage", "evolving").count() == 2)
  }

  test("backfill: two days coexist; re-running day 1 leaves day 2's files untouched") {
    import org.apache.spark.sql.functions.col
    import graft.io.LakeZones
    val base = java.nio.file.Files.createTempDirectory("graft-backfill-")
    val rawRoot = base.resolve("raw")
    val day1 = MovieFixtures.SnapshotDate
    val day2 = "2026-02-19"
    MovieFixtures.writeRawZone(rawRoot, day1)
    MovieFixtures.writeRawZone(rawRoot, day2)
    val bcfg = Pipeline.Config(rawRoot.toString, base.resolve("lake").toString,
      base.resolve("serving").toString, day1, MovieFixtures.RunId)
    Pipeline.backfill(spark, bcfg, Seq(day1, day2))

    // both snapshot_date partitions coexist with full per-day content
    val lake = LakeZones.readTable(spark, bcfg.lakeRoot, "usage", "movies_enriched")
    val byDay = lake.groupBy(col("snapshot_date").cast("string").as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay == Map(day1 -> 5L, day2 -> 5L), s"per-day rows: $byDay")

    // re-run day 1: dynamic overwrite must replace only day 1's partition —
    // day 2's files (names AND mtimes) stay byte-identical on disk
    def day2Files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val dir = java.nio.file.Paths.get(
        bcfg.lakeRoot, "usage", "movies_enriched", s"snapshot_date=$day2")
      java.nio.file.Files.walk(dir).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    }
    val before = day2Files()
    assert(before.nonEmpty)
    Pipeline.run(spark, bcfg.copy(snapshotDate = day1))
    assert(day2Files() == before, "day-2 partition files changed on a day-1 re-run")
    // and the day-1 re-run is content-idempotent
    val d1 = LakeZones.readTable(spark, bcfg.lakeRoot, "usage", "movies_enriched")
      .filter(col("snapshot_date").cast("string") === day1)
    assert(d1.count() == 5L)
  }

  test("backfill: retry-once on a transient failure, resume skips completed days") {
    import scala.collection.mutable
    val base = java.nio.file.Files.createTempDirectory("graft-backfill-retry-")
    val cfg = Pipeline.Config(base.resolve("raw").toString,
      base.resolve("lake").toString, base.resolve("serving").toString,
      "unused", "run-retry")
    val ran = mutable.Buffer[String]()
    val slept = mutable.Buffer[Long]()
    val ok = Pipeline.Result(null, null, null, null, null, Map.empty)
    var transient = Set("2026-03-02") // fails exactly once, then succeeds
    def runDay(s: org.apache.spark.sql.SparkSession, c: Pipeline.Config): Pipeline.Result = {
      ran += c.snapshotDate
      if (transient(c.snapshotDate)) {
        transient -= c.snapshotDate
        throw new RuntimeException("transient API hiccup")
      }
      ok
    }
    val dates = Seq("2026-03-01", "2026-03-02", "2026-03-03")
    // the injected one-shot failure converges within the run: day 2 runs
    // twice (retry after the configured delay), days 1/3 once
    val r1 = Pipeline.backfill(spark, cfg, dates, retries = 1,
      retryDelayMs = 123L, sleeper = slept += _, runDay = runDay)
    assert(ran.toSeq == Seq("2026-03-01", "2026-03-02", "2026-03-02", "2026-03-03"))
    assert(slept.toSeq == Seq(123L))
    assert(r1.keySet == dates.toSet)
    // resume on the full range: every day is marked done — nothing reruns
    ran.clear()
    val r2 = Pipeline.backfill(spark, cfg, dates, sleeper = slept += _, runDay = runDay)
    assert(ran.isEmpty && r2.isEmpty)
    // a day that exhausts its retries aborts the backfill, leaves no
    // marker, and never reprocesses the already-green days
    var down = true
    def runDay2(s: org.apache.spark.sql.SparkSession, c: Pipeline.Config): Pipeline.Result = {
      ran += c.snapshotDate
      if (c.snapshotDate == "2026-03-04" && down) throw new RuntimeException("es down")
      ok
    }
    val e = intercept[RuntimeException] {
      Pipeline.backfill(spark, cfg, dates :+ "2026-03-04", retries = 1,
        retryDelayMs = 0L, sleeper = _ => (), runDay = runDay2)
    }
    assert(e.getMessage.contains("2026-03-04") && e.getMessage.contains("2 attempts"))
    assert(ran.toSeq == Seq("2026-03-04", "2026-03-04"))
    // once the outage clears, the resumed backfill runs ONLY the red day
    down = false
    ran.clear()
    val r3 = Pipeline.backfill(spark, cfg, dates :+ "2026-03-04",
      sleeper = _ => (), runDay = runDay2)
    assert(ran.toSeq == Seq("2026-03-04") && r3.keySet == Set("2026-03-04"))

    // INTENTIONAL reprocessing after a code change — force ignores the
    // markers (and leaves them rewritten), clearBackfillMarkers
    // invalidates selectively
    ran.clear()
    val r4 = Pipeline.backfill(spark, cfg, Seq("2026-03-01"), force = true,
      sleeper = _ => (), runDay = runDay2)
    assert(ran.toSeq == Seq("2026-03-01") && r4.keySet == Set("2026-03-01"))
    val cleared = Pipeline.clearBackfillMarkers(spark, cfg, Seq("2026-03-02"))
    assert(cleared == Seq("2026-03-02"))
    ran.clear()
    val r5 = Pipeline.backfill(spark, cfg, dates, sleeper = _ => (), runDay = runDay2)
    assert(ran.toSeq == Seq("2026-03-02") && r5.keySet == Set("2026-03-02"),
      "only the cleared day may rerun")
    // clearing everything re-arms the full range
    val all = Pipeline.clearBackfillMarkers(spark, cfg)
    assert(all.toSet == (dates :+ "2026-03-04").toSet)
    ran.clear()
    assert(Pipeline.backfill(spark, cfg, dates, sleeper = _ => (),
      runDay = runDay2).keySet == dates.toSet)
    assert(ran.toSeq == dates)
  }

  test("merge-upsert: crash between backup and swap renames converges on re-run") {
    import org.apache.spark.sql.functions.{col, to_date}
    import graft.io.LakeZones
    import graft.ops.Relational
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-crash-").toString
    val d1 = "2026-03-01"
    val d2 = "2026-03-02"
    def frame(rows: Seq[(Long, String, String, Int)]) =
      rows.toDF("k", "v", "snapshot_date", "ver")
        .withColumn("snapshot_date", to_date(col("snapshot_date")))
    val base = frame(Seq((1L, "a", d1, 1), (2L, "b", d1, 1), (3L, "c", d2, 1)))
    LakeZones.writePartitioned(base, root, "usage", "t")
    val batch = frame(Seq((2L, "b2", d1, 2), (4L, "d", d2, 2)))

    // reconstruct the exact crash window the protocol can die in: the
    // merged days are fully staged, day 1's live partition has been
    // renamed into the undo dir, and the process died BEFORE the staged
    // day 1 was renamed into place — the live table is missing day 1
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tablePath = s"$root/usage/t"
    val staged = Relational.lastWriteWins(
      LakeZones.readTable(spark, root, "usage", "t").unionByName(batch),
      Seq("snapshot_date", "k"), org.apache.spark.sql.functions.desc("ver"))
    staged.write.mode("overwrite").partitionBy("snapshot_date")
      .parquet(s"$root/usage/.staging_t_crash0")
    assert(fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/usage/.undo_t")))
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$tablePath/snapshot_date=$d1"),
      new org.apache.hadoop.fs.Path(s"$root/usage/.undo_t/snapshot_date=$d1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$tablePath/snapshot_date=$d1")))

    // re-running the SAME batch must first restore day 1 from the undo
    // dir (k=1 exists ONLY there — losing it means data loss), drop the
    // orphaned staging dir, then merge to the final state
    LakeZones.mergeUpsertByDay(batch, root, "usage", "t", Seq("k"), Seq(org.apache.spark.sql.functions.desc("ver")))
    val out = LakeZones.readTable(spark, root, "usage", "t")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"), out.toString)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/usage/.undo_t")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/usage"))
      .forall(!_.getPath.getName.startsWith(".staging_t_")))
  }

  test("merge-upsert: Hive-escaped and null partition values swap correctly") {
    import org.apache.spark.sql.functions.col
    import graft.io.LakeZones
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-esc-").toString
    // a partition value needing Hive path escaping (colon, space) and a
    // NULL partition (__HIVE_DEFAULT_PARTITION__ on disk) — both must
    // merge, not be silently skipped by name reconstruction
    val ts = "2026-03-01 10:00:00"
    def frame(rows: Seq[(Long, String, Option[String], Int)]) =
      rows.toDF("k", "v", "snapshot_date", "ver")
    val base = frame(Seq((1L, "a", Some(ts), 1), (2L, "b", None, 1)))
    LakeZones.writePartitioned(base, root, "usage", "esc")
    val batch = frame(Seq((1L, "a2", Some(ts), 2), (3L, "c", None, 2)))
    LakeZones.mergeUpsertByDay(batch, root, "usage", "esc", Seq("k"), Seq(org.apache.spark.sql.functions.desc("ver")))
    val out = LakeZones.readTable(spark, root, "usage", "esc")
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 2L -> "b", 3L -> "c"), out.toString)
  }
}

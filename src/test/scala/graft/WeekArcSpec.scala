package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, Curate, CurateIncremental, IndexStore, Similarity}

/** Week-scale operability arc (VERDICT r11 #5): every operational piece —
  * multi-day backfill, incremental curation state with auto-compaction,
  * ANN appends with auto-compaction, drift-triggered retrain — is proven
  * separately elsewhere; this spec composes them into ONE seven-day
  * lifecycle and asserts the properties a week of unattended operation
  * actually depends on:
  *
  *  - the lake arc lands every day and its KPI read-back equals the
  *    closed-form expectation (the q82 contract, across the whole week);
  *  - the curation state stays file-bounded under daily appends AND its
  *    final corpus is byte-identical to a from-scratch batch curate of
  *    the union — a week of increments must be invisible in the result;
  *  - the ANN index absorbs drifting daily appends file-bounded, the
  *    DEFAULT maybeRetrain policy (calibrated ownCos floor) catches the
  *    injected drift with no hand-set threshold, and the retrained
  *    index's probes are bit-identical to the in-query operator over the
  *    same corpus — recovery is invisible in the answers too. */
class WeekArcSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (0 until 12).map(i => s"$seed tok$i word${i % 5}").mkString(" "))

  private val bench = Seq((9000L, "benchmark heldout question answer"))
    .toDF("doc_id", "text")

  // orthogonal vector families (AnnIndexSpec's drift fixture): base days
  // live in the front half of the dims, drifted days in the back half —
  // every drifted vector scores 0 against every base-trained centroid
  private def vecFront(i: Long): Seq[Double] = {
    val raw = (0 until 16).map(j =>
      if (j < 8) (((i * 31 + j * 17 + 7) % 97) - 48).toDouble else 0.0)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private def vecDrift(i: Long): Seq[Double] = {
    val raw = (0 until 16).map(j =>
      if (j < 8) 0.0 else (((i * 37 + j * 13 + 5) % 89) - 44).toDouble)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  test("seven-day lifecycle: lake backfill + bounded incremental state + drift-recovered ANN") {
    // ---------- lake arc: 7 daily snapshots through the full pipeline
    val base = java.nio.file.Files.createTempDirectory("graft-week-").toString
    val dates = (1 to 7).map(d => f"2026-04-0$d%1d")
    graft.sources.SyntheticRaw.writeDays(s"$base/raw", dates, moviesPerDay = 50)
    val cfg = Pipeline.Config(s"$base/raw", s"$base/lake", s"$base/serving",
      dates.head, "weekarc", multiLineRaw = false)
    val ran = Pipeline.backfill(spark, cfg, dates, retries = 0, sleeper = _ => ())
    assert(ran.size == dates.size, s"backfill landed ${ran.size}/7 days")
    val kpi = graft.io.LakeZones.readTable(spark, cfg.lakeRoot, "usage", "kpi_daily")
      .select(col("snapshot_date").cast("string"), col("nb_movies"),
        col("nb_movies_with_omdb"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(kpi.toSeq == dates.map(d => (d, 50L, 20L)),
      s"week KPI read-back diverged from the closed form: ${kpi.toSeq}")

    // ---------- curation arc: day-0 bootstrap, then 7 daily deltas with
    // auto-compaction; each day brings 3 new docs and 1 re-crawl of an
    // earlier doc under a new id (must die at the state probe)
    val croot = java.nio.file.Files.createTempDirectory("graft-weekcur-").toString
    val day0Docs = (1L to 12L).map(i => doc(i, s"seed$i"))
    CurateIncremental.bootstrap(day0Docs.toDF("doc_id", "text"), bench,
      "doc_id", "text", croot).release()

    var allDeltas = Seq.empty[(Long, String)]
    val dailySurvivorIds = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    (1 to 7).foreach { day =>
      val fresh = (1L to 3L).map(k => doc(100L * day + k, s"day${day}new$k"))
      val recrawl = Seq((100L * day + 50L, day0Docs((day - 1) % 12)._2))
      val delta = fresh ++ recrawl
      allDeltas ++= delta
      val r = CurateIncremental.daily(delta.toDF("doc_id", "text"), bench,
        "doc_id", "text", croot, autoCompact = Some(2))
      val ids = r.corpus.select("doc_id").as[Long].collect().toSeq.sorted
      r.release()
      assert(ids == fresh.map(_._1).sorted,
        s"day $day: fresh docs must survive, the re-crawl must die (got $ids)")
      dailySurvivorIds += ids
    }

    // file-bounded: after a week of appends, auto-compaction has kept
    // every state table at or under 2 files per bucket (sidecar is a
    // plain local JSON file; part files counted straight off disk)
    val st = CurateIncremental.loadState(spark, croot)
    val buckets = {
      val body = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$croot/curate_state/_graft_state.json"))
      """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
    }
    def partFiles(dir: String): Int =
      Option(new java.io.File(dir).list())
        .map(_.count(_.startsWith("part-"))).getOrElse(0)
    for ((name, dir) <- Seq(
        "fingerprints" -> s"$croot/curate_state/fingerprints",
        "band_keys" -> s"$croot/curate_state/band_keys")) {
      val files = partFiles(dir)
      assert(files > 0 && files <= buckets * 2,
        s"$name grew past the auto-compact bound: $files files for $buckets buckets")
    }

    // a week of increments == one batch curate of the union, byte for byte
    val batch = Curate.curate(
      (day0Docs ++ allDeltas).toDF("doc_id", "text"), bench, "doc_id", "text")
    val batchRows = batch.corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSet
    val stateRows = st.corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toSet
    batch.release()
    assert(stateRows == batchRows,
      s"incremental week diverged from batch curate: " +
        s"only-state=${(stateRows -- batchRows).take(3)} " +
        s"only-batch=${(batchRows -- stateRows).take(3)}")

    // ---------- ANN arc: index the day-0 corpus vectors, append each
    // day's survivors (days 5–7 drifted), auto-compacted; the DEFAULT
    // retrain policy must catch the drift via the calibrated ownCos floor
    val aroot = java.nio.file.Files.createTempDirectory("graft-weekann-").toString
    val acfg = AnnIndex.Config(nCells = 6, kmeansIters = 3, dim = 16)
    AnnIndex.build(day0Docs.map { case (i, _) => (i, vecFront(i)) }
      .toDF("c_id", "c_vec"), "c_id", "c_vec", aroot, acfg, buckets = 4)
    val baseline = AnnIndex.ownCosAtBuild(spark, aroot)
    assert(baseline.exists(_ > 0.0), s"build must stamp a baseline: $baseline")

    var allVecs = day0Docs.map { case (i, _) => (i, vecFront(i)) }
    (1 to 7).foreach { day =>
      val mk: Long => Seq[Double] = if (day >= 5) vecDrift else vecFront
      val dayVecs = dailySurvivorIds(day - 1).map(i => (i, mk(i)))
      allVecs ++= dayVecs
      AnnIndex.append(dayVecs.toDF("c_id", "c_vec"), "c_id", "c_vec", aroot,
        autoCompact = Some(2))
    }
    assert(AnnIndex.filesPerBucket(spark, aroot) <= 2.0,
      s"postings grew past the auto-compact bound: " +
        s"${AnnIndex.filesPerBucket(spark, aroot)} files/bucket")

    // drift observed and recovered by the hands-off DEFAULT policy
    // (skew effectively disabled — the cosine floor must do the work)
    val (dBefore, retrained) =
      AnnIndex.maybeRetrain(spark, aroot, maxSkew = 1e9, cfg = acfg)
    assert(retrained && dBefore.meanOwnCellCos < baseline.get * 0.8,
      s"week-of-drift must trigger the calibrated floor: $dBefore vs $baseline")
    val (dAfter, again) =
      AnnIndex.maybeRetrain(spark, aroot, maxSkew = 1e9, cfg = acfg)
    assert(!again, s"recovered index must pass the recalibrated floor: $dAfter")

    // post-retrain probes are bit-identical to the in-query operator
    // over the same corpus — the whole arc is invisible in the answers
    val union = allVecs.toDF("c_id", "c_vec")
    val queries = dailySurvivorIds.last.take(2).map(i => (i + 10000L, vecDrift(i)))
      .toDF("q_id", "q_vec")
    val trained = IndexStore.loadCentroids(spark, s"$aroot/ann_index/centroids")
    def probeRows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "c_id", "rank", "dot")
        .as[(Long, Long, Int, Double)].collect().toSet
    assert(probeRows(AnnIndex.topK(queries, aroot, k = 5, nProbes = 2))
      == probeRows(Similarity.ivfTopKQuantized(queries, union, k = 5,
        nProbes = 2, trained = trained)),
      "post-arc probe diverged from the in-query IVF operator")
  }

  /** Lake-INDEX lifecycle (late r12): seven daily micro-batches stream
    * through `indexedAppendSink` (stats manifest + Bloom index refreshed
    * incrementally inside every batch), then the fragmented table is
    * compacted and the indexes refreshed again. The properties a week of
    * unattended landings depends on: no reader ever needs the staleness
    * fallback; point/range reads stay exact at every step; compaction
    * shrinks the file count and is invisible in the answers. */
  test("seven-day lake-index lifecycle: streamed appends, fresh indexes, compaction invisible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.io.StatsManifest
    import graft.ops.Compact
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("weekidx").toString
    val table = s"$root/t"
    val ms = MemoryStream[(Long, Long)]
    val q = graft.streaming.Streaming.indexedAppendSink(
      ms.toDF.toDF("id", "v").repartition(4), s"$root/ckpt", table,
      statCols = Seq("id"), bloomKey = Some("id"), expectedItemsPerFile = 256L)
    try {
      for (day <- 0 until 7) {
        ms.addData((day * 100L until day * 100L + 100L).map(i => (i, i)): _*)
        q.processAllAvailable()
        // both indexes fresh after EVERY day — no fallback window
        assert(StatsManifest.isFresh(spark, table), s"stats stale after day $day")
        assert(StatsManifest.isFresh(spark, table, StatsManifest.BloomDir),
          s"bloom stale after day $day")
        // the day's rows are immediately point-readable via the index
        val probe = (day * 100L + 17L).toString
        val got = StatsManifest.readPoints(spark, table, "id", Seq(probe))
          .select("id").as[Long].collect().toSeq
        assert(got == Seq(day * 100L + 17L), s"day-$day probe missed ($got)")
      }
    } finally q.stop()
    val expected = spark.read.parquet(table)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(expected.map(_._1) == (0L until 700L).toSeq)
    val filesBefore = StatsManifest.liveDataFiles(spark, table).size

    // compact the week's fragmentation PER PARTITION DIR (rows cannot
    // cross a batch_id= boundary without changing their partition value
    // — Compact's documented per-directory contract), then refresh both
    // indexes incrementally: the update scans only the rewritten bins
    val reps = (0 until 7).map(day =>
      Compact.compact(spark, s"$table/batch_id=$day",
        targetBytes = 1L << 20, sortCols = Seq("id")))
    val compacted = reps.map(_.filesCompacted).sum
    val written = reps.map(_.filesWritten).sum
    assert(compacted >= 14 && written < compacted,
      s"a week of fragmented landings must compact (got $reps)")
    StatsManifest.updateStats(spark, table, Seq("id"))
    StatsManifest.updateBloom(spark, table, "id", 1024L)
    assert(StatsManifest.isFresh(spark, table))
    assert(StatsManifest.isFresh(spark, table, StatsManifest.BloomDir))
    assert(StatsManifest.liveDataFiles(spark, table).size < filesBefore)

    // compaction + refresh are invisible: same rows, same pruned reads
    val after = spark.read.parquet(table)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(after == expected, "compaction must be invisible in the rows")
    val r = StatsManifest.readRange(spark, table, "id", 150L, 250L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(r == (150L to 250L).toSeq)
    val pts = StatsManifest.readPoints(spark, table, "id", Seq("17", "617", "9999"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(pts == Seq(17L, 617L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, IndexStore, Similarity}

/** Contracts of the persisted IVF ANN index: bit-equality with the
  * in-query operator it amortizes, append-without-retrain, compaction
  * row identity, and the zero-exchange probe shape on the bucketed
  * postings side. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic UNIT 16-dim vectors; mod 97 > the id range, so corpus
  // directions are pairwise distinct (mod 19 would alias i and i+19),
  // and unit norm makes raw-dot ranking equal cosine ranking — the
  // self-query assertion below needs both (the operator ranks by dot,
  // the contract real embedding pipelines meet by normalizing)
  private def vec(i: Long): Seq[Double] = {
    val raw = (0 until 16).map(j => (((i * 31 + j * 17 + 7) % 97) - 48).toDouble)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  private val cfg = AnnIndex.Config(nCells = 6, kmeansIters = 3, dim = 16)

  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("c_id", "c_vec")
  private def queriesDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("q_id", "q_vec")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "c_id", "rank", "dot")
      .as[(Long, Long, Int, Double)].collect().toSet

  test("topK over the persisted index equals the in-query IVF operator bit-for-bit") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-").toString
    val corpus = corpusDf(1L to 80L)
    val queries = queriesDf(Seq(201L, 202L, 203L))
    AnnIndex.build(corpus, "c_id", "c_vec", root, cfg, buckets = 4)

    val trained = IndexStore.loadCentroids(spark, s"$root/ann_index/centroids")
    assert(trained.nonEmpty && trained.head.size == 16)
    val expected = rows(Similarity.ivfTopKQuantized(
      queries, corpus, k = 5, nProbes = 2, trained = trained))
    val got = rows(AnnIndex.topK(queries, root, k = 5, nProbes = 2))
    assert(got == expected,
      s"persisted probe diverged from in-query IVF:\n got=$got\n exp=$expected")
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("append assigns against persisted centroids — equality holds over the union") {
    val root = java.nio.file.Files.createTempDirectory("graft-annapp-").toString
    val day0 = corpusDf(1L to 50L)
    AnnIndex.build(day0, "c_id", "c_vec", root, cfg, buckets = 4)
    val trained = IndexStore.loadCentroids(spark, s"$root/ann_index/centroids")

    // two daily appends — no retrain, the centroid list stays day-0's
    AnnIndex.append(corpusDf(51L to 65L), "c_id", "c_vec", root)
    AnnIndex.append(corpusDf(66L to 80L), "c_id", "c_vec", root)

    val queries = queriesDf(Seq(301L, 302L))
    val expected = rows(Similarity.ivfTopKQuantized(
      queries, corpusDf(1L to 80L), k = 4, nProbes = 2, trained = trained))
    val got = rows(AnnIndex.topK(queries, root, k = 4, nProbes = 2))
    assert(got == expected,
      "appended postings must probe identically to a full in-query pass " +
        s"with the day-0 centroids:\n got=$got\n exp=$expected")

    // appended vectors are actually retrievable: a query AT an appended
    // vector's position must rank it first (dot with itself is maximal
    // within its cell; id 70 was appended on day 2)
    val self = AnnIndex.topK(queriesDf(Seq(70L)).withColumn("q_id", lit(9970L)),
      root, k = 1, nProbes = 1)
      .select("c_id").as[Long].collect()
    assert(self.headOption.contains(70L),
      s"self-query must retrieve the appended vector, got ${self.toSeq}")
  }

  test("compact folds per-day files to one per bucket without changing results") {
    val root = java.nio.file.Files.createTempDirectory("graft-anncomp-").toString
    AnnIndex.build(corpusDf(1L to 40L), "c_id", "c_vec", root, cfg, buckets = 4)
    for (d <- 0 until 3)
      AnnIndex.append(corpusDf((41L + 10 * d) to (50L + 10 * d)), "c_id", "c_vec", root)
    val dir = s"$root/ann_index/postings"
    def partFiles(): Int =
      Option(new java.io.File(dir).list()).map(_.count(_.startsWith("part-"))).getOrElse(0)
    val before = partFiles()
    assert(before > 4, s"expected >4 posting files after 3 appends, got $before")
    val queries = queriesDf(Seq(401L, 402L))
    val preCompact = rows(AnnIndex.topK(queries, root, k = 3, nProbes = 2))

    AnnIndex.compact(spark, root)

    assert(partFiles() <= 4 && partFiles() < before,
      s"postings not compacted: ${partFiles()} files")
    assert(rows(AnnIndex.topK(queries, root, k = 3, nProbes = 2)) == preCompact,
      "compaction changed probe results")
  }

  test("autoCompact bounds posting files across appends without changing results") {
    val root = java.nio.file.Files.createTempDirectory("graft-annauto-").toString
    AnnIndex.build(corpusDf(1L to 40L), "c_id", "c_vec", root, cfg, buckets = 4)
    // threshold 2: day 1 lands 2 files/bucket (no run), day 2 pushes past
    // and compacts to 1, day 3 lands 2 — bounded with no manual calls
    for (d <- 0 until 3)
      AnnIndex.append(corpusDf((41L + 10 * d) to (50L + 10 * d)), "c_id", "c_vec",
        root, autoCompact = Some(2))
    val fpb = AnnIndex.filesPerBucket(spark, root)
    assert(fpb > 0.0 && fpb <= 2.0,
      s"auto-compaction did not bound the postings file count: $fpb files/bucket")
    // probes equal an identical index that never auto-compacted
    val plain = java.nio.file.Files.createTempDirectory("graft-annauto2-").toString
    AnnIndex.build(corpusDf(1L to 40L), "c_id", "c_vec", plain, cfg, buckets = 4,
      trained = IndexStore.loadCentroids(spark, s"$root/ann_index/centroids"))
    for (d <- 0 until 3)
      AnnIndex.append(corpusDf((41L + 10 * d) to (50L + 10 * d)), "c_id", "c_vec", plain)
    val queries = queriesDf(Seq(601L, 602L))
    assert(rows(AnnIndex.topK(queries, root, k = 3, nProbes = 2))
      == rows(AnnIndex.topK(queries, plain, k = 3, nProbes = 2)),
      "auto-compaction changed probe results")
    assert(!AnnIndex.maybeCompact(spark, root, 10))
  }

  test("probe plans zero exchange on the postings side, through a fresh registration") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val root = java.nio.file.Files.createTempDirectory("graft-annplan-").toString
    AnnIndex.build(corpusDf(1L to 60L), "c_id", "c_vec", root, cfg, buckets = 4)
    // a fresh session wouldn't hold the catalog entry — drop it so topK
    // must re-register the bucketed table over the existing files
    spark.sql(s"DROP TABLE IF EXISTS ${AnnIndex.postTable(root)}")

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = AnnIndex.topK(queriesDf(Seq(501L)), root, k = 3, nProbes = 2)
      val plan = probe.queryExecution.executedPlan
      def isPostingsScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(root))
        case _ => false
      }
      def postingsFeedDirectly(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isPostingsScan(f)
        case _: BaseJoinExec => false
        case other => other.children.exists(postingsFeedDirectly)
      }
      val scans = plan.collect { case f: FileSourceScanExec if isPostingsScan(f) => f }
      assert(scans.nonEmpty && scans.forall(_.relation.bucketSpec.isDefined),
        s"probe does not scan postings through the bucketed table:\n$plan")
      val bad = plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.children.exists(postingsFeedDirectly))
      assert(bad.isEmpty, s"probe re-shuffles the corpus-scale postings:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  // orthogonal families for the drift test: the base corpus lives in the
  // FRONT half of the dims, the drifted appends in the BACK half. Every
  // drifted vector then scores exactly 0 against every base-trained
  // centroid — ties collapse the whole family into cell 0, the megacell
  // degeneration appends silently produce when the data moves
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

  test("drift observables move on drifted appends; retrain restores cost and coherence") {
    val root = java.nio.file.Files.createTempDirectory("graft-anndrift-").toString
    val base = (1L to 80L).map(i => (i, vecFront(i))).toDF("c_id", "c_vec")
    AnnIndex.build(base, "c_id", "c_vec", root, cfg, buckets = 4)
    val d0 = AnnIndex.drift(spark, root)
    assert(d0.nPostings == 80 && d0.nCells == 6)
    assert(d0.meanOwnCellCos > 0.5, s"post-build cells should be coherent: $d0")

    val drifted = (101L to 180L).map(i => (i, vecDrift(i))).toDF("c_id", "c_vec")
    AnnIndex.append(drifted, "c_id", "c_vec", root)
    val union = base.union(drifted)
    val d1 = AnnIndex.drift(spark, root)
    assert(d1.nPostings == 160)
    assert(d1.meanOwnCellCos < d0.meanOwnCellCos - 0.1,
      s"own-cell cosine must fall under drifted appends: before=$d0 after=$d1")

    // The drifted failure mode at fixed nProbes is COST, not recall: the
    // whole drifted family lands in whichever frozen cell is least-wrong,
    // and probing it degenerates to a brute-force scan of the family
    // (recall stays high BECAUSE the probe reads everything). Candidate
    // volume per query — what a 100 TB probe pays — is the observable.
    val qs = (101L to 179L by 7).map(i => (i + 10000L, vecDrift(i)))
      .toDF("q_id", "q_vec")
    val nQ = qs.count()
    val truth = Similarity.cosineTopK(qs, union, k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAndCandidates(): (Double, Long) = {
      val got = AnnIndex.topK(qs, root, k = 5, nProbes = 2)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // k above nPostings returns every candidate in the probed cells —
      // the per-query scan volume the index exists to bound
      val cands = AnnIndex.topK(qs, root, k = 1000000, nProbes = 2).count()
      ((truth & got).size.toDouble / (nQ * 5), cands)
    }
    val (recallBefore, candsBefore) = recallAndCandidates()

    // the hands-off policy observes the megacell skew and retrains
    val (dObs, ran) = AnnIndex.maybeRetrain(spark, root, maxSkew = 3.0, cfg = cfg)
    assert(ran && dObs.cellSkew > 3.0,
      s"megacell skew must trigger the retrain policy: $dObs")

    val (recallAfter, candsAfter) = recallAndCandidates()
    assert(candsAfter < candsBefore * 0.6,
      s"retrain must rebalance cells and cut probe cost: candidates " +
        s"$candsBefore -> $candsAfter (drift=$d1)")
    assert(recallAfter >= 0.7,
      f"retrain must keep recall while cutting cost: $recallBefore%.3f -> $recallAfter%.3f")
    assert(recallAfter / candsAfter > recallBefore / candsBefore,
      f"recall per candidate scanned must improve: $recallBefore%.3f/$candsBefore " +
        f"-> $recallAfter%.3f/$candsAfter")
    val d2 = AnnIndex.drift(spark, root)
    assert(d2.nPostings == 160 && d2.meanOwnCellCos > d1.meanOwnCellCos + 0.1,
      s"retrained cells must re-cohere: drifted=$d1 retrained=$d2")
    assert(d2.cellSkew < d1.cellSkew,
      s"retrained cells must rebalance: drifted=$d1 retrained=$d2")
    // rebalanced cells are under the policy threshold — no second run
    val (dAfter, ranAgain) = AnnIndex.maybeRetrain(spark, root, maxSkew = 3.0, cfg = cfg)
    assert(!ranAgain && dAfter.cellSkew <= 3.0,
      s"a rebalanced index must not re-trigger the policy: $dAfter")
    // the retrained index still equals the in-query operator bit-for-bit
    // under its (re-persisted) centroid list — the q70 contract survives
    val trained = IndexStore.loadCentroids(spark, s"$root/ann_index/centroids")
    assert(trained.nonEmpty)
    assert(rows(AnnIndex.topK(qs, root, k = 5, nProbes = 2))
      == rows(Similarity.ivfTopKQuantized(qs, union, k = 5, nProbes = 2,
        trained = trained)),
      "post-retrain probe diverged from the in-query IVF operator")
  }

  test("default coherence floor calibrates from the build-time ownCos baseline") {
    // VERDICT r11 #6: with maxSkew effectively disabled, the DEFAULT
    // policy must still catch coherence-type drift — the floor derives
    // from the sidecar's build-time ownCos (0.8×), no hand-set threshold.
    val root = java.nio.file.Files.createTempDirectory("graft-anncos-").toString
    val base = (1L to 80L).map(i => (i, vecFront(i))).toDF("c_id", "c_vec")
    AnnIndex.build(base, "c_id", "c_vec", root, cfg, buckets = 4)
    val baseline = AnnIndex.ownCosAtBuild(spark, root)
    assert(baseline.exists(_ > 0.5), s"build must stamp a coherent baseline: $baseline")

    // healthy index: neither observable fires under defaults
    val (d0, ran0) = AnnIndex.maybeRetrain(spark, root, maxSkew = 1e9, cfg = cfg)
    assert(!ran0 && d0.meanOwnCellCos >= baseline.get * 0.8 - 1e-9,
      s"healthy index must not trigger the calibrated floor: $d0 vs $baseline")

    // drifted appends halve the mean own-cell cosine (the drifted family
    // scores 0 against every frozen centroid) — the calibrated floor
    // fires even though skew is ignored
    val drifted = (101L to 180L).map(i => (i, vecDrift(i))).toDF("c_id", "c_vec")
    AnnIndex.append(drifted, "c_id", "c_vec", root)
    val (d1, ran1) = AnnIndex.maybeRetrain(spark, root, maxSkew = 1e9, cfg = cfg)
    assert(ran1 && d1.meanOwnCellCos < baseline.get * 0.8,
      s"cosine observable must trigger retrain under defaults: $d1 vs $baseline")

    // retrain re-stamped the baseline from the retrained geometry; the
    // recovered index passes the default policy again
    val baseline2 = AnnIndex.ownCosAtBuild(spark, root)
    assert(baseline2.nonEmpty && baseline2 != baseline,
      s"retrain must re-stamp the ownCos baseline: $baseline -> $baseline2")
    val (d2, ran2) = AnnIndex.maybeRetrain(spark, root, maxSkew = 1e9, cfg = cfg)
    assert(!ran2 && d2.meanOwnCellCos >= baseline2.get * 0.8 - 1e-9,
      s"retrained index must pass the recalibrated floor: $d2 vs $baseline2")
  }

  test("recall@10 holds a pinned floor through appends + takedowns + one retrain (VERDICT r15 #6)") {
    // the lifecycle where silent recall rot hides: build, two appends
    // assigned against stale centroids, a takedown sweep, then a
    // retrain re-centering cells on the survivors. Everything is
    // seeded/deterministic, so recall@10 is a FIXED number — the pin is
    // a floor just under the measured value, and any edit to the
    // build/append/remove/retrain path that degrades ranked retrieval
    // fails here instead of surfacing as production recall rot.
    val root = java.nio.file.Files.createTempDirectory("graft-annrecall-").toString
    AnnIndex.build(corpusDf(1L to 200L), "c_id", "c_vec", root, cfg, buckets = 4)
    AnnIndex.append(corpusDf(201L to 260L), "c_id", "c_vec", root)
    AnnIndex.append(corpusDf(261L to 320L), "c_id", "c_vec", root)
    val removed = (5L to 60L by 5).toSet
    assert(AnnIndex.remove(removed.toSeq.toDF("c_id"), "c_id", root) ==
      removed.size)
    AnnIndex.retrain(spark, root, cfg)

    val live = (1L to 320L).filterNot(removed)
    val queries = queriesDf(401L to 440L)
    val truth = Similarity.cosineTopK(queries, corpusDf(live), 10)
      .select("q_id", "c_id")
    val approx = AnnIndex.topK(queries, root, k = 10, nProbes = 3)
      .select("q_id", "c_id")
    val recall = truth.join(approx, Seq("q_id", "c_id")).count().toDouble /
      (40 * 10)
    // removed ids must never surface (the takedown contract inside the
    // recall lifecycle)
    assert(approx.filter(col("c_id").isin(removed.toSeq: _*)).count() == 0)
    assert(recall >= 0.85,
      f"recall@10 after append+takedown+retrain regressed: $recall%.3f < 0.85")
  }

  test("remove sweeps a vector out of the postings and out of every neighbor list") {
    val root = java.nio.file.Files.createTempDirectory("graft-annrm-").toString
    val corpus = corpusDf(1L to 80L)
    AnnIndex.build(corpus, "c_id", "c_vec", root, cfg, buckets = 4)

    // query with vector 7's own direction: pre-removal, 7 is its top hit
    val qSelf = Seq((207L, vec(7))).toDF("q_id", "q_vec")
    val before = rows(AnnIndex.topK(qSelf, root, k = 5, nProbes = 6))
    assert(before.exists(_._2 == 7L), "sanity: 7 must be a neighbor before removal")

    val removed = AnnIndex.remove(Seq(7L).toDF("c_id"), "c_id", root)
    assert(removed == 1L)
    val after = rows(AnnIndex.topK(qSelf, root, k = 5, nProbes = 6))
    assert(!after.exists(_._2 == 7L),
      "a removed vector must never surface as a neighbor")
    assert(after.groupBy(_._1).forall(_._2.size == 5),
      "remaining postings still fill the top-k")
    // and the swept postings match the index built without the vector
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-annrm2-").toString
    AnnIndex.build(corpusDf((1L to 80L).filterNot(_ == 7L)), "c_id", "c_vec",
      rebuilt, cfg, buckets = 4,
      trained = IndexStore.loadCentroids(spark, s"$root/ann_index/centroids"))
    assert(rows(AnnIndex.topK(qSelf, root, k = 5, nProbes = 6))
      == rows(AnnIndex.topK(qSelf, rebuilt, k = 5, nProbes = 6)),
      "remove must equal building the index without the removed vector")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curate, CurateIncremental}

/** Durability and scale-shape contracts of the persisted curation state
  * (bucketed tables, crash ordering, compaction) — the operability layer
  * under [[graft.ops.CurateIncremental]]. Correctness of the curation
  * semantics themselves lives in LlmOpsSpec; this spec covers what
  * happens AROUND the happy path: a crash mid-append, a fresh session
  * re-attaching to existing files, a week of small-file appends. */
class CurateStateSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (0 until 12).map(i => s"$seed tok$i word${i % 5}").mkString(" "))

  private def docsDf(pairs: Seq[(Long, String)]) = pairs.toDF("doc_id", "text")

  private val bench = Seq((9000L, "benchmark heldout question answer")).toDF("doc_id", "text")

  private def partFiles(dir: String): Int =
    Option(new java.io.File(dir).list()).map(_.count(_.startsWith("part-"))).getOrElse(0)

  test("appendState crash between index and corpus writes over-drops, never re-admits") {
    val root = java.nio.file.Files.createTempDirectory("graft-crash-").toString
    val base = docsDf(Seq(doc(1, "alpha"), doc(2, "beta")))
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root).release()

    // day 1 survivors appended with a crash injected AFTER the index
    // writes, BEFORE the corpus write — the worst spot: the doc's
    // fingerprint is durable but its text is not
    val day1 = docsDf(Seq(doc(10, "gamma")))
    val boom = intercept[RuntimeException] {
      CurateIncremental.appendStateHooked(day1, "doc_id", "text", root,
        Curate.Config(), () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")

    val st = CurateIncremental.loadState(spark, root)
    assert(st.fingerprints.filter(col("id") === 10).count() == 1,
      "index write must be durable before the crash point")
    assert(st.corpus.filter(col("doc_id") === 10).count() == 0,
      "corpus write must NOT have happened before the crash point")

    // the re-run of the failed day re-crawls the same content under a new
    // id: it must DIE at the fingerprint probe (over-drop) — the ordering
    // guarantees a crash never silently re-admits a duplicate
    val rerun = docsDf(Seq(doc(11, "gamma")))
    val r = CurateIncremental.curateDelta(rerun, bench, "doc_id", "text", st)
    assert(r.corpus.count() == 0,
      "re-crawl of a crash-lost doc must be over-dropped by the orphan fingerprint")
    r.release()
  }

  test("fresh session re-registers bucketed state tables via DDL over existing files") {
    val root = java.nio.file.Files.createTempDirectory("graft-ddl-").toString
    val base = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "delta")))
    CurateIncremental.saveState(
      CurateIncremental.buildState(base, "doc_id", "text"), root, buckets = 4)

    // simulate a fresh session: drop the in-memory catalog entries, so
    // only the files + sidecar remain — exactly what a restarted job sees
    for (p <- Seq("fps", "bks")) {
      val dir = s"$root/curate_state/" +
        (if (p == "fps") "fingerprints" else "band_keys")
      spark.sql(s"DROP TABLE IF EXISTS ${CurateIncremental.tableName(p, dir)}")
    }
    val st = CurateIncremental.loadState(spark, root)
    assert(st.fingerprints.count() == 3 && st.corpus.count() == 3)

    // the re-registered table must still carry its bucket spec — that is
    // the entire point of the DDL round-trip
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = st.fingerprints.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.relation.bucketSpec.exists(
      b => b.numBuckets == 4 && b.bucketColumnNames == Seq("content_key"))),
      "fingerprint scan lost its bucket spec after DDL re-registration")

    // and a daily against the re-attached state still dedups
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(20, "alpha"), doc(21, "zeta"))), bench, "doc_id", "text", root)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(21L),
      "re-crawl of doc 1's content must die at the probe; fresh doc survives")
    r.release()
  }

  // deterministic pseudo-random unit-ish vectors: distinct docs land far
  // apart in cosine; planted near-dups are scalar multiples (cosine 1
  // before quantization, ~0.9999 after). NOTE: the formula is periodic in
  // i mod 19 — ids used within one test must have distinct residues or
  // they are genuine exact duplicates
  private def vec(i: Long, dim: Int = 16): Seq[Double] =
    (0 until dim).map(j => (((i * 31 + j * 17 + 7) % 19) - 9).toDouble / 9.0)

  private def jitter(v: Seq[Double]): Seq[Double] = v.map(_ * 1.0009765625)

  private def embDf(rows: Seq[(Long, Seq[Double])]) = rows.toDF("doc_id", "v")

  test("incremental embedding curation equals full re-curate of the union") {
    import graft.ops.{Dedup, Similarity}
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    // day 0: docs 1..8 plus jittered copies of 2 and 5 → full curate
    // keeps min ids
    val day0 = embDf((1L to 8L).map(i => (i, vec(i))) ++
      Seq((20L, jitter(vec(2))), (21L, jitter(vec(5)))))
    def fullCurate(df: org.apache.spark.sql.DataFrame) =
      Dedup.survivorsTransitive(df,
        Similarity.embeddingNearDupsQuantized(df, "doc_id", "v",
          ecfg.threshold, ecfg.nPlanes, ecfg.prefixBits, ecfg.seeds,
          ecfg.quantScale, ecfg.dim), "doc_id")
    val curated0 = fullCurate(day0)
    assert(curated0.select("doc_id").as[Long].collect().toSet == (1L to 8L).toSet)

    val root = java.nio.file.Files.createTempDirectory("graft-embinc-").toString
    val textSide = curated0.select(col("doc_id"), lit("stub text").as("text"))
    CurateIncremental.saveState(
      CurateIncremental.withEmbeddings(
        CurateIncremental.buildState(textSide, "doc_id", "text"),
        curated0, "doc_id", "v", ecfg),
      root, buckets = 4)

    // day 1 delta: fresh docs 30..33, a jitter of state doc 3 (must die —
    // corpus wins), and an in-delta jitter pair (31, 40) (min id 31 wins)
    val delta = embDf(Seq((30L, vec(30)), (31L, vec(31)), (32L, vec(32)),
      (33L, jitter(vec(3))), (40L, jitter(vec(31)))))
    val st = CurateIncremental.loadState(spark, root)
    val inc = CurateIncremental.curateDeltaEmbeddings(delta, "doc_id", "v", st, ecfg)
    val incIds = inc.select("doc_id").as[Long].collect().toSet

    val full = fullCurate(day0.unionByName(delta))
      .select("doc_id").as[Long].collect().toSet
    assert((1L to 8L).toSet ++ incIds == full,
      s"state ∪ incremental = ${(1L to 8L).toSet ++ incIds} but full re-curate = $full")
    assert(incIds == Set(30L, 31L, 32L))
  }

  test("appendEmbedState makes day-1 embedding survivors probe-able on day 2") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-embapp-").toString
    val day0 = embDf(Seq((1L, vec(1)), (2L, vec(2))))
    CurateIncremental.saveState(
      CurateIncremental.withEmbeddings(
        CurateIncremental.buildState(
          day0.select(col("doc_id"), lit("t").as("text")), "doc_id", "text"),
        day0, "doc_id", "v", ecfg),
      root, buckets = 4)

    val st1 = CurateIncremental.loadState(spark, root)
    val day1 = embDf(Seq((10L, vec(10))))
    val s1 = CurateIncremental.curateDeltaEmbeddings(day1, "doc_id", "v", st1, ecfg)
    assert(s1.count() == 1)
    CurateIncremental.appendEmbedState(s1, "doc_id", "v", root, ecfg)

    // day 2: a jitter of day 1's survivor must now die at the probe —
    // through a freshly loaded state (fresh-session shape)
    val st2 = CurateIncremental.loadState(spark, root)
    assert(st2.embeddings.get.count() == 3 && st2.srpBuckets.get.count() == 6,
      "embedding state tables must have grown by the appended survivor")
    val day2 = embDf(Seq((20L, jitter(vec(10))), (17L, vec(17))))
    val s2 = CurateIncremental.curateDeltaEmbeddings(day2, "doc_id", "v", st2, ecfg)
    assert(s2.select("doc_id").as[Long].collect().toSet == Set(17L))
  }

  test("bootstrap/daily with embeddings: the operational surface keeps the embedding stage in sync") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-embdaily-").toString

    // day 0: five distinct docs, plus doc 22 whose TEXT is fresh but whose
    // vector is a jitter of doc 2's — only the embedding stage can kill it
    val day0Ids = (1L to 5L)
    val day0 = docsDf(day0Ids.map(i => doc(i, s"seed$i")) :+ doc(22, "odd"))
    val day0Vecs = embDf(day0Ids.map(i => (i, vec(i))) :+ ((22L, jitter(vec(2)))))
    val boot = CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root,
      Curate.Config(), vecs = Some(day0Vecs))
    assert(boot.corpus.select("doc_id").as[Long].collect().toSet == day0Ids.toSet,
      "bootstrap must drop the embedding near-dup the text stages cannot see")
    boot.release()
    val st0 = CurateIncremental.loadState(spark, root)
    assert(st0.embeddings.get.count() == 5 && st0.srpBuckets.get.count() == 10,
      "persisted embedding tables must hold exactly the survivors")

    // a daily that omits deltaVecs on an embedding-carrying state must
    // refuse instead of silently desynchronizing the embedding tables
    val noVecs = intercept[IllegalArgumentException] {
      CurateIncremental.daily(docsDf(Seq(doc(90, "ninety"))), bench,
        "doc_id", "text", root)
    }
    assert(noVecs.getMessage.contains("deltaVecs"))

    // day 1: a fresh doc, a text re-crawl (text probe kills it), and a
    // fresh-text doc whose vector jitters state doc 3's (embedding probe
    // kills it)
    val day1 = docsDf(Seq(doc(30, "thirty"), doc(31, "seed1"), doc(32, "thirtytwo")))
    val day1Vecs = embDf(Seq((30L, vec(30)), (31L, vec(31)), (32L, jitter(vec(3)))))
    val r1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root,
      Curate.Config(), deltaVecs = Some(day1Vecs))
    assert(r1.corpus.select("doc_id").as[Long].collect().toSet == Set(30L),
      "text re-crawl and embedding near-dup must both die")
    r1.release()

    // day 2 through a fresh load: the appended embedding state must kill a
    // jitter of day 1's survivor, and the tables grew in lockstep
    val st1 = CurateIncremental.loadState(spark, root)
    assert(st1.corpus.count() == 6 && st1.embeddings.get.count() == 6 &&
      st1.srpBuckets.get.count() == 12,
      "corpus and embedding tables must grow in lockstep")
    val day2 = docsDf(Seq(doc(40, "forty"), doc(41, "fortyone")))
    // NOTE: vec() is periodic mod 19 — vec(41) would EQUAL vec(3), so doc
    // 41 takes generator index 33 (residue 14, unused) for a fresh vector
    val day2Vecs = embDf(Seq((40L, jitter(vec(30))), (41L, vec(33))))
    val r2 = CurateIncremental.daily(day2, bench, "doc_id", "text", root,
      Curate.Config(), deltaVecs = Some(day2Vecs))
    assert(r2.corpus.select("doc_id").as[Long].collect().toSet == Set(41L),
      "day-1 survivor's vector must be probe-able on day 2")
    r2.release()
  }

  test("combined entity + embedding daily: both indexes probe, audit labels entity_dup and embedding_dup") {
    import org.apache.spark.sql.Column
    val sh3: Column => Column = t => {
      val ws = split(trim(t), "\\s+")
      val len = greatest(size(ws) - 2, lit(0))
      zip_with(zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b)), slice(ws, lit(3), len),
        (ab, c) => concat(ab, lit(" "), c))
    }
    val cfg = Curate.Config(nearDupThreshold = 2.0, audit = true,
      entityExact = Some(Curate.EntityExact(sh3, 2L, 3L)))
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-xembd-").toString

    val d2 = doc(2, "alpha"); val d4 = doc(4, "beta")
    val day0 = docsDf(Seq(d2, d4))
    CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root,
      cfg.copy(audit = false),
      vecs = Some(embDf(Seq((2L, vec(2)), (4L, vec(4))))), ecfg = ecfg)
      .release()

    // day 1: 10 is fresh on both axes; 12 aliases state doc 2's TEXT
    // (entity index kills it); 14 has fresh text but a jitter of state
    // doc 4's VECTOR (embedding index kills it); 16 is an exact text
    // re-crawl of doc 4 (fingerprint kills it first)
    val day1 = docsDf(Seq(doc(10, "gamma"),
      (12L, d2._2 + " alias suffix marker"), doc(14, "delta"),
      (16L, d4._2)))
    val day1Vecs = embDf(Seq((10L, vec(10)), (12L, vec(12)),
      (14L, jitter(vec(4))), (16L, vec(16))))
    val r1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root,
      cfg, deltaVecs = Some(day1Vecs), ecfg = ecfg)
    assert(r1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L),
      "entity alias, embedding near-dup and exact re-crawl must all drop")
    val labels = r1.audit.get.select("doc_id", "stage")
      .as[(Long, String)].collect().toMap
    assert(labels == Map(10L -> "survived", 12L -> "entity_dup",
      14L -> "embedding_dup", 16L -> "exact_dup"),
      s"audit must name each axis's stage: $labels")
    r1.release()

    // day 2 probes BOTH appended indexes: an alias of day-1 survivor 10
    // and a vector jitter of 10's embedding must each drop
    val day2 = docsDf(Seq((20L, doc(10, "gamma")._2 + " alias suffix marker"),
      doc(22, "epsilon")))
    val day2Vecs = embDf(Seq((20L, vec(20)), (22L, jitter(vec(10)))))
    val r2 = CurateIncremental.daily(day2, bench, "doc_id", "text", root,
      cfg, deltaVecs = Some(day2Vecs), ecfg = ecfg)
    assert(r2.corpus.isEmpty,
      "day-2 alias and embedding jitter of day-1 survivors must drop")
    val labels2 = r2.audit.get.select("doc_id", "stage")
      .as[(Long, String)].collect().toMap
    assert(labels2 == Map(20L -> "entity_dup", 22L -> "embedding_dup"),
      s"day-2 labels must cross the APPENDED state boundary: $labels2")
    r2.release()
  }

  test("refresh: bootstrap -> daily x2 -> refresh equals one full curate of the union") {
    import graft.ops.Curate
    val root = java.nio.file.Files.createTempDirectory("graft-refresh-").toString
    val day0 = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma")))
    val day1 = docsDf(Seq(doc(10, "delta"), doc(11, "alpha")))   // 11 re-crawls 1
    val day2 = docsDf(Seq(doc(20, "epsilon"), doc(21, "delta"))) // 21 re-crawls 10
    val pending = docsDf(Seq(doc(30, "zeta"), doc(31, "epsilon"))) // 31 re-crawls 20

    CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root).release()
    CurateIncremental.daily(day1, bench, "doc_id", "text", root).release()
    CurateIncremental.daily(day2, bench, "doc_id", "text", root).release()
    val ref = CurateIncremental.refresh(pending, bench, "doc_id", "text", root)
    val got = ref.corpus.select("doc_id", "text", "split")
      .as[(Long, String, String)].collect().toSet

    val full = Curate.curate(
      day0.unionByName(day1).unionByName(day2).unionByName(pending),
      bench, "doc_id", "text")
    val want = full.corpus.select("doc_id", "text", "split")
      .as[(Long, String, String)].collect().toSet
    assert(got == want, s"refresh corpus != full curate of the union")
    full.release(); ref.release()

    // the rebuilt state is consistent and still functions: a daily after
    // refresh dedups re-crawls of both old and pending content
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.count() == want.size &&
      st.fingerprints.count() == want.size)
    val day3 = CurateIncremental.daily(
      docsDf(Seq(doc(40, "alpha"), doc(41, "zeta"), doc(42, "omega"))),
      bench, "doc_id", "text", root)
    assert(day3.corpus.select("doc_id").as[Long].collect().toSet == Set(42L))
    day3.release()
  }

  test("winnow state: incremental span probe equals the batch filter; borrowers drop") {
    val wf = Curate.Winnow(k = 5, w = 4, minShared = 1, maxDf = 10)
    val cfg = Curate.Config(winnowFilter = Some(wf))
    val root = java.nio.file.Files.createTempDirectory("graft-winnowst-").toString
    val day0 = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma")))
    CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root, cfg).release()
    assert(CurateIncremental.loadState(spark, root).winnowFps.nonEmpty,
      "bootstrap with winnowFilter must persist the winnow table")

    // day 1: 10 is fresh; 11 borrows 14 tokens from state doc 1 (below
    // the near-dup Jaccard threshold — only the span probe can see it);
    // 12 borrows the same way from DELTA doc 10 (delta-vs-delta, 10 < 12)
    def borrow(id: Long, src: String, tag: String) = {
      val toks = src.split(" ")
      (id, (Seq(s"${tag}p1", s"${tag}p2", s"${tag}p3", s"${tag}p4") ++
        toks.slice(5, 19) ++
        Seq(s"${tag}s1", s"${tag}s2", s"${tag}s3", s"${tag}s4")).mkString(" "))
    }
    val fresh10 = doc(10, "delta")
    val day1 = docsDf(Seq(fresh10,
      borrow(11, doc(1, "alpha")._2, "bb"),
      borrow(12, fresh10._2, "cc")))
    val d1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root, cfg)
    assert(d1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L),
      "state borrower and delta borrower must both drop")
    d1.release()

    // incremental result == full batch curate of the union
    val full = Curate.curate(day0.unionByName(day1), bench, "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val st = CurateIncremental.loadState(spark, root)
    val got = st.corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"state after daily ($got) != full curate ($want)")
    full.release()

    // day 1's survivor is span-probe-able on day 2
    val day2 = docsDf(Seq(borrow(20, fresh10._2, "dd")))
    val d2 = CurateIncremental.daily(day2, bench, "doc_id", "text", root, cfg)
    assert(d2.corpus.count() == 0,
      "day-2 borrower of a day-1 survivor must die at the persisted winnow probe")
    d2.release()

    // a winnow-carrying state refuses a config without the stage
    val boom = intercept[IllegalArgumentException] {
      CurateIncremental.daily(docsDf(Seq(doc(30, "omega"))),
        bench, "doc_id", "text", root) // default cfg: winnowFilter off
    }
    assert(boom.getMessage.contains("winnow"))
  }

  test("appendEmbedState backfills embedding tables onto a text-only state") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-embback-").toString
    val base = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma")))
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root).release()
    assert(CurateIncremental.loadState(spark, root).embeddings.isEmpty,
      "a vec-less bootstrap must not create embedding tables")

    // backfill: index the existing corpus' vectors in one call — the
    // upgrade path for a corpus curated before embeddings existed
    CurateIncremental.appendEmbedState(
      embDf(Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)))), "doc_id", "v",
      root, ecfg)

    // the upgraded state carries the embedding tables, and a daily jitter
    // of backfilled content dies at the probe
    val st = CurateIncremental.loadState(spark, root)
    assert(st.embeddings.get.count() == 3 && st.srpBuckets.get.count() == 6,
      "backfill must index exactly the supplied vectors")
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(10, "kappa"), doc(11, "lambda"))), bench,
      "doc_id", "text", root, Curate.Config(),
      deltaVecs = Some(embDf(Seq((10L, jitter(vec(2))), (11L, vec(7))))),
      ecfg = ecfg)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(11L),
      "backfilled vectors must be probe-able by the next daily")
    r.release()
  }

  test("refresh with embeddings rebuilds the embedding state from the union") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-refemb-").toString
    val day0 = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma")))
    CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root,
      Curate.Config(), vecs = Some(embDf(Seq((1L, vec(1)), (2L, vec(2)),
        (3L, vec(3))))), ecfg = ecfg).release()
    CurateIncremental.daily(docsDf(Seq(doc(10, "delta"))), bench,
      "doc_id", "text", root, Curate.Config(),
      deltaVecs = Some(embDf(Seq((10L, vec(10))))), ecfg = ecfg).release()

    // a refresh that omits pendingVecs on an embedding-carrying state
    // must refuse, mirroring daily's contract
    val noVecs = intercept[IllegalArgumentException] {
      CurateIncremental.refresh(docsDf(Seq(doc(90, "ninety"))), bench,
        "doc_id", "text", root)
    }
    assert(noVecs.getMessage.contains("pendingVecs"))

    // pending: 20 fresh; 21 fresh TEXT whose vector jitters state doc 2's
    // (only the corpus-wide embedding collapse can kill it — min id 2
    // wins); 22 re-crawls doc 1's text (the full text recipe kills it)
    val pending = docsDf(Seq(doc(20, "epsilon"), doc(21, "zeta"), doc(22, "alpha")))
    val pendingVecs = embDf(Seq((20L, vec(4)), (21L, jitter(vec(2))), (22L, vec(5))))
    val ref = CurateIncremental.refresh(pending, bench, "doc_id", "text", root,
      Curate.Config(), pendingVecs = Some(pendingVecs), ecfg = ecfg)
    assert(ref.corpus.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 10L, 20L),
      "refresh must keep union survivors of both the text and embedding stages")
    ref.release()

    // the rebuilt embedding state indexes exactly the corpus and still
    // functions: a daily jitter of a PENDING survivor's vector dies
    val st = CurateIncremental.loadState(spark, root)
    assert(st.embeddings.get.count() == 5 && st.srpBuckets.get.count() == 10,
      "rebuilt embedding tables must hold exactly the refreshed corpus")
    val day3 = CurateIncremental.daily(
      docsDf(Seq(doc(30, "omega"), doc(31, "sigma"))), bench,
      "doc_id", "text", root, Curate.Config(),
      deltaVecs = Some(embDf(Seq((30L, jitter(vec(4))), (31L, vec(6))))),
      ecfg = ecfg)
    assert(day3.corpus.select("doc_id").as[Long].collect().toSet == Set(31L),
      "refreshed embedding state must make pending survivors probe-able")
    day3.release()
  }

  test("refresh runs the corpus-global boilerplate stage the daily increment must skip") {
    import graft.ops.Curate
    val root = java.nio.file.Files.createTempDirectory("graft-refreshbp-").toString
    def twoLine(id: Long, seed: String) =
      (id, (0 until 10).map(i => s"$seed word$i tok${i % 3}").mkString(" ") +
        "\nSHARED FOOTER line all pages carry")
    val day0 = Seq(twoLine(1, "alpha"), twoLine(2, "beta")).toDF("doc_id", "text")
    CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root).release()
    CurateIncremental.daily(Seq(twoLine(10, "gamma")).toDF("doc_id", "text"),
      bench, "doc_id", "text", root).release()

    val ref = CurateIncremental.refresh(
      Seq(twoLine(20, "delta")).toDF("doc_id", "text"), bench, "doc_id", "text",
      root, Curate.Config(boilerplateMaxDocs = Some(2)))
    val texts = ref.corpus.select("text").as[String].collect()
    assert(texts.length == 4 && texts.forall(!_.contains("SHARED FOOTER")),
      "refresh must strip the corpus-frequent footer line")
    ref.release()
    // and the rebuilt fingerprints index the STRIPPED text: a re-crawl of
    // a doc (footer included) is caught as a near/exact dup of the
    // stripped survivor only if fingerprints match the stored corpus —
    // assert state and corpus agree instead of guessing semantics
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.count() == 4 && st.fingerprints.count() == 4)
  }

  test("vacuumState removes crash residue but rolls a half-swap forward first") {
    val root = java.nio.file.Files.createTempDirectory("graft-vacuum-").toString
    CurateIncremental.bootstrap(
      docsDf(Seq(doc(1, "alpha"), doc(2, "beta"))), bench, "doc_id", "text", root)
      .release()
    val sd = new java.io.File(s"$root/curate_state")

    // crash residue: an orphan temp target (crash before the swap) and a
    // stray .old next to a live dir (crash after the forward rename)
    val tmp = new java.io.File(sd, "fingerprints.tmp-deadbeef")
    assert(tmp.mkdir() && new java.io.File(tmp, "part-junk.parquet").createNewFile())
    val old = new java.io.File(sd, "band_keys.old")
    assert(old.mkdir())
    // half-finished swap: live corpus moved aside, replacement missing —
    // the one case where .old IS the state and must be restored, not swept
    val corpus = new java.io.File(sd, "corpus")
    val corpusOld = new java.io.File(sd, "corpus.old")
    assert(corpus.renameTo(corpusOld))

    val removed = CurateIncremental.vacuumState(spark, root)
    assert(removed.exists(_.endsWith("fingerprints.tmp-deadbeef")) &&
      removed.exists(_.endsWith("band_keys.old")) && removed.size == 2,
      s"unexpected vacuum set: $removed")
    assert(corpus.isDirectory && !corpusOld.exists,
      "half-swapped corpus must be rolled forward, not deleted")

    // the vacuumed state is intact and still functions
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(10, "alpha"), doc(11, "omega"))), bench, "doc_id", "text", root)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(11L))
    r.release()
    // idempotent: a second sweep finds nothing
    assert(CurateIncremental.vacuumState(spark, root).isEmpty)
  }

  test("compactState rewrites a week of appends back to one file per bucket") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    CurateIncremental.bootstrap(
      docsDf(Seq(doc(1, "alpha"), doc(2, "beta"))), bench, "doc_id", "text", root,
      Curate.Config()).release()
    // three daily appends — each adds a file per bucket per table
    for (day <- 1 to 3) {
      val r = CurateIncremental.daily(
        docsDf(Seq(doc(100L + day, s"day$day"))), bench, "doc_id", "text", root)
      r.release()
    }
    val fpsDir = s"$root/curate_state/fingerprints"
    val bksDir = s"$root/curate_state/band_keys"
    val before = partFiles(fpsDir)
    assert(before > 4, s"expected >4 fingerprint files after 3 appends, got $before")

    val st0 = CurateIncremental.loadState(spark, root)
    val (nFps, nBks, nCorpus) =
      (st0.fingerprints.count(), st0.bandKeys.count(), st0.corpus.count())

    CurateIncremental.compactState(spark, root)

    // one file per bucket (4 test buckets; empty buckets write nothing)
    assert(partFiles(fpsDir) <= 4 && partFiles(fpsDir) < before,
      s"fingerprints not compacted: ${partFiles(fpsDir)} files")
    assert(partFiles(bksDir) <= 4, s"band_keys not compacted: ${partFiles(bksDir)} files")
    // no temp or .old residue from the swap
    val residue = new java.io.File(s"$root/curate_state").list()
      .filter(n => n.contains(".tmp-") || n.endsWith(".old"))
    assert(residue.isEmpty, s"swap residue left behind: ${residue.mkString(",")}")

    val st = CurateIncremental.loadState(spark, root)
    assert(st.fingerprints.count() == nFps && st.bandKeys.count() == nBks &&
      st.corpus.count() == nCorpus, "compaction changed row counts")

    // state still functions: re-crawls of pre- and post-compaction docs die
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(200, "alpha"), doc(201, "day2"), doc(202, "omega"))),
      bench, "doc_id", "text", root)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(202L))
    r.release()
  }

  test("autoCompact keeps a hands-off daily loop bounded in files per bucket") {
    val root = java.nio.file.Files.createTempDirectory("graft-autocompact-").toString
    CurateIncremental.bootstrap(
      docsDf(Seq(doc(1, "alpha"), doc(2, "beta"))), bench, "doc_id", "text", root,
      Curate.Config()).release()
    // threshold 2 with daily appends: day 1 lands 2 files/bucket (at the
    // threshold — no run), day 2 pushes past it and compacts back to 1,
    // day 3 lands 2 again: the loop never exceeds threshold+1 transiently
    // and settles at <= threshold, with zero manual compaction calls
    for (day <- 1 to 3)
      CurateIncremental.daily(
        docsDf(Seq(doc(100L + day, s"day$day"))), bench, "doc_id", "text", root,
        autoCompact = Some(2)).release()
    val fpb = CurateIncremental.stateFilesPerBucket(spark, root)
    assert(fpb > 0.0 && fpb <= 2.0,
      s"auto-compaction did not bound the state file count: $fpb files/bucket")
    // row identity: the compacted loop holds exactly the bootstrap + daily
    // survivors, once each, and the state still probes (re-crawls die)
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 101L, 102L, 103L))
    assert(st.fingerprints.select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 101L, 102L, 103L))
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(300, "alpha"), doc(301, "day2"), doc(302, "fresh"))),
      bench, "doc_id", "text", root, autoCompact = Some(2))
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(302L))
    r.release()
    // under the threshold nothing runs; the direct call reports it
    assert(!CurateIncremental.maybeCompactState(spark, root, 10))
  }

  test("compactState rewrites the embedding tables alongside the text tables") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-compemb-").toString
    CurateIncremental.bootstrap(
      docsDf(Seq(doc(1, "alpha"), doc(2, "beta"))), bench, "doc_id", "text", root,
      Curate.Config(), vecs = Some(embDf(Seq((1L, vec(1)), (2L, vec(2))))),
      ecfg = ecfg).release()
    for (day <- 1 to 3) {
      CurateIncremental.daily(
        docsDf(Seq(doc(100L + day, s"day$day"))), bench, "doc_id", "text", root,
        Curate.Config(),
        deltaVecs = Some(embDf(Seq((100L + day, vec(10L + day))))),
        ecfg = ecfg).release()
    }
    val srpDir = s"$root/curate_state/srp_buckets"
    val before = partFiles(srpDir)
    assert(before > 4, s"expected >4 srp files after 3 appends, got $before")
    val st0 = CurateIncremental.loadState(spark, root)
    val (nSrp, nEmb) = (st0.srpBuckets.get.count(), st0.embeddings.get.count())

    CurateIncremental.compactState(spark, root)

    assert(partFiles(srpDir) <= 4 && partFiles(srpDir) < before,
      s"srp_buckets not compacted: ${partFiles(srpDir)} files")
    val st = CurateIncremental.loadState(spark, root)
    assert(st.srpBuckets.get.count() == nSrp && st.embeddings.get.count() == nEmb,
      "compaction changed embedding row counts")

    // the compacted embedding state still probes: jitters of a bootstrap
    // vector and a day-2 appended vector both die, fresh content lands
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(200, "twohundred"), doc(201, "twohundredone"),
        doc(202, "omega"))), bench, "doc_id", "text", root, Curate.Config(),
      deltaVecs = Some(embDf(Seq((200L, jitter(vec(2))), (201L, jitter(vec(12)))
        , (202L, vec(5))))), ecfg = ecfg)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(202L))
    r.release()
  }

  test("removeFromState sweeps every table and the content becomes re-admittable") {
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-takedown-").toString
    val base = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"), doc(3, "gamma")))
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root,
      Curate.Config(), vecs = Some(embDf(Seq((1L, vec(1)), (2L, vec(2)),
        (3L, vec(3))))), ecfg = ecfg).release()

    // before the takedown: a re-crawl of doc 2 (new id, same text) and a
    // jitter of its vector both die at the probes
    val st0 = CurateIncremental.loadState(spark, root)
    val pre = CurateIncremental.curateDelta(
      docsDf(Seq(doc(20, "beta"))), bench, "doc_id", "text", st0)
    assert(pre.corpus.count() == 0, "identical content must dedup pre-removal")
    pre.release()

    val removed = CurateIncremental.removeFromState(
      Seq(2L).toDF("doc_id"), "doc_id", root)
    assert(removed == 1L, s"one corpus doc expected removed, got $removed")

    // every trace is gone from every table
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.filter(col("doc_id") === 2).count() == 0)
    assert(st.fingerprints.filter(col("id") === 2).count() == 0)
    assert(st.bandKeys.filter(col("id") === 2).count() == 0)
    assert(st.embeddings.get.filter(col("id") === 2).count() == 0)
    assert(st.srpBuckets.get.filter(col("id") === 2).count() == 0)
    assert(st.corpus.count() == 2, "other docs untouched")

    // the takedown semantics: the same content is now ADMITTABLE again —
    // the corpus no longer holds it, so nothing should block a fresh crawl
    val r = CurateIncremental.daily(
      docsDf(Seq(doc(21, "beta"))), bench, "doc_id", "text", root,
      Curate.Config(), deltaVecs = Some(embDf(Seq((21L, vec(2))))), ecfg = ecfg)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(21L),
      "removed content must be re-admittable after a completed takedown")
    r.release()
  }

  test("removeFromState crash after the corpus write: text gone, stale index over-drops, re-run heals") {
    val root = java.nio.file.Files.createTempDirectory("graft-takedown-crash-").toString
    val base = docsDf(Seq(doc(1, "alpha"), doc(2, "beta")))
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root).release()

    val boom = intercept[RuntimeException] {
      CurateIncremental.removeFromStateHooked(Seq(2L).toDF("doc_id"),
        "doc_id", root, () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")

    // the compliance direction: served text is GONE even though the crash
    // left the index rows behind
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.filter(col("doc_id") === 2).count() == 0,
      "corpus rewrite must be durable before the crash point")
    assert(st.fingerprints.filter(col("id") === 2).count() == 1,
      "index rows survive the crash (the safe, over-dropping direction)")

    // stale fingerprint over-drops a re-crawl — conservative, never serving
    val blocked = CurateIncremental.curateDelta(
      docsDf(Seq(doc(20, "beta"))), bench, "doc_id", "text", st)
    assert(blocked.corpus.count() == 0,
      "stale index must over-drop, not re-admit")
    blocked.release()

    // re-running the removal completes the sweep and heals admissibility
    CurateIncremental.removeFromState(Seq(2L).toDF("doc_id"), "doc_id", root)
    val st2 = CurateIncremental.loadState(spark, root)
    assert(st2.fingerprints.filter(col("id") === 2).count() == 0)
    val ok = CurateIncremental.curateDelta(
      docsDf(Seq(doc(21, "beta"))), bench, "doc_id", "text", st2)
    assert(ok.corpus.count() == 1, "completed takedown re-admits the content")
    ok.release()
  }

  test("blocklist + nfcCanonical opt-ins: incremental equals batch across a day") {
    import graft.ops.TextAnalysis
    val blockedSeed = doc(100, "blocked")._2
    val bl = Seq(blockedSeed).toDF("text")
      .select(TextAnalysis.fingerprint(
        TextAnalysis.redactPii(col("text"))).as("content_key"))
    val cfg = Curate.Config(nfcCanonical = true, blocklist = Some(bl))
    val root = java.nio.file.Files.createTempDirectory("graft-blnfc-").toString
    val composedSeed = doc(3, "café")._2 // composed é throughout
    val day0 = docsDf(Seq(doc(1, "alpha"), doc(2, "beta"),
      (3L, composedSeed), (100L, blockedSeed)))
    val b = CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root, cfg)
    assert(b.corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "blocked content must drop at bootstrap")
    b.release()

    // day 1: 10 is fresh; 11 re-crawls the BLOCKED content under a new
    // id (the takedown must hold); 12 is a decomposed re-encode of
    // day-0 survivor 3 — only NFC makes its fingerprint match the state
    val day1 = docsDf(Seq(doc(10, "delta"), (11L, blockedSeed),
      (12L, composedSeed.replace("é", "é"))))
    val d1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root, cfg)
    assert(d1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L),
      "blocked re-crawl and decomposed re-encode must both drop")
    d1.release()

    // parity: state after the daily == one full batch curate of the union
    val full = Curate.curate(day0.unionByName(day1), bench, "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val got = CurateIncremental.loadState(spark, root)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"incremental ($got) != batch ($want)")
    full.release()
  }

  test("dsir selection in the recipe: bootstrap -> daily equals batch over the union, profiles from persisted counter state") {
    import graft.ops.{Sampling, Sketches}
    // two disjoint vocabularies: A-docs are target-like, B-docs raw-like
    def aDoc(id: Long, salt: String): (Long, String) =
      (id, s"alpha beta gamma delta epsilon alpha beta gamma $salt")
    def bDoc(id: Long, salt: String): (Long, String) =
      (id, s"zeta eta theta iota kappa zeta eta theta $salt")
    val root = java.nio.file.Files.createTempDirectory("graft-dsirrec-").toString
    // persisted corpus-lifetime profiles: target folded in two ledgered
    // deltas (one replayed \u2014 exactly-once no-op), raw in one
    Sampling.dsirProfileUpdateState(spark, s"$root/t",
      docsDf(Seq(aDoc(900, "p1"), aDoc(901, "p2"))), "text", "d1")
    Sampling.dsirProfileUpdateState(spark, s"$root/t",
      docsDf(Seq(aDoc(902, "p3"))), "text", "d2")
    Sampling.dsirProfileUpdateState(spark, s"$root/t",
      docsDf(Seq(aDoc(902, "p3"))), "text", "d2") // ledger no-op
    Sampling.dsirProfileUpdateState(spark, s"$root/r",
      docsDf(Seq(aDoc(910, "p4"), bDoc(911, "p5"), bDoc(912, "p6"),
        bDoc(913, "p7"))), "text", "d1")
    // near-dup off (the A/B docs share most shingles BY DESIGN — the
    // dsir stage, not LSH, must be what separates them) and quality
    // floor open: the test isolates the selection stage
    def cfg = Curate.Config(nearDupThreshold = 2.0, qualityFloor = 0.0,
      dsir = Some(Curate.Dsir(Sketches.readState(spark, s"$root/t"),
        Sketches.readState(spark, s"$root/r"))))

    val day0 = docsDf(Seq(aDoc(1, "x1"), aDoc(2, "x2"), bDoc(3, "x3")))
    val b = CurateIncremental.bootstrap(day0, bench, "doc_id", "text",
      s"$root/state", cfg)
    assert(b.corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "bootstrap must dsir-select: A-docs kept, B-doc dropped")
    b.release()

    // day 1: a fresh A-doc, a fresh B-doc (dsir-dropped), and a re-crawl
    // of day-0 survivor 1 (exact_dup at the state probe) \u2014 the audit
    // must label each, and dsir selection must score ONLY the delta
    val day1 = docsDf(Seq(aDoc(10, "y1"), bDoc(11, "y2"),
      (12L, day0.filter(col("doc_id") === 1).select("text").as[String].head())))
    val d1 = CurateIncremental.daily(day1, bench, "doc_id", "text",
      s"$root/state", cfg.copy(audit = true))
    assert(d1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L))
    val labels = d1.audit.get.select("doc_id", "stage").as[(Long, String)]
      .collect().toMap
    assert(labels == Map(10L -> "survived", 11L -> "dsir_dropped",
      12L -> "exact_dup"), s"audit labels wrong: $labels")
    d1.release()

    // parity: state after the daily == one full batch curate of the
    // union with the SAME cfg (fixed profiles -> per-doc deterministic)
    val full = Curate.curate(day0.unionByName(day1), bench,
      "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val got = CurateIncremental.loadState(spark, s"$root/state")
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"incremental ($got) != batch ($want)")
    full.release()

    // resample mode: margin-positive docs carry log-weight > 0 (capped
    // to keep-probability 1), so every A-doc survives resampling too;
    // the rule is per-doc deterministic, so curating survivors again
    // changes nothing (fixpoint)
    val rcfg = cfg.copy(dsir = cfg.dsir.map(_.copy(resample = true)))
    val r1 = Curate.curate(day0, bench, "doc_id", "text", rcfg)
    val kept1 = r1.corpus.select("doc_id").as[Long].collect().toSet
    assert(kept1.contains(1L) && kept1.contains(2L),
      s"resample must keep margin-positive docs: $kept1")
    val r2 = Curate.curate(r1.corpus.select("doc_id", "text"), bench,
      "doc_id", "text", rcfg)
    assert(r2.corpus.select("doc_id").as[Long].collect().toSet == kept1,
      "dsir resample must be a fixpoint under fixed profiles")
    r1.release(); r2.release()
  }

  test("exact-join state: pairs(state) \u222a probe(delta) == full recompute of the union") {
    import graft.ops.{Dedup, ExactJoinState}
    val root = java.nio.file.Files.createTempDirectory("graft-xjs-").toString
    // token-set families straddling the state/delta split: (1,2) inside
    // the state, (2,11) and (11,13) across it, (11,15) inside the delta,
    // plus boilerplate-heavy non-pairs
    def row(id: Long, toks: Seq[String]) = (id, toks)
    val all = Seq(
      row(2L,  Seq("a", "b", "c", "d")),
      row(4L,  Seq("a", "b", "c", "e")),          // J(2,4)=3/5 state pair
      row(6L,  Seq("x", "y", "z")),
      row(8L,  Seq("p", "q", "r", "s", "t")),
      row(11L, Seq("a", "b", "c", "d", "f")),     // J(2,11)=4/5 cross pair
      row(13L, Seq("a", "b", "c", "d", "f", "g")),// J(11,13)=5/6 delta pair
      row(15L, Seq("x", "y", "z", "w")),          // J(6,15)=3/4 cross pair
      row(17L, Seq("m", "n"))
    ).toDF("doc_id", "toks")
    val state = all.filter(col("doc_id") % 2 === 0)
    val delta = all.filter(col("doc_id") % 2 === 1)
    ExactJoinState.build(state, "doc_id", col("toks"), 1L, 2L, root, buckets = 4)

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "overlap", "n_a", "n_b")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val full = norm(Dedup.exactJaccardPairs(all, "doc_id", col("toks"), 1L, 2L))
    val statePairs = norm(Dedup.exactJaccardPairs(state, "doc_id", col("toks"), 1L, 2L))
    val probed = norm(ExactJoinState.probe(delta, "doc_id", col("toks"), root))
    assert((statePairs ++ probed).sorted == full,
      s"state ($statePairs) \u222a probe ($probed) != full ($full)")
    // the probe must include cross pairs in BOTH directions of rarity
    // drift and the delta-internal pair
    assert(probed.map(p => (p._1, p._2)).toSet ==
      full.map(p => (p._1, p._2)).toSet -- statePairs.map(p => (p._1, p._2)))

    // day 2: append the delta, probe a second delta; equality holds over
    // the grown union (state \u222a delta now persisted)
    ExactJoinState.append(delta, "doc_id", col("toks"), root)
    val delta2 = Seq(
      row(21L, Seq("a", "b", "c", "d", "f", "h")), // pairs with 13 (J=5/7? no: overlap 5, union 7) and 11
      row(23L, Seq("p", "q", "r", "s", "t", "u"))  // J(8,23)=5/6 cross to ORIGINAL state
    ).toDF("doc_id", "toks")
    val all2 = all.unionByName(delta2)
    val full2 = norm(Dedup.exactJaccardPairs(all2, "doc_id", col("toks"), 1L, 2L))
    val probed2 = norm(ExactJoinState.probe(delta2, "doc_id", col("toks"), root))
    assert((full ++ probed2).sorted == full2,
      s"after append: union pairs ($full) \u222a probe2 ($probed2) != full2 ($full2)")

    // append is idempotent: re-appending the same delta is a no-op
    ExactJoinState.append(delta, "doc_id", col("toks"), root)
    val probed2b = norm(ExactJoinState.probe(delta2, "doc_id", col("toks"), root))
    assert(probed2b == probed2, "re-append double-counted token rows")

    // crash between the token and prefix writes: the pending marker
    // routes the re-run through the repair path (re-prefix the WHOLE
    // delta); later probes find the crashed doc and overlaps count ONCE
    val delta3 = Seq(row(31L, Seq("p", "q", "r", "s", "t", "v")))
      .toDF("doc_id", "toks") // J(8,31)=5/6
    val boom = intercept[RuntimeException] {
      ExactJoinState.appendHooked(delta3, "doc_id", col("toks"), root,
        () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    ExactJoinState.append(delta3, "doc_id", col("toks"), root) // repair re-run
    val delta4 = Seq((33L, Seq("p", "q", "r", "s", "t", "v", "w")))
      .toDF("doc_id", "toks") // J(31,33)=6/7, J(8,33)=5/7 (23 was never appended)
    val probed4 = norm(ExactJoinState.probe(delta4, "doc_id", col("toks"), root))
    assert(probed4.map(p => (p._1, p._2)).toSet ==
      Set((8L, 33L), (31L, 33L)),
      s"crash-repaired doc 31 must be probe-discoverable: $probed4")
    assert(probed4.forall(p => p._3 <= math.min(p._4, p._5)),
      s"an overlap above min(n_a, n_b) means duplicated token rows: $probed4")

    // a marker left over AFTER a fully-landed append (crash before the
    // marker delete) makes the next repair land DUPLICATE prefix rows —
    // harmless to the probe by construction, and compact() folds them
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$root/exact_state/_append_pending"), true).close()
    ExactJoinState.append(delta3, "doc_id", col("toks"), root)
    val prefDir = s"$root/exact_state/prefix"
    val withDups = spark.read.parquet(prefDir).count()
    val distinctRows = spark.read.parquet(prefDir).distinct().count()
    assert(withDups > distinctRows, "repair should have landed duplicate prefixes")
    assert(norm(ExactJoinState.probe(delta4, "doc_id", col("toks"), root)) == probed4,
      "duplicate prefix rows changed the probe result")
    ExactJoinState.compact(spark, root)
    assert(spark.read.parquet(prefDir).count() == distinctRows,
      "compact must fold the repair duplicates")
    assert(norm(ExactJoinState.probe(delta4, "doc_id", col("toks"), root)) == probed4)
  }

  test("exact-join remove: marker survives a mid-sweep crash, the next load finishes the purge") {
    import graft.ops.ExactJoinState
    val root = java.nio.file.Files.createTempDirectory("graft-xjr-").toString
    val state = Seq(
      (2L, Seq("a", "b", "c", "d")),
      (4L, Seq("a", "b", "c", "e")),
      (6L, Seq("x", "y", "z"))
    ).toDF("doc_id", "toks")
    ExactJoinState.build(state, "doc_id", col("toks"), 1L, 2L, root, buckets = 4)
    // crash between the prefix sweep and the token sweep: without the
    // marker the taken-down doc's content-bearing token rows would stay
    // resident forever (ADVICE r14)
    val boom = intercept[RuntimeException] {
      ExactJoinState.removeHooked(Seq(4L).toDF("__del_id"), root,
        () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    assert(new java.io.File(s"$root/exact_state/_remove_pending").exists(),
      "the pending-removal marker must survive the crash")
    assert(spark.read.parquet(s"$root/exact_state/tokens")
      .filter(col("id") === 4L).count() > 0,
      "precondition: the crash left doc 4's token rows resident")
    // ANY later load (here: a probe) finishes the removal
    val probe = Seq((11L, Seq("a", "b", "c", "e")))
      .toDF("doc_id", "toks") // exact copy of purged doc 4
    val pairs = ExactJoinState.probe(probe, "doc_id", col("toks"), root)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"purged doc 4 must not pair: $pairs")
    assert(pairs.contains((2L, 11L)), s"unrelated docs must keep pairing: $pairs")
    assert(spark.read.parquet(s"$root/exact_state/tokens")
      .filter(col("id") === 4L).count() == 0,
      "the repair must purge the token rows")
    assert(!new java.io.File(s"$root/exact_state/_remove_pending").exists(),
      "the marker must clear once both sweeps complete")
  }

  test("entity resolution in incremental curation: bootstrap -> daily x2 equals full entity-stage curate of the union") {
    import org.apache.spark.sql.Column
    // word 3-shingles — the q135 matcher's tokenization as a Column fn
    val sh3: Column => Column = t => {
      val ws = split(trim(t), "\\s+")
      val len = greatest(size(ws) - 2, lit(0))
      zip_with(zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b)), slice(ws, lit(3), len),
        (ab, c) => concat(ab, lit(" "), c))
    }
    // near-dup OFF (threshold 2.0) so alias variants reach the entity
    // stage instead of dying at LSH; threshold 2/3 matches q135's
    val cfg = Curate.Config(nearDupThreshold = 2.0,
      entityExact = Some(Curate.EntityExact(sh3, 2L, 3L)))
    val root = java.nio.file.Files.createTempDirectory("graft-xent-").toString
    def alias(of: (Long, String), id: Long): (Long, String) =
      (id, of._2 + " alias suffix marker")

    val d2 = doc(2, "alpha"); val d4 = doc(4, "beta"); val d10 = doc(10, "delta")
    val day0 = docsDf(Seq(d2, d4, doc(6, "gamma"), alias(d2, 8)))
    val b = CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root, cfg)
    assert(b.corpus.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 6L),
      "within-bootstrap alias must drop at the batch entity stage")
    b.release()

    // day 1: 14 aliases day-0 SURVIVOR 4 (state<->delta pair found only
    // through the persisted prefix index), 16 aliases fresh doc 10
    // (delta<->delta pair) — both must drop, 10 survives as its
    // cluster's minimum
    val day1 = docsDf(Seq(d10, alias(d4, 14), alias(d10, 16)))
    val r1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root, cfg)
    assert(r1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L),
      "state<->delta and delta<->delta entity aliases must both drop")
    r1.release()

    // day 2 probes the APPENDED index: an alias of day-1 survivor 10
    // must drop through state extended by day 1's appendState
    val day2 = docsDf(Seq(doc(22, "epsilon"), alias(d10, 24)))
    val r2 = CurateIncremental.daily(day2, bench, "doc_id", "text", root, cfg)
    assert(r2.corpus.select("doc_id").as[Long].collect().toSet == Set(22L),
      "day-2 alias of a day-1 survivor must drop via the appended index")
    r2.release()

    // the property: persisted state corpus == ONE full entity-stage
    // curate over the union of all three days
    val full = Curate.curate(day0.unionByName(day1).unionByName(day2),
      bench, "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val got = CurateIncremental.loadState(spark, root)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"incremental ($got) != batch ($want)")
    full.release()

    // sync guard: a daily that omits entityExact against this state must
    // refuse rather than silently let the index go stale
    val ex = intercept[IllegalArgumentException] {
      CurateIncremental.daily(docsDf(Seq(doc(30, "zeta"))), bench,
        "doc_id", "text", root, Curate.Config(nearDupThreshold = 2.0))
    }
    assert(ex.getMessage.contains("exact-join entity index"))
    // and a generic entityMatcher still refuses, pointing at entityExact
    val ex2 = intercept[IllegalArgumentException] {
      CurateIncremental.daily(docsDf(Seq(doc(31, "eta"))), bench,
        "doc_id", "text", root, cfg.copy(entityExact = None,
          entityMatcher = Some((df, ic, tc) =>
            graft.ops.Dedup.exactJaccardPairs(df, ic, sh3(col(tc)), 2L, 3L))))
    }
    assert(ex2.getMessage.contains("entityExact"))
  }

  test("fuzzy entity resolution in incremental curation: bootstrap -> daily x2 equals full entity-stage curate of the union") {
    // edit-distance aliases: one substituted character (dist 1) — below
    // exact-Jaccard's reach for 3-shingles but exactly EntityFuzzy's
    val cfg = Curate.Config(nearDupThreshold = 2.0,
      entityFuzzy = Some(Curate.EntityFuzzy(maxDist = 1)))
    val root = java.nio.file.Files.createTempDirectory("graft-fzent-").toString
    def alias(of: (Long, String), id: Long): (Long, String) =
      (id, of._2.replaceFirst("tok0 ", "tok8 "))

    val d2 = doc(2, "alpha"); val d4 = doc(4, "beta"); val d10 = doc(10, "delta")
    val day0 = docsDf(Seq(d2, d4, doc(6, "gamma"), alias(d2, 8)))
    val b = CurateIncremental.bootstrap(day0, bench, "doc_id", "text", root, cfg)
    assert(b.corpus.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 6L),
      "within-bootstrap fuzzy alias must drop at the batch entity stage")
    b.release()

    // day 1: 14 is within dist 1 of day-0 SURVIVOR 4 (state<->delta pair
    // found only through the persisted gram index), 16 of fresh doc 10
    // (delta<->delta) — both drop, 10 survives as its cluster's minimum
    val day1 = docsDf(Seq(d10, alias(d4, 14), alias(d10, 16)))
    val r1 = CurateIncremental.daily(day1, bench, "doc_id", "text", root, cfg)
    assert(r1.corpus.select("doc_id").as[Long].collect().toSet == Set(10L),
      "state<->delta and delta<->delta fuzzy aliases must both drop")
    r1.release()

    // day 2 probes the APPENDED index: an alias of day-1 survivor 10
    // must drop through state extended by day 1's appendState
    val day2 = docsDf(Seq(doc(22, "epsilon"), alias(d10, 24)))
    val r2 = CurateIncremental.daily(day2, bench, "doc_id", "text", root, cfg)
    assert(r2.corpus.select("doc_id").as[Long].collect().toSet == Set(22L),
      "day-2 fuzzy alias of a day-1 survivor must drop via the appended index")
    r2.release()

    // the property: persisted state corpus == ONE full entity-stage
    // curate over the union of all three days
    val full = Curate.curate(day0.unionByName(day1).unionByName(day2),
      bench, "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val got = CurateIncremental.loadState(spark, root)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"incremental ($got) != batch ($want)")
    full.release()

    // sync guard: a daily that omits entityFuzzy against this state must
    // refuse rather than silently let the index go stale
    val ex = intercept[IllegalArgumentException] {
      CurateIncremental.daily(docsDf(Seq(doc(30, "zeta"))), bench,
        "doc_id", "text", root, Curate.Config(nearDupThreshold = 2.0))
    }
    assert(ex.getMessage.contains("fuzzy-join entity index"))
    // takedown sweeps the fuzzy index too: purge survivor 4, then a
    // fresh alias of it re-admits (the content is genuinely gone)
    CurateIncremental.removeFromState(Seq(4L).toDF("doc_id"), "doc_id", root)
    val r3 = CurateIncremental.daily(docsDf(Seq(alias(d4, 34))), bench,
      "doc_id", "text", root, cfg)
    assert(r3.corpus.select("doc_id").as[Long].collect().toSet == Set(34L),
      "after takedown of 4, its alias must re-admit — the fuzzy index was swept")
    r3.release()
  }

  test("curateDelta refuses every corpus-dependent stage instead of running it delta-only") {
    val root = java.nio.file.Files.createTempDirectory("graft-refuse-").toString
    CurateIncremental.bootstrap(docsDf(Seq(doc(1, "alpha"))), bench,
      "doc_id", "text", root).release()
    val st = CurateIncremental.loadState(spark, root)
    val delta = docsDf(Seq(doc(10, "beta")))
    def refuse(cfg: Curate.Config, needle: String): Unit = {
      val ex = intercept[IllegalArgumentException] {
        CurateIncremental.curateDelta(delta, bench, "doc_id", "text", st, cfg)
      }
      assert(ex.getMessage.contains(needle), ex.getMessage)
    }
    refuse(Curate.Config(boilerplateMaxDocs = Some(10L)), "corpus-global")
    refuse(Curate.Config(qualityQuantile = Some(("doc_id", 0.5))), "corpus-relative")
    refuse(Curate.Config(bigramLmFloor = Some((2L, 0.5))), "corpus-LM")
    refuse(Curate.Config(temperatureBalanceCol = Some("src")), "CORPUS counts")
  }

  test("takedown and refresh keep the exact-join entity index in sync") {
    import org.apache.spark.sql.Column
    val sh3: Column => Column = t => {
      val ws = split(trim(t), "\\s+")
      val len = greatest(size(ws) - 2, lit(0))
      zip_with(zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
        (a, b) => concat(a, lit(" "), b)), slice(ws, lit(3), len),
        (ab, c) => concat(ab, lit(" "), c))
    }
    val cfg = Curate.Config(nearDupThreshold = 2.0,
      entityExact = Some(Curate.EntityExact(sh3, 2L, 3L)))
    val root = java.nio.file.Files.createTempDirectory("graft-xtkd-").toString
    val d2 = doc(2, "alpha")
    CurateIncremental.bootstrap(
      docsDf(Seq(d2, doc(4, "beta"))), bench, "doc_id", "text", root, cfg).release()

    // take down doc 2: its token/prefix rows must leave the index, so a
    // re-crawl of (an alias of) its content is re-admittable
    val removed = CurateIncremental.removeFromState(
      Seq(2L).toDF("doc_id"), "doc_id", root)
    assert(removed == 1L)
    val recrawl = docsDf(Seq((50L, d2._2 + " alias suffix marker")))
    val r = CurateIncremental.daily(recrawl, bench, "doc_id", "text", root, cfg)
    assert(r.corpus.select("doc_id").as[Long].collect().toSet == Set(50L),
      "after takedown the content's alias must probe clean and re-admit")
    r.release()

    // refresh rebuilds the index from the union; an alias of a refreshed
    // survivor then drops on the next daily
    CurateIncremental.refresh(
      docsDf(Seq(doc(60, "gamma"))), bench, "doc_id", "text", root, cfg).release()
    val day = docsDf(Seq((70L, doc(60, "gamma")._2 + " alias suffix marker")))
    val r2 = CurateIncremental.daily(day, bench, "doc_id", "text", root, cfg)
    assert(r2.corpus.isEmpty, "alias of a refreshed survivor must drop")
    r2.release()
  }
}

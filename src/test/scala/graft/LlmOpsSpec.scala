package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Packing, Similarity, TextAnalysis}

/** Unit tests for the LLM-data operators whose scale paths are not
  * DuckDB-expressible (64-bit SimHash, SRP-bucketed ANN, media stubs) —
  * the oracle-checked counterparts live in queries/LlmQueries. */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/langId/quality: empty-safe tokenization, stopword argmax") {
    val df = Seq(
      (1, "the cat sat on the mat and the dog is here too now ok yes the end of it all the more the better the a of and is"),
      (2, "le chat est sur le tapis et la porte est ouverte"),
      (3, ""),
      (4, "zzz qqq www")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("lang")).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out(1)._2 == "en")
    assert(out(2)._2 == "fr")
    assert(out(3) == (0, "und"))
    assert(out(4)._2 == "und")
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(col("t2"))).as("fp_eq"),
      (TextAnalysis.rollingHash(col("t1")) === TextAnalysis.rollingHash(col("t2"))).as("rh_eq"),
      (TextAnalysis.fingerprint(col("t1")) === TextAnalysis.fingerprint(lower(lit("A  b   c")))).as("fp_norm")
    ).head()
    assert(!r.getBoolean(0)) // different bags? no — same bag, different order: md5 of joined differs
    assert(!r.getBoolean(1))
    assert(r.getBoolean(2)) // case/whitespace-insensitive
  }

  test("simhash64: identical docs collide, near docs are close, far docs are far") {
    val base = "spark catalyst optimizer plans the query into stages and tasks for executors"
    val near = base + " quickly" // one extra token
    val far = "completely different words about cooking pasta with tomato sauce tonight"
    val df = Seq((1, base), (2, base), (3, near), (4, far)).toDF("id", "text")
    val h = df.select(col("id"),
        Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("sh")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1) == h(2))
    assert(ham(h(1), h(3)) < 16, s"near doc hamming ${ham(h(1), h(3))}")
    assert(ham(h(1), h(4)) > ham(h(1), h(3)))
    // column-level hamming agrees with the JVM computation
    val hd = df.filter(col("id").isin(1, 4))
      .agg(collect_list(Dedup.simhash64(TextAnalysis.tokens(col("text"))))).head()
      .getSeq[Long](0)
    val viaCol = Seq((hd(0), hd(1))).toDF("a", "b")
      .select(Dedup.hamming64(col("a"), col("b")).cast("int")).head().getInt(0)
    assert(viaCol == ham(hd(0), hd(1)))
  }

  test("nearDupPairs finds planted truncation near-dups, never all-pairs") {
    val docs = (0 until 40).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * 13) % 97}")
      (i.toLong, words.mkString(" "))
    }
    val planted = docs.take(5).map { case (id, t) =>
      (id + 1000L, t.split(" ").dropRight(3).mkString(" "))
    }
    val df = (docs ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, i + 1000L)),
      s"planted pair $i missing from $pairs")
  }

  test("entityIds: chains collapse to the min member, singletons keep their id") {
    val rows = Seq(10L -> "x", 11L -> "x", 12L -> "x", 20L -> "y", 30L -> "z")
      .toDF("doc_id", "payload")
    // chain 12~11~10 (no 12~10 edge) plus untouched 20, 30
    val pairs = Seq((11L, 12L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.entityIds(rows, "doc_id", pairs)
      .select("doc_id", "entity_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (30L, 30L)))
  }

  test("exactJaccardPairs equals brute-force Jaccard, prefix filter lossless") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),        // vs 2: o=3, union 5, J=0.6
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("a", "b", "c", "d"),        // identical to 1: J=1
      4L -> Seq("x", "y", "z"),             // disjoint family
      5L -> Seq("x", "y", "z", "w", "v"),   // vs 4: o=3, union 5, J=0.6
      6L -> Seq("a", "q"),                  // shares boilerplate 'a' only
      7L -> Seq[String]()                   // empty: drops
    ).toDF("doc_id", "toks")
    def got(tn: Long, td: Long) =
      Dedup.exactJaccardPairs(docs, "doc_id", col("toks"), tn, td)
        .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    // brute force over the same sets
    def brute(tn: Long, td: Long) = {
      val sets = Map(1L -> Set("a","b","c","d"), 2L -> Set("a","b","c","e"),
        3L -> Set("a","b","c","d"), 4L -> Set("x","y","z"),
        5L -> Set("x","y","z","w","v"), 6L -> Set("a","q"))
      (for {
        a <- sets.keys; b <- sets.keys if a < b
        o = (sets(a) intersect sets(b)).size
        if o.toLong * td >= (sets(a).size + sets(b).size - o).toLong * tn
      } yield (a, b)).toSeq.sorted
    }
    for ((tn, td) <- Seq((1L, 2L), (3L, 5L), (1L, 1L)))
      assert(got(tn, td) == brute(tn, td), s"mismatch at t=$tn/$td")
    // overlap/size columns are exact
    val row = Dedup.exactJaccardPairs(docs, "doc_id", col("toks"), 1L, 2L)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("overlap", "n_a", "n_b").as[(Long, Long, Long)].collect()
    assert(row.toSeq == Seq((3L, 4L, 4L)))
  }

  test("exactDedup + survivors collapse verbatim copies") {
    val df = Seq((1L, "a b c"), (2L, "x y z"), (3L, "a b c"), (4L, "a  b  c "))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDedup(df, "text", "doc_id")
      .select("keeper", "nb_copies").as[(Long, Long)].collect().toMap
    assert(groups(1L) == 3L) // 1,3 verbatim + 4 whitespace-variant
    assert(groups(2L) == 1L)
    // survivors: keep the smallest id of each near-dup pair cluster
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.survivors(df, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    // dedupCorpus: the downstream-facing form — full rows, one per group
    val corpus = Dedup.dedupCorpus(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(corpus == Set(1L, 2L))
  }

  test("survivorsTransitive collapses chains and multi-minima components") {
    val df = Seq(1L, 2L, 3L, 10L, 11L, 20L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    // single-hop keeps 2 (its only neighbor, 3, is larger) — the defect
    val single = Dedup.survivors(df, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(single == Set(1L, 2L, 10L, 20L))
    // transitive: component {1,2,3} folds to its minimum
    val trans = Dedup.survivorsTransitive(df, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(trans == Set(1L, 10L, 20L))
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a 13-node chain converges to one survivor (exercises path halving)
    val chain = (0 until 12).map(i => (100L + i, 101L + i)).toDF("id_a", "id_b")
    val df2 = (100L to 112L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    assert(Dedup.survivorsTransitive(df2, chain, "doc_id")
      .select("doc_id").as[Long].collect().toSet == Set(100L))
  }

  test("survivorsTransitiveByPriority keeps the best row per cluster, not the min id") {
    // cluster {1,2,3} via chain; priorities make 2 the representative;
    // cluster {10,11} ties on priority → id fallback keeps 10; loner 20
    // passes through untouched
    val df = Seq((1L, "t1", 5), (2L, "t2", 1), (3L, "t3", 3),
      (10L, "t10", 7), (11L, "t11", 7), (20L, "t20", 9))
      .toDF("doc_id", "text", "prio")
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.survivorsTransitiveByPriority(df, pairs, "doc_id", col("prio"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 20L), kept.toString)
    // with equal priorities everywhere it degrades to exactly
    // survivorsTransitive's min-id policy
    val minId = Dedup.survivorsTransitiveByPriority(df, pairs, "doc_id", lit(0))
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 10L, 20L), minId.toString)
    // partition-stability of the representative choice
    val again = Dedup.survivorsTransitiveByPriority(
      df.repartition(7), pairs.repartition(3), "doc_id", col("prio"))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("annTopKQuantized: bucketed integer-exact top-k, probed dim ≠ 64") {
    // dim-8 corpus (dim probed from data, not hardcoded); planted scaled
    // copies are parallel to their source → identical SRP signs (same
    // bucket every seed) and a strictly dominant inner product → rank 1
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }
    val planted = base.take(5).map { case (id, v) => (id + 100L, v.map(_ * 10f)) }
    val corpus = (base ++ planted).toDF("c_id", "c_vec")
    val queries = corpus.filter(col("c_id") < 5)
      .select(col("c_id").as("q_id"), col("c_vec").as("q_vec"))
    val out = Similarity.annTopKQuantized(queries, corpus, k = 3, nPlanes = 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    for (i <- 0L until 5L)
      assert(out.contains((i, i + 100L, 1)),
        s"scaled copy of $i not rank-1: ${out.filter(_._1 == i)}")
  }

  test("approx_count_distinct tracks exact distinct within rsd tolerance") {
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val r = words.agg(
      countDistinct(col("w")).as("exact"),
      approx_count_distinct(col("w"), 0.05).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("annTopK: SRP-bucketed search recalls most of brute-force top-k") {
    val e = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val exact = Similarity.cosineTopK(queries, corpus, 10)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    // 3-bit buckets × 5 probe tables: for moderately-similar neighbors
    // (bit-agreement ~0.6) expected recall ≈ 1-(1-0.6³)⁵ ≈ 0.7. More bits
    // → cheaper buckets, lower recall; that dial is the point of the op.
    val approx = Similarity.annTopK(queries, corpus, 10,
        nPlanes = 16, prefixBits = 3, seeds = Seq(42L, 1042L, 7L, 99L, 5L))
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall too low (${exact.size} exact, ${approx.size} approx)")
  }

  test("bpeishTokenCount: letter runs, digit runs, single punct marks") {
    val df = Seq(
      ("ab,12 cd.", 5),   // ab , 12 cd .
      ("hello world", 2),
      ("a1b2", 4),
      ("", 0)
    ).toDF("text", "want")
    val bad = df.filter(
      graft.ops.TextAnalysis.bpeishTokenCount(col("text")) =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("ivfTopK: probed-cell search recalls most of brute-force top-k") {
    val e = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val exact = Similarity.cosineTopK(queries, corpus, 10)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, corpus, 10, nCentroids = 8, nProbes = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("kmeansCentroids: trained cells recover planted clusters; trained IVF beats 1-probe random") {
    import spark.implicits._
    // 3 planted clusters around orthogonal axes in dim 4, 40 points each,
    // small deterministic jitter on the off-axis components
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(4)(0.05 * (((c * 40 + i) * 7 % 5) - 2))
      v(c) = 1.0
      (c * 40 + i).toLong -> v.toSeq
    }
    val df = pts.toDF("id", "v")
    val trained = Similarity.kmeansCentroids(df, "v", k = 3, iters = 4, dim = 4)
    assert(trained.length == 3)
    // every planted cluster direction is some trained centroid's direction
    for (axis <- 0 until 3) {
      val best = trained.map { ctr =>
        ctr(axis) / math.sqrt(ctr.map(x => x * x).sum)
      }.max
      assert(best > 0.95, s"axis $axis best centroid cosine $best")
    }
    // with trained centroids, ONE probe suffices: each query's true
    // top-k lives in its own cluster's cell
    val queries = df.filter(col("id") % 20 === 0)
      .select(col("id").as("q_id"), col("v").as("q_vec"))
    val corpus = df.select(col("id").as("c_id"), col("v").as("c_vec"))
    val exact = Similarity.cosineTopK(queries, corpus, 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, corpus, 5, nProbes = 1,
        dim = 4, trained = trained)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert((exact & ivf).size == exact.size,
      s"trained 1-probe IVF missed ${exact.size - (exact & ivf).size} of ${exact.size}")
    // the deterministic quantized flavor takes the same trained set
    // (components rounded onto the vector fixed-point grid) with the
    // same 1-probe exactness
    val ivfQ = Similarity.ivfTopKQuantized(queries, corpus, 5, nProbes = 1,
        dim = 4, trained = trained)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert((exact & ivfQ).size == exact.size,
      s"trained 1-probe quantized IVF missed ${exact.size - (exact & ivfQ).size}")
    // stability: a different partitioning converges to the same centroids
    // (avg() combine order shifts the low FP bits, so compare with tolerance)
    val again = Similarity.kmeansCentroids(df.repartition(7), "v", k = 3,
      iters = 4, dim = 4)
    val maxDiff = trained.zip(again)
      .flatMap { case (a, b) => a.zip(b).map { case (x, y) => math.abs(x - y) } }.max
    assert(maxDiff < 1e-9, s"centroids drifted by $maxDiff across partitionings")
    // zero-norm vectors (failed embeds) are excluded — they never become
    // seeds and never poison a cell
    val withZeros = df.union(Seq((900L, Seq(0.0, 0.0, 0.0, 0.0)),
      (901L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v"))
    val t2 = Similarity.kmeansCentroids(withZeros, "v", k = 3, iters = 4, dim = 4)
    assert(t2.length == 3 && t2.forall(c => c.map(x => x * x).sum > 0.5))
    // fewer distinct directions than k → SHORTER list, not padded duplicates
    val two = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "v")
    val t3 = Similarity.kmeansCentroids(two, "v", k = 8, iters = 2, dim = 2)
    assert(t3.length == 2, s"expected 2 distinct centroids, got ${t3.length}")
  }

  test("k-means|| init: O(log k) scans, not k — job count bounded and k-independent") {
    import spark.implicits._
    // 2000 distinct vectors so oversampling always delivers ≥ k candidates
    // and the farthest-point rescue path never fires
    val pts = (0 until 2000).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 37 + j * 101)).toSeq)
    }
    val df = pts.toDF("id", "v")
    df.count() // absorb source materialization outside the window
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val ctrs = Similarity.kmeansCentroids(df, "v", k = 32, iters = 1, dim = 8)
      Thread.sleep(1000) // drain the async listener bus
      assert(ctrs.length == 32)
      // init actions = 1 seed + ⌈log₂32⌉ rounds × (φ + draw) + 1 weighting
      // = 12, each 1–3 AQE jobs ⇒ ~22–26 jobs including one Lloyd round.
      // The r4–r6 farthest-point init alone was k+1 = 33 sequential scan
      // ACTIONS (≥ 33 jobs) before Lloyd ever started — sub-k is the claim
      assert(jobs < 32, s"k-means|| launched $jobs jobs; farthest-point needed ≥ 33")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("IndexStore round-trip: loaded centroids/codebooks are identical and give identical top-k") {
    import spark.implicits._
    val pts = for { c <- 0 until 3; i <- 0 until 40 } yield {
      val v = Array.fill(4)(0.05 * (((c * 40 + i) * 7 % 5) - 2))
      v(c) = 1.0
      (c * 40 + i).toLong -> v.toSeq
    }
    val df = pts.toDF("id", "v")
    val trained = Similarity.kmeansCentroids(df, "v", k = 3, iters = 4, dim = 4)
    val root = java.nio.file.Files.createTempDirectory("graft-idx-").toString
    graft.ops.IndexStore.saveCentroids(spark, trained, s"$root/centroids")
    val loaded = graft.ops.IndexStore.loadCentroids(spark, s"$root/centroids")
    // bit-exact round trip — this IS the fixed-set reproducibility contract
    assert(loaded == trained.map(_.toVector).toVector)
    val queries = df.filter(col("id") % 20 === 0)
      .select(col("id").as("q_id"), col("v").as("q_vec"))
    val corpus = df.select(col("id").as("c_id"), col("v").as("c_vec"))
    def topk(ctrs: Seq[Seq[Double]]) =
      Similarity.ivfTopKQuantized(queries, corpus, 5, nProbes = 1,
          dim = 4, trained = ctrs)
        .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(topk(loaded) == topk(trained))
    // PQ codebooks round-trip the same way
    val books = Similarity.pqCodebooks(nBlocks = 2, codebookSize = 4,
      subDim = 2, seed = 11L)
    graft.ops.IndexStore.savePqCodebooks(spark, books, s"$root/books")
    val loadedBooks = graft.ops.IndexStore.loadPqCodebooks(spark, s"$root/books")
    assert(loadedBooks == books.map(_.map(_.toVector).toVector).toVector)
  }

  test("splitAssign: deterministic, complete, and close to declared fractions") {
    import graft.ops.Sampling
    val keys = (0L until 2000L).toDF("k")
    val splits = keys.select(col("k"), Sampling.splitAssign(col("k")).as("s"))
    val counts = splits.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000L)
    // realized fractions are 204/26/26 of 256 — allow sampling wobble
    assert(math.abs(counts("train") - 2000.0 * 204 / 256) < 120,
      s"train count ${counts("train")}")
    // stability: identical assignment at a different partitioning
    val again = keys.repartition(13)
      .select(col("k"), Sampling.splitAssign(col("k")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = splits.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
    // hashSample keeps a stable subset, no resampling across runs
    val s1 = Sampling.hashSample(keys, "k", 0.25).as[Long].collect().toSet
    val s2 = Sampling.hashSample(keys.repartition(7), "k", 0.25).as[Long].collect().toSet
    assert(s1 == s2 && s1.size > 300 && s1.size < 700, s"sample size ${s1.size}")
  }

  test("split lanes are independent of sampler survival (review r12)") {
    import graft.ops.Sampling
    // review r12: samplers keep LOW unsalted buckets, so an unsalted
    // split made any fraction < trainPct/100 lose ALL val/test rows —
    // the salted split must field every split among survivors at ~the
    // declared rates
    val keys = (0L until 4000L).toDF("k")
    val sampled = Sampling.hashSample(keys, "k", 0.25) // keeps bucket < 64
    val counts = sampled
      .select(Sampling.splitAssign(col("k")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"),
      s"sampled corpus lost split coverage: $counts")
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("val") / n - 26.0 / 256) < 0.05 &&
      math.abs(counts("test") / n - 26.0 / 256) < 0.05,
      s"survivor split rates diverged from declared: $counts")
    // a NULL key has no stable identity — it must land in train, never eval
    val nulls = Seq[Option[Long]](None, None).toDF("k")
      .select(Sampling.splitAssign(col("k")).as("s")).as[String].collect()
    assert(nulls.forall(_ == "train"), s"NULL keys leaked into eval: ${nulls.toSeq}")
    // a legal sub-1/256 fraction degrades to the 1-bucket floor, not empty
    assert(Sampling.hashSample(keys, "k", 0.001).count() > 0,
      "tiny fraction must clamp to one bucket, not empty the corpus")
  }

  test("epochMixture normalizes weights over sources PRESENT (review r12)") {
    import graft.ops.Sampling
    val df = (0L until 100L).map(i => (i, "a", 10L)).toDF("k", "src", "ntok")
    // source b is weighted but absent: a must absorb the WHOLE budget
    // (share 1.0), not half of it
    val out = Sampling.epochMixture(df, "k", "src",
      "ntok", Map("a" -> 0.5, "b" -> 0.5), totalBudget = Some(2000L))
    val mass = out.agg(sum(col("ntok"))).head().getLong(0)
    assert(mass >= 1900L && mass <= 2100L,
      s"absent-source weight must not shrink the budget (mass $mass, want ~2000)")
    // and an all-absent weighting fails loudly instead of emitting nothing
    intercept[IllegalArgumentException] {
      Sampling.epochMixture(df, "k", "src", "ntok", Map("zzz" -> 1.0))
    }
    // default budget (None) = the observed corpus mass, through the same
    // present-source normalizer: a is the only present source, so output
    // mass ≈ input mass (1000 tokens), not half of it
    val defBudget = Sampling.epochMixture(df, "k", "src",
      "ntok", Map("a" -> 0.5, "b" -> 0.5))
      .agg(sum(col("ntok"))).head().getLong(0)
    assert(defBudget >= 950L && defBudget <= 1100L,
      s"default budget must track input mass (got $defBudget, want ~1000)")
  }

  test("shuffleShard: complete permutation, dense per-shard positions, partition-stable") {
    import graft.ops.Sampling
    val keys = (0L until 2000L).toDF("k")
    val out = Sampling.shuffleShard(keys, "k", 8)
      .select("k", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length == 2000)
    // every shard's positions are exactly 0..n-1 (dense, no gaps/dupes)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length),
        s"shard $shard positions not dense")
    }
    // shards are reasonably even under the 16-bit hash spread
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.min > 150 && sizes.values.max < 350, sizes.toMap.toString)
    // identical (shard, pos) assignment at a different partitioning
    val again = Sampling.shuffleShard(keys.repartition(13), "k", 8)
      .select("k", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("rendezvousPick: even spread; removal moves ONLY the removed shard's keys; add moves only to the new shard") {
    import graft.ops.Sampling
    val all8 = sequence(lit(0), lit(7))
    val asg = (0L until 2000L).toDF("k").select(col("k"),
        Sampling.rendezvousPick(col("k"), all8).as("s8"),
        Sampling.rendezvousPick(col("k"),
          filter(all8, x => x =!= 5)).as("s8_minus5"),
        Sampling.rendezvousPick(col("k"), sequence(lit(0), lit(8))).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // even-ish spread over 8 shards (2000/8 = 250 expected)
    val sizes = asg.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.keySet == (0 until 8).toSet, sizes.toMap.toString)
    assert(sizes.values.min > 150 && sizes.values.max < 350, sizes.toMap.toString)
    // minimal movement on removal: keys NOT on shard 5 keep their shard;
    // keys on shard 5 all land elsewhere
    asg.foreach { case (k, before, after, _) =>
      if (before != 5) assert(after == before, s"key $k moved $before->$after")
      else assert(after != 5, s"key $k stayed on removed shard")
    }
    // minimal movement on addition: a key either keeps its shard or goes
    // to the NEW shard 8 — never migrates between surviving shards
    asg.foreach { case (k, before, _, plus) =>
      assert(plus == before || plus == 8, s"key $k migrated $before->$plus on add")
    }
    assert(asg.count { case (_, b, _, p) => p == 8 && b != 8 } > 100,
      "the added shard must actually attract keys")
  }

  test("kmvDistinct: exact below k, estimator within KMV error above k, multiset-invariant") {
    import graft.ops.Sketches
    val small = (0L until 60L).map(v => ("g", v)).toDF("grp", "v")
    val s = Sketches.kmvDistinct(small, "grp", col("v"), 128).collect()(0)
    assert(s.getAs[Long]("nb_distinct") == 60L)
    assert(s.getAs[Long]("k_used") == 60L)
    assert(s.getAs[Double]("est_distinct") == 60.0) // sketch not full => exact
    val big = (0L until 5000L).map(v => ("g", v)).toDF("grp", "v")
    val b = Sketches.kmvDistinct(big, "grp", col("v"), 256).collect()(0)
    assert(b.getAs[Long]("k_used") == 256L)
    // KMV std error ~ 1/sqrt(k) = 6.25%; allow 4 sigma
    val est = b.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far from 5000")
    // duplicates change nothing: the sketch sees the value SET
    val dup = big.union(big).union(big.limit(700))
    val d = Sketches.kmvDistinct(dup, "grp", col("v"), 256).collect()(0)
    assert(d.getAs[Long]("nb_distinct") == 5000L)
    assert(d.getAs[Double]("est_distinct") == est)
  }

  test("kmv sketches merge losslessly: merge(sk(A), sk(B)) == sk(A ∪ B)") {
    import graft.ops.Sketches
    val k = 128
    val a = (0L until 3000L).map(v => ("a", v)).toDF("grp", "v")
    val b = (1500L until 4500L).map(v => ("b", v)).toDF("grp", "v")
    val sk = Sketches.kmvMinHashes(a.union(b), "grp", col("v"), k)
      .collect().map(r => r.getAs[String]("grp") -> r.getSeq[Long](r.fieldIndex("hs"))).toMap
    val mr = Sketches
      .kmvMinHashes(a.union(b).withColumn("grp", lit("u")), "grp", col("v"), k)
      .collect()(0)
    val merged = mr.getSeq[Long](mr.fieldIndex("hs"))
    // merge the two per-group sketches sketch-side and compare to the
    // sketch built from the union corpus directly
    val vr = Seq((sk("a").toArray, sk("b").toArray)).toDF("ha", "hb")
      .select(Sketches.kmvMerge(col("ha"), col("hb"), k).as("u"))
      .collect()(0)
    val viaMerge = vr.getSeq[Long](vr.fieldIndex("u"))
    assert(viaMerge == merged, "sketch-side merge must equal the union's sketch")
  }

  test("log-histogram quantiles: bounded error, exact small values, partition-invariant") {
    import graft.ops.Sketches
    // skewed values across five octaves plus the exact 0..7 band
    val vals = (0L to 7L) ++ (1L to 400L).map(i => (i * i * 37) % 50000L + 8L)
    val df = vals.map(v => ("g", v)).toDF("grp", "v")
    val qs = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
    val row = Sketches.logQuantiles(df, "grp", col("v"), qs).collect()(0)
    val sorted = vals.sorted
    def exact(qn: Long, qd: Long): Long =
      sorted(((qn * sorted.size + qd - 1) / qd - 1).toInt)
    for (((name, qn, qd), i) <- qs.zipWithIndex) {
      val lb = row.getLong(i + 1)
      val ex = exact(qn, qd)
      assert(lb <= ex, s"$name: lower bound $lb above exact $ex")
      assert(ex < lb + math.max(lb / 8, 1) + 1,
        s"$name: exact $ex outside the 12.5% band above $lb")
    }
    // small values bucket individually: a corpus inside 0..7 is exact
    val tiny = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(v => ("t", v)).toDF("grp", "v")
    val t = Sketches.logQuantiles(tiny, "grp", col("v"),
      Seq(("p50", 1L, 2L))).collect()(0)
    assert(t.getLong(1) == 2L)
    // the sketch is a plain partial+final aggregation — bit-identical on
    // any partitioning (the merge property, tested the Spark way)
    val r1 = Sketches.logQuantiles(df.repartition(1), "grp", col("v"), qs)
      .collect()(0).toSeq
    val r13 = Sketches.logQuantiles(df.repartition(13), "grp", col("v"), qs)
      .collect()(0).toSeq
    assert(r1 == r13)
  }

  test("quantile-histogram state: daily folds equal the full rebuild; replay is a no-op") {
    import graft.ops.Sketches
    val root = java.nio.file.Files.createTempDirectory("graft-lhstate-")
    val dir = root.resolve("lh").toString
    try {
      val day1 = (1L to 300L).map(v => ("a", v * 13 % 4096))
      val day2 = (1L to 200L).map(v => ("a", v * 29 % 70000)) ++
        Seq(("b", 5L), ("b", 900L))
      Sketches.lhUpdateState(spark, dir, day1.toDF("grp", "v"), "grp",
        col("v"), deltaId = "d1")
      val st = Sketches.lhUpdateState(spark, dir, day2.toDF("grp", "v"), "grp",
        col("v"), deltaId = "d2")
      val qs = Seq(("p50", 1L, 2L), ("p95", 19L, 20L))
      val fromState = Sketches.logQuantilesFromHist(st, "grp", qs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val full = Sketches.logQuantiles(
        (day1 ++ day2).toDF("grp", "v"), "grp", col("v"), qs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(fromState == full, s"state folds ($fromState) != rebuild ($full)")
      // replaying an applied delta must not double any counter
      val replayed = Sketches.lhUpdateState(spark, dir, day2.toDF("grp", "v"),
        "grp", col("v"), deltaId = "d2")
      val after = Sketches.logQuantilesFromHist(replayed, "grp", qs)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(after == full, "replayed delta changed the state")
      val total = replayed.agg(sum("cnt")).head.getLong(0)
      assert(total == day1.size + day2.size, s"counter total $total drifted")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }

  test("kmv sketch state: daily folds equal the full rebuild; replaying a delta is a no-op") {
    import graft.ops.Sketches
    val root = java.nio.file.Files.createTempDirectory("graft-kmvstate-")
    val dir = root.resolve("state").toString
    try {
      val k = 64
      val day1 = (0L until 2000L).map(v => ("a", v)) ++ (0L until 50L).map(v => ("b", v))
      val day2 = (1000L until 3000L).map(v => ("a", v)) ++ (50L until 80L).map(v => ("b", v))
      def sketchMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[String]("grp") -> r.getSeq[Long](r.fieldIndex("hs"))).toMap
      Sketches.kmvUpdateState(spark, dir, day1.toDF("grp", "v"), "grp", col("v"), k)
      val s2 = sketchMap(
        Sketches.kmvUpdateState(spark, dir, day2.toDF("grp", "v"), "grp", col("v"), k))
      val full = sketchMap(
        Sketches.kmvMinHashes((day1 ++ day2).toDF("grp", "v"), "grp", col("v"), k))
      assert(s2 == full, "two daily folds must equal the full-corpus sketch")
      // at-least-once: re-folding day2 must not move the state
      val s3 = sketchMap(
        Sketches.kmvUpdateState(spark, dir, day2.toDF("grp", "v"), "grp", col("v"), k))
      assert(s3 == s2, "replaying a delta must be a no-op")
      // crash window: live dir moved aside, .old left behind (between the
      // swap's two renames) — the next fold must recover the previous
      // snapshot, not restart from empty
      val live = new org.apache.hadoop.fs.Path(dir)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(live, new org.apache.hadoop.fs.Path(dir + ".old")))
      val s4 = sketchMap(
        Sketches.kmvUpdateState(spark, dir, day2.toDF("grp", "v"), "grp", col("v"), k))
      assert(s4 == s2, "a fold after a mid-swap crash must recover the snapshot")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }

  test("count-min: exact when buckets dwarf the vocabulary, never undercounts when they don't") {
    import graft.ops.Sketches
    val rows = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val df = rows.toDF("v")
    val exact = rows.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
    // w >> vocab: every estimate is the exact count
    val wide = Sketches.cmBuild(df, col("v"), d = 3, w = 1 << 20)
    val wideEst = Sketches.cmEstimate(wide, df, col("v"), 3, 1 << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wideEst == exact, "collision-free sketch must be exact")
    // w << vocab: overcounts appear but NO estimate ever undercounts,
    // and each hash row conserves total mass
    val tight = Sketches.cmBuild(df, col("v"), d = 3, w = 16)
    val tightEst = Sketches.cmEstimate(tight, df, col("v"), 3, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, c) =>
      assert(tightEst(v) >= c, s"CM undercounted $v: ${tightEst(v)} < $c")
    }
    assert(exact.exists { case (v, c) => tightEst(v) > c },
      "a 16-bucket sketch over a 500-token vocabulary must collide somewhere")
    val mass = tight.groupBy("j").agg(sum("cnt").as("m")).collect()
      .map(r => r.getAs[Long]("m"))
    assert(mass.length == 3 && mass.forall(_ == rows.size.toLong),
      s"every hash row must conserve total mass: ${mass.toSeq}")
  }

  test("count-min: sketch-side merge equals the union's sketch; weights fold in") {
    import graft.ops.Sketches
    val a = (0 until 300).map(i => s"t${i % 40}").toDF("v")
    val b = (0 until 200).map(i => s"t${i % 55}").toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val merged = m(Sketches.cmMergeFrames(
      Sketches.cmBuild(a, col("v"), 2, 32), Sketches.cmBuild(b, col("v"), 2, 32)))
    assert(merged == m(Sketches.cmBuild(a.union(b), col("v"), 2, 32)),
      "elementwise counter addition must equal the union build")
    // weighted build: each row counts its weight, not 1
    val w = Seq(("x", 5L), ("y", 2L), ("x", 1L)).toDF("v", "wt")
    val est = Sketches.cmEstimate(
        Sketches.cmBuild(w, col("v"), 2, 1 << 16, weight = col("wt")),
        w, col("v"), 2, 1 << 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 6L, "y" -> 2L), s"weighted counts: $est")
  }

  test("count-min state: daily folds equal full rebuild; a replayed deltaId never double-counts") {
    import graft.ops.Sketches
    val root = java.nio.file.Files.createTempDirectory("graft-cmstate-")
    val dir = root.resolve("state").toString
    try {
      val d = 3; val w = 64
      val day1 = (0 until 400).map(i => s"t${i % 30}").toDF("v")
      val day2 = (0 until 300).map(i => s"t${i % 50}").toDF("v")
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
      Sketches.cmUpdateState(spark, dir, day1, col("v"), d, w, "2026-01-01")
      val s2 = m(Sketches.cmUpdateState(spark, dir, day2, col("v"), d, w, "2026-01-02"))
      assert(s2 == m(Sketches.cmBuild(day1.union(day2), col("v"), d, w)),
        "two daily folds must equal the full-corpus sketch")
      // counters are NOT idempotent — the ledger must make the replay a no-op
      val s3 = m(Sketches.cmUpdateState(spark, dir, day2, col("v"), d, w, "2026-01-02"))
      assert(s3 == s2, "replaying an applied deltaId must not double-count")
      assert(Sketches.cmAppliedDeltas(spark, dir) == Set("2026-01-01", "2026-01-02"))
      // mid-swap crash: live moved aside, .old left — next fold recovers
      val live = new org.apache.hadoop.fs.Path(dir)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(live, new org.apache.hadoop.fs.Path(dir + ".old")))
      val s4 = m(Sketches.cmUpdateState(spark, dir, day2, col("v"), d, w, "2026-01-02"))
      assert(s4 == s2, "a fold after a mid-swap crash must recover the snapshot, and the recovered ledger must still veto the replay")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }
  }

  test("temperatureSample: rarest source keeps all, dominant source shrinks toward sqrt rule") {
    import graft.ops.Sampling
    // sources with 100 / 400 / 1600 rows: keep fractions 1, 1/2, 1/4
    val df = ((0L until 100L).map(i => (i, "rare")) ++
      (100L until 500L).map(i => (i, "mid")) ++
      (500L until 2100L).map(i => (i, "big"))).toDF("k", "src")
    val kept = Sampling.temperatureSample(df, "k", "src")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 100L, s"rare source must keep everything: $kept")
    // hash-grid realization of 1/2 and 1/4 with sampling wobble
    assert(math.abs(kept("mid") - 200.0) < 60, kept.toString)
    assert(math.abs(kept("big") - 400.0) < 100, kept.toString)
    // partition-stability: same surviving key set
    val a = Sampling.temperatureSample(df, "k", "src").select("k")
      .as[Long].collect().toSet
    val b = Sampling.temperatureSample(df.repartition(11), "k", "src").select("k")
      .as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureSample: NULL sources never shrink real cuts; extreme skew keeps floor fraction") {
    import graft.ops.Sampling
    // Edge 1: a tiny NULL-source group. If it leaked into the count/min
    // frames it would set c_min=2 and cut the 200-row source to
    // floor(256*sqrt(2/200)) = 25 buckets (~10%); with the fix the only
    // real source is its own min and keeps everything. NULL rows are
    // dropped by the documented policy.
    val withNull = ((0L until 2L).map(i => (i, null: String)) ++
      (10L until 210L).map(i => (i, "solo"))).toDF("k", "src")
    val keptNull = Sampling.temperatureSample(withNull, "k", "src")
      .groupBy("src").count().collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(keptNull.get(Some("solo")).contains(200L),
      s"solo source must keep all 200 rows (NULL group must not set c_min): $keptNull")
    assert(!keptNull.contains(None), s"NULL-source rows must be dropped: $keptNull")
    // Edge 2: skew past the 256-grid resolution (c_s > 65536*c_min).
    // Unclamped, floor(256*sqrt(1/70000)) = 0 and the dominant source
    // vanishes; the clamp keeps its floor fraction (~1/256 ≈ 273 rows).
    val skewed = (Seq((0L, "rare")) ++
      (1L until 70001L).map(i => (i, "big"))).toDF("k", "src")
    val keptSkew = Sampling.temperatureSample(skewed, "k", "src")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptSkew("rare") == 1L, keptSkew.toString)
    val big = keptSkew.getOrElse("big", 0L)
    assert(big > 150L && big < 450L,
      s"dominant source must keep ~70000/256 rows, not vanish: $keptSkew")
  }

  test("epochMixture: integer epochs replicate exactly, fractional epochs hash-subsample, caps and NULL policy hold") {
    import graft.ops.Sampling
    // A: 10 rows × 100 tokens = 1000; B: 90 rows × 100 = 9000. Equal
    // target shares → budget 5000 each → e_A = 5.0 (exact: every A row
    // 5 copies, fractional cut 0), e_B = 5/9 (no full epoch, cut 142).
    val df = ((0L until 10L).map(i => (i, "A", 100)) ++
      (10L until 100L).map(i => (i, "B", 100))).toDF("k", "src", "ntok")
    val out = Sampling.epochMixture(df, "k", "src", "ntok",
      Map("A" -> 1.0, "B" -> 1.0))
    val perSrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("A") == 50L, s"A must emit exactly 5 copies/row: $perSrc")
    // every A row appears with epochs 0..4 exactly once
    val aEpochs = out.filter(col("src") === "A").groupBy("k")
      .agg(sort_array(collect_list(col("epoch"))).as("es"))
      .collect().map(_.getSeq[Long](1))
    assert(aEpochs.forall(_ == Seq(0L, 1L, 2L, 3L, 4L)), "A epoch indices must be 0..4")
    // B keeps ~ 90×142/256 ≈ 50 rows, all epoch 0, with hash wobble
    assert(perSrc("B") > 30L && perSrc("B") < 70L, perSrc.toString)
    assert(out.filter(col("src") === "B" && col("epoch") =!= 0L).count() == 0L)
    // partition-stability: identical (k, epoch) multiset
    val again = Sampling.epochMixture(df.repartition(13), "k", "src", "ntok",
      Map("A" -> 1.0, "B" -> 1.0))
      .select("k", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val first = out.select("k", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(again.toSeq == first.toSeq)
    // weight-0 and absent sources are dropped; NULL sources are dropped
    val withNull = df.unionByName(Seq((200L, null: String, 50)).toDF("k", "src", "ntok"))
    val zeroed = Sampling.epochMixture(withNull, "k", "src", "ntok",
      Map("A" -> 1.0, "B" -> 0.0))
    assert(zeroed.filter(col("src") =!= "A").count() == 0L)
    // maxEpochs caps a runaway share: A alone with budget 10^6 over
    // mass 1000 wants e = 1000 — capped to the default 100
    val capped = Sampling.epochMixture(df.filter(col("src") === "A"),
      "k", "src", "ntok", Map("A" -> 1.0), totalBudget = Some(1000000L))
    assert(capped.count() == 10L * 100, "cap must bound replication at maxEpochs")
  }

  test("writeTrainingShards: one pos-ordered file per shard, manifest digests match the files") {
    import graft.ops.Sampling
    val root = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    val df = (0L until 2000L).toDF("k")
    val manifest = Sampling.writeTrainingShards(df, "k", 8, s"$root/out")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(manifest.keySet == (0 until 8).toSet)
    assert(manifest.values.map(_._1).sum == 2000L)
    val expected = Sampling.shuffleShard(df, "k", 8)
      .select("shard", "pos", "k").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (0 until 8).foreach { s =>
      val dir = new java.io.File(s"$root/out/shard=$s")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s has ${files.length} files, want 1")
      // FILE order (no sort on read) must equal the deterministic pos order
      val got = spark.read.parquet(dir.toString).select("k")
        .as[Long].collect().toSeq
      assert(got == expected(s), s"shard $s file order != pos order")
      // the manifest digest is the md5 of exactly that order
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(got.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(digest == manifest(s)._2, s"shard $s digest mismatch")
    }
    // re-run reproduces identical digests (the trainer-order contract)
    val again = Sampling.writeTrainingShards(
      df.repartition(13), "k", 8, s"$root/out2")
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(again == manifest.view.mapValues(_._2).toMap)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("epochMixture composes with shuffleShard: copies of one doc spread across shards") {
    import graft.ops.Sampling
    // upsample a small source to exactly 8 epochs, then shard the
    // training order on (id, epoch) — the terminal composition the
    // epochMixture doc promises: replicas of the same doc must NOT land
    // adjacent (same shard) or the trainer sees them back-to-back
    val df = (0L until 40L).map(i => (i, "A", 100)).toDF("k", "src", "ntok")
    val mixed = Sampling.epochMixture(df, "k", "src", "ntok",
      Map("A" -> 1.0), totalBudget = Some(32000L)) // 8.0 epochs exactly
      .withColumn("shard_key", concat_ws("#", col("k"), col("epoch")))
    val sharded = Sampling.shuffleShard(mixed, "shard_key", 8)
    val spread = sharded.groupBy("k")
      .agg(count_distinct(col("shard")).as("nb_shards"))
      .collect().map(r => r.getLong(1))
    // 8 copies over 8 shards by independent hashes: expect wide spread —
    // ≥4 distinct shards for every doc (P[<4] is negligible), never 1
    assert(spread.forall(_ >= 4), s"copies collapsed onto few shards: ${spread.min}")
    // the composed permutation is itself partition-stable
    val again = Sampling.shuffleShard(mixed.repartition(13), "shard_key", 8)
      .select("shard_key", "shard", "pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    val first = sharded.select("shard_key", "shard", "pos").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(again == first)
  }

  test("weightedSample: per-row keep probability tracks the weight column; clamped; partition-stable") {
    import graft.ops.Sampling
    val df = ((0L until 200L).map(i => (i, 1.0)) ++      // always kept
      (200L until 400L).map(i => (i, 0.0)) ++            // always dropped
      (400L until 1400L).map(i => (i, 0.5)) ++           // ~half
      (1400L until 1500L).map(i => (i, 7.0)) ++          // clamps to 1
      (1500L until 1600L).map(i => (i, -3.0)))           // clamps to 0
      .toDF("k", "w")
    val kept = Sampling.weightedSample(df, "k", col("w"))
      .select("k").as[Long].collect().toSet
    assert((0L until 200L).forall(kept), "weight 1.0 rows must all survive")
    assert((200L until 400L).forall(!kept(_)), "weight 0.0 rows must all drop")
    assert((1400L until 1500L).forall(kept), "weights > 1 clamp to certain keep")
    assert((1500L until 1600L).forall(!kept(_)), "negative weights clamp to drop")
    val half = (400L until 1400L).count(kept)
    assert(half > 400 && half < 600, s"weight 0.5 keeps ~half (got $half)")
    val again = Sampling.weightedSample(df.repartition(11), "k", col("w"))
      .select("k").as[Long].collect().toSet
    assert(again == kept)
  }

  test("quantileFilter: top-fraction per group by (score desc, id) total order; singleton groups survive") {
    import graft.ops.TextAnalysis
    // g1: scores = id (0..99) → top 25% = ranks 1..25 → ids 75..99.
    // g2: ALL scores equal → id tiebreak → ids 0..24 kept.
    // g3: a single row → percent_rank 0 → always kept.
    val df = ((0L until 100L).map(i => (i, "g1", i.toDouble)) ++
      (0L until 100L).map(i => (i, "g2", 5.0)) ++
      Seq((0L, "g3", 0.01))).toDF("id", "g", "score")
    val kept = TextAnalysis.quantileFilter(df, "g", col("score"), "id", 0.25)
      .select("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert((75L until 100L).forall(i => kept(("g1", i))) &&
      !(0L until 75L).exists(i => kept(("g1", i))),
      "g1 must keep exactly the 25 best scores")
    assert((0L until 25L).forall(i => kept(("g2", i))) &&
      !(25L until 100L).exists(i => kept(("g2", i))),
      "all-tied g2 must fall back to the id order deterministically")
    assert(kept(("g3", 0L)), "singleton group must never empty")
    assert(kept.size == 51, s"expected 25+25+1 rows, got ${kept.size}")
  }

  test("sourceOverlap: exact pairwise gram Jaccard; zero-overlap pairs absent; short docs ignored") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "a b c d e", "X"),  // grams: {a b c, b c d, c d e}
      (2L, "a b c d z", "Y"),  // grams: {a b c, b c d, c d z} → ∩X = 2
      (3L, "p q r s", "Z"),    // disjoint from both
      (4L, "t u", "Z")         // < 3 tokens: contributes nothing
    ).toDF("doc_id", "text", "src")
    val m = TextAnalysis.sourceOverlap(docs, "doc_id", "text", "src", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(m.keySet == Set(("X", "Y")),
      s"only the overlapping pair may appear: ${m.keySet}")
    val (na, nb, shared, j) = m(("X", "Y"))
    assert(na == 3 && nb == 3 && shared == 2 && j == 0.5,
      s"expected |X|=3 |Y|=3 ∩=2 J=0.5, got ($na,$nb,$shared,$j)")
    // hash-mod sampling keeps a deterministic subset of the gram universe
    val sampled = TextAnalysis.sourceOverlap(docs, "doc_id", "text", "src",
      n = 3, sampleBuckets = 64)
    val sampledAgain = TextAnalysis.sourceOverlap(
      docs.repartition(5), "doc_id", "text", "src", n = 3, sampleBuckets = 64)
    assert(sampled.collect().toSeq.sortBy(_.toString) ==
      sampledAgain.collect().toSeq.sortBy(_.toString))
  }

  test("hardNegatives: nearest different-group vectors only, same-group never ranks") {
    import graft.ops.Similarity
    // groups 0/1 in distinct directions plus a near-query same-group decoy
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0), // same group as query, nearest — excluded
      (2L, Seq(0.9, 0.1, 0.0), 1), // nearest different-group
      (3L, Seq(0.0, 1.0, 0.0), 1),
      (4L, Seq(0.0, 0.0, 1.0), 1),
      (5L, Seq(-1.0, 0.0, 0.0), 0)
    ).toDF("c_id", "c_vec", "c_group")
    val queries = Seq((100L, Seq(1.0, 0.0, 0.0), 0))
      .toDF("q_id", "q_vec", "q_group")
    val out = Similarity.hardNegatives(queries, corpus, k = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getInt(4)))
    assert(out.toSeq == Seq((2L, 1), (3L, 2)), out.toSeq.toString)
    // NULL group is distinct from everything including NULL: all rows rank
    val nullCorpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0), Option.empty[Int]),
      (2L, Seq(0.5, 0.5, 0.0), Option(0))
    ).toDF("c_id", "c_vec", "c_group")
    val nullQ = Seq((100L, Seq(1.0, 0.0, 0.0), Option.empty[Int]))
      .toDF("q_id", "q_vec", "q_group")
    val nOut = Similarity.hardNegatives(nullQ, nullCorpus, k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(nOut == Set(1L, 2L))
  }

  test("minhashSignature Column form matches the explode+aggregate scale form") {
    import graft.ops.{Dedup, TextAnalysis}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val colForm = docs.select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingles(TextAnalysis.tokens(col("text")), 3), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    // reconstruct the signature from lshBandKeys' band keys (3 bands × 4)
    val fromBands = Dedup.lshBandKeys(docs, "doc_id", "text", 3, 12, 3, 4)
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1))
          .flatMap(_.getString(2).split('|').map(_.toLong)).toVector
      }
    assert(colForm == fromBands)
  }

  test("winnowing: w+k-1 guarantee, short-doc degradation, df cap suppresses boilerplate") {
    import graft.ops.{Dedup, TextAnalysis}
    def fps(text: String, k: Int, w: Int): Set[String] =
      Seq(text).toDF("t")
        .select(TextAnalysis.winnowedFingerprints(
          TextAnalysis.tokens(col("t")), k, w).as("f"))
        .head().getSeq[String](0).toSet
    // shorter than k tokens -> no fingerprints; k..k+w-2 grams -> the one min
    assert(fps("a b c", 5, 4).isEmpty)
    assert(fps("a b c d e f", 5, 4).size == 1) // 2 grams, 1 window-min degrade
    // the winnowing guarantee: a shared run of exactly w+k-1 = 8 tokens
    // must yield at least one shared fingerprint
    val run = (0 until 8).map(i => s"shared$i").mkString(" ")
    val docA = s"alpha beta gamma $run delta epsilon zeta"
    val docB = s"one two three four $run five six seven"
    assert(fps(docA, 5, 4).intersect(fps(docB, 5, 4)).nonEmpty)
    // pair detection: borrowed 16-token run found; unrelated doc silent
    val longRun = (0 until 16).map(i => s"copy$i").mkString(" ")
    val corpus = Seq(
      (1L, s"u1 u2 u3 $longRun u4 u5 u6"),
      (2L, s"v1 v2 v3 v4 $longRun v5 v6"),
      (3L, "totally unrelated words that never repeat anything at all here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(corpus, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // df cap: a span in MORE than maxDf docs is boilerplate, not borrowing
    // (identical docs, so every fingerprint has df = 12 > maxDf exactly)
    val flood = (0 until 12).map(i => (i.toLong, longRun)).toDF("doc_id", "text")
    val capped = Dedup.winnowedPairs(flood, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDf = 10)
    assert(capped.count() == 0, "flooded fingerprints must be dropped by the df cap")
  }

  test("redactPii / matchCount / ngrams: patterns and slices are exact") {
    import graft.ops.TextAnalysis
    val df = Seq(
      ("write to bob.smith@corp.example.org or call 555-123-4567 now", 1, 1),
      ("no pii here at all", 0, 0),
      ("two mails a@b.io and c.d@e.f.co", 2, 0)
    ).toDF("text", "wantEmails", "wantPhones")
    val bad = df.filter(
      TextAnalysis.matchCount(col("text"), TextAnalysis.EmailRe) =!= col("wantEmails") ||
      TextAnalysis.matchCount(col("text"), TextAnalysis.PhoneRe) =!= col("wantPhones"))
    assert(bad.count() == 0, bad.collect().mkString(","))
    val red = df.filter(col("wantEmails") === 1)
      .select(TextAnalysis.redactPii(col("text"))).as[String].head()
    assert(red == "write to [EMAIL] or call [PHONE] now", red)
    val grams = Seq("a b c d").toDF("t")
      .select(TextAnalysis.ngrams(TextAnalysis.tokens(col("t")), 3))
      .as[Seq[String]].head()
    assert(grams == Seq("a b c", "b c d"), grams)
  }

  test("curate: end-to-end corpus curation composes the library stages") {
    import graft.ops.Curate
    val good1 = "the quick brown fox and the lazy dog of the meadow is running " +
      "past the old mill and the river bend where the children of the village play"
    val toks = good1.split(" ")
    val trunc = toks.take(toks.length * 4 / 5).mkString(" ")
    val good2 = "a growing list of features and a set of tools is what the " +
      "platform offers and the users of the service are happy with the results"
    val leaked = good2 + " alpha beta gamma delta epsilon"
    val leakSrc = "benchmark holdout phrase alpha beta gamma delta epsilon zeta"
    val withEmail = "the contact of the team is dev@example.org and the page of " +
      "the project has a list of the issues and the plans of coming releases"
    val docs = Seq(
      (1L, good1),
      (2L, "  " + good1.replace(" ", "  ")), // exact dup after normalization
      (3L, trunc),                           // near-dup (truncation) of 1
      (4L, "xyz abc"),                       // below the quality floor
      (5L, leaked),                          // leaks a benchmark 5-gram
      (6L, withEmail)                        // survives, PII redacted
    ).toDF("doc_id", "text")
    val bench = Seq((100L, leakSrc)).toDF("doc_id", "text")
    val r = Curate.curate(docs, bench, "doc_id", "text")
    val out = r.corpus.select("doc_id", "text", "split").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getString(2)))).toMap
    assert(out.keySet == Set(1L, 6L), out.keySet.toString)
    assert(out(6L)._1.contains("[EMAIL]") && !out(6L)._1.contains("dev@example.org"))
    assert(Set("train", "val", "test").contains(out(1L)._2))
    val st = r.stats.head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      == ((6L, 5L, 4L, 2L)), st.toString)
  }

  test("curate: decontamination catches overlap centered on PII values") {
    import graft.ops.Curate
    // the ONLY grams shared with the benchmark span the email token: an
    // unredacted benchmark side tokenizes the literal address while the
    // corpus side already reads [EMAIL], so every spanning gram differs
    // and the contamination slips through — the benchmark must be
    // redacted with the same rules before comparison
    val contaminated = "please send a note with the latest numbers at " +
      "dev@example.org today and the rest of the summary of the week is " +
      "in the shared folder of the team for all of the members to read"
    val clean = "a growing list of features and a set of tools is what the " +
      "platform offers and the users of the service are happy with the results"
    val docs = Seq((1L, contaminated), (2L, clean)).toDF("doc_id", "text")
    val bench = Seq((100L, "the latest numbers at dev@example.org today"))
      .toDF("doc_id", "text")
    val r = Curate.curate(docs, bench, "doc_id", "text")
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L), s"doc 1 should be decontaminated away: $ids")
  }

  test("lshCandidates under planted skew: a flooded band bucket stays correct") {
    // degenerate corpus: 200 IDENTICAL docs (all 12 minima equal → all 3
    // bands collide → one bucket holds the full flood and the self-join
    // emits all C(200,2) pairs), 30 EMPTY docs (zero shingles), 30 normal
    val floodText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows =
      (0L until 200L).map(i => (i, floodText)) ++
      (200L until 230L).map(i => (i, "")) ++
      (230L until 260L).map(i => (i, s"doc$i speaks about matter$i concern$i " +
        s"item${i * 7} and thing${i * 13} plus part${i * 29}"))
    val df = rows.toDF("doc_id", "text")
    val cand = Dedup.lshCandidates(df, "doc_id", "text",
      shingleN = 3, k = 12, bands = 3, rows = 4)
    val nPairs = cand.count()
    // correctness first: every identical pair survives the flooded bucket
    val floodPairs = cand.filter(col("id_a") < 200 && col("id_b") < 200).count()
    assert(floodPairs == 200L * 199 / 2, s"flood pairs $floodPairs")
    // empty docs reduce to the single "" shingle — identical content, so
    // they flood a second bucket and pair among THEMSELVES (correct: they
    // are exact duplicates of each other), but never cross into any
    // non-empty doc's bucket
    val isEmptyA = col("id_a") >= 200 && col("id_a") < 230
    val isEmptyB = col("id_b") >= 200 && col("id_b") < 230
    assert(cand.filter(isEmptyA =!= isEmptyB).count() == 0)
    assert(cand.filter(isEmptyA && isEmptyB).count() == 30L * 29 / 2)
    // exact verification on the flooded pairs is exact Jaccard 1.0
    val flooded = Dedup.jaccardOnPairs(
      cand.filter(col("id_a") < 200 && col("id_b") < 200), df, "doc_id", "text", 3)
    assert(flooded.agg(min("jaccard"), max("jaccard")).head()
      == org.apache.spark.sql.Row(1.0, 1.0))
    // record the runtime plan: at this SF the flooded bucket stays far
    // below AQE's skewedPartitionThresholdInBytes, so no skew-split is
    // expected (PERF.md documents the 100 TB posture: AQE splits the
    // sort-merge partitions at scale; exact-dedup-first in Curate removes
    // identical floods before LSH ever sees them)
    val plan = cand.queryExecution.executedPlan.toString
    info(s"planted-skew pairs=$nPairs, AQE skew marker in plan: ${plan.contains("skew=true")}")
  }

  test("lshCandidates maxBucket: flooded bucket degrades clique to chain, collapse survives") {
    val floodText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows =
      (0L until 200L).map(i => (i, floodText)) ++
      (230L until 260L).map(i => (i, s"doc$i speaks about matter$i concern$i " +
        s"item${i * 7} and thing${i * 13} plus part${i * 29}"))
    val df = rows.toDF("doc_id", "text")
    val cand = Dedup.lshCandidates(df, "doc_id", "text",
      shingleN = 3, k = 12, bands = 3, rows = 4, maxBucket = 16)
    val floodPairs = cand.filter(col("id_a") < 200 && col("id_b") < 200)
    // 200 identical docs collide in all 3 bands; the cap turns each band's
    // C(200,2) clique into the same 199-edge consecutive-id chain
    assert(floodPairs.count() == 199)
    assert(floodPairs.filter(col("id_b") =!= col("id_a") + 1).count() == 0)
    // chain edges all verify at Jaccard 1.0 and the transitive collapse
    // still folds the whole flood to ONE survivor — capping degrades pair
    // volume, not dedup semantics, for a genuine boilerplate family
    val verified = Dedup.jaccardOnPairs(floodPairs, df, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.9)
    val survivors = Dedup.survivorsTransitive(df, verified, "doc_id")
    assert(survivors.filter(col("doc_id") < 200).count() == 1)
    assert(survivors.filter(col("doc_id") >= 230).count() == 30)
    // the diagnostic surfaces exactly the 3 flooded band buckets
    val over = Dedup.lshOversizedBuckets(df, "doc_id", "text",
      shingleN = 3, k = 12, bands = 3, rows = 4, maxBucket = 16)
      .collect()
    assert(over.length == 3 && over.forall(_.getLong(2) == 200L))
    // small buckets are untouched: the 30 distinct docs still pair with
    // nobody, same as the uncapped run
    assert(cand.filter(col("id_a") >= 230 || col("id_b") >= 230).count() == 0)
  }

  test("simhashNearDups maxBucket: flooded hash bucket chains, popcount stays exact") {
    // 100 identical 64-bit hashes flood all 4 bands; doc 100 differs only
    // in the top band (2 bits) so it shares 3 of the 4 flooded buckets
    val rows = (0L until 100L).map(i => (i, 0x0BCD1234FACE5678L)) :+
      (100L, 0xABCD1234FACE5678L)
    val df = rows.toDF("id", "h")
    val out = Dedup.simhashNearDups(df, "id", "h",
      bands = 4, width = 16, maxHamming = 3, maxBucket = 16)
    // consecutive-id chains across the flooded buckets: (i, i+1) for
    // i = 0..99, nothing else — 100 pairs instead of C(101,2) = 5050
    assert(out.count() == 100)
    assert(out.filter(col("id_b") =!= col("id_a") + 1).count() == 0)
    val last = out.filter(col("id_a") === 99 && col("id_b") === 100).head()
    assert(last.getInt(2) == 2) // exact hamming survives the chain path
    assert(out.filter(col("id_b") < 100).agg(max("hamming")).head().getInt(0) == 0)
  }

  test("curate is a fixpoint: re-curating a curated corpus changes nothing") {
    import graft.ops.Curate
    // seeded generator: stopword-dense sentences so the quality floor is
    // comfortably cleared, plus planted rows for every eliminating stage
    val rnd = new scala.util.Random(1234)
    val stop = Seq("the", "of", "and", "is", "a", "in", "to", "it")
    val words = Seq("fox", "dog", "mill", "river", "village", "platform",
      "service", "tools", "users", "meadow", "issue", "release", "page",
      "team", "project", "result", "list", "plan", "bend", "children")
    def gen(): String =
      Seq.tabulate(24)(i => if (i % 2 == 0) stop(rnd.nextInt(stop.size))
                            else words(rnd.nextInt(words.size))).mkString(" ")
    val bases = Seq.fill(15)(gen())
    val rows = scala.collection.mutable.Buffer[(Long, String)]()
    def add(t: String): Unit = rows.append((rows.size.toLong, t))
    bases.foreach(add)
    bases.take(4).foreach(b => add("  " + b.replace(" ", "  "))) // exact dups
    bases.slice(4, 8).foreach { b => // near-dup truncations
      val t = b.split(" "); add(t.take(t.length * 4 / 5).mkString(" "))
    }
    // identical up to the PII value — only pre-dedup redaction collapses
    // these, which is exactly what the fixpoint requires
    add("the contact of the team is alice@example.org and the page of the project has a list of the issues")
    add("the contact of the team is bob@example.net and the page of the project has a list of the issues")
    add("xz qq") // below the quality floor
    add(bases.head + " alpha beta gamma delta epsilon") // benchmark leak
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val input = rows.toSeq.toDF("doc_id", "text")

    def run(df: org.apache.spark.sql.DataFrame) =
      Curate.curate(df, bench, "doc_id", "text")
    def collect(r: Curate.Result) =
      r.corpus.select("doc_id", "text", "split").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    val once = run(input)
    val onceRows = collect(once)
    assert(onceRows.nonEmpty)
    // the PII twins collapsed to ONE surviving redacted row in pass 1
    assert(onceRows.count(_._2.contains("[EMAIL]")) == 1)
    val twice = run(once.corpus.select("doc_id", "text", "split"))
    val twiceRows = collect(twice)
    assert(twiceRows == onceRows)
    // pass 2 eliminated nothing at any stage
    val st = twice.stats.head()
    assert(Seq(st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      .distinct.size == 1, st.toString)
    once.release(); twice.release()
  }

  test("curateDelta equals full re-curate on the union, probing persisted state") {
    import graft.ops.{Curate, CurateIncremental}
    val rnd = new scala.util.Random(4321)
    val stop = Seq("the", "of", "and", "is", "a", "in", "to", "it")
    val words = Seq("fox", "dog", "mill", "river", "village", "platform",
      "service", "tools", "users", "meadow", "issue", "release", "page",
      "team", "project", "result", "list", "plan", "bend", "children")
    def gen(): String =
      Seq.tabulate(24)(i => if (i % 2 == 0) stop(rnd.nextInt(stop.size))
                            else words(rnd.nextInt(words.size))).mkString(" ")
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text", "split").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet

    // day 0: full curate, persist the state tables through parquet
    val baseTexts = Seq.fill(12)(gen())
    val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val day0 = Curate.curate(base, bench, "doc_id", "text")
    val day0Rows = rows(day0.corpus)
    val root = java.nio.file.Files.createTempDirectory("graft-inc-").toString
    CurateIncremental.saveState(
      CurateIncremental.buildState(day0.corpus, "doc_id", "text"), root)
    day0.release()
    val st = CurateIncremental.loadState(spark, root)

    // day 1 delta (ingest-monotone ids): new uniques, an exact re-crawl of
    // a persisted doc, a near-dup truncation of a persisted doc, an
    // in-delta near-dup pair, an in-delta exact dup, a quality reject, and
    // a benchmark leak — one planted row per eliminating stage
    val deltaRows = scala.collection.mutable.Buffer[(Long, String)]()
    def add(t: String): Unit = deltaRows.append((100L + deltaRows.size, t))
    Seq.fill(5)(gen()).foreach(add)
    add(baseTexts(0)) // re-crawl: persisted fingerprint must kill it
    val t1 = baseTexts(1).split(" ")
    add(t1.take(t1.length * 4 / 5).mkString(" ")) // near-dup of state doc
    val fresh = gen()
    add(fresh)
    add(fresh + " extra words here") // near-dup within the delta
    add("  " + fresh.replace(" ", "  ")) // exact dup within the delta
    add("zz qq") // quality reject
    add(baseTexts(2) + " holdout alpha beta gamma delta epsilon") // leak
    val delta = deltaRows.toSeq.toDF("doc_id", "text")

    val inc = CurateIncremental.curateDelta(delta, bench, "doc_id", "text", st)
    val incRows = rows(inc.corpus)
    assert(incRows.nonEmpty)
    // the planted eliminations all fired
    val incIds = incRows.map(_._1)
    assert(!incIds.contains(105L), "re-crawl survived the persisted fingerprints")
    assert(!incIds.contains(106L), "state near-dup survived the band-key probe")
    assert(incIds.contains(107L) && !incIds.contains(108L) && !incIds.contains(109L),
      s"in-delta dedup wrong: $incIds")
    assert(!incIds.contains(110L) && !incIds.contains(111L))

    // THE property: state ∪ delta-survivors == full re-curate of the union
    val union = st.corpus.unionByName(delta)
    val full = Curate.curate(union, bench, "doc_id", "text")
    assert(rows(full.corpus) == day0Rows ++ incRows,
      s"incremental diverged from full re-curate:\n full=${rows(full.corpus)}\n inc=${day0Rows ++ incRows}")
    full.release()

    // day 2: appendState makes day-1 survivors probe-able — a re-crawl of
    // a day-1 survivor and a near-dup of it must now both die
    CurateIncremental.appendState(inc.corpus, "doc_id", "text", root)
    inc.release()
    val st2 = CurateIncremental.loadState(spark, root)
    val fr = fresh.split(" ")
    val delta2 = Seq(
      (200L, fresh),                                // exact re-crawl of day-1 survivor
      (201L, fr.take(fr.length * 4 / 5).mkString(" ")), // near-dup of day-1 survivor
      (202L, gen())                                 // genuinely new
    ).toDF("doc_id", "text")
    val inc2 = CurateIncremental.curateDelta(delta2, bench, "doc_id", "text", st2)
    assert(rows(inc2.corpus).map(_._1) == Set(202L))
    inc2.release()
  }

  test("bootstrap + daily: the two-call operational surface maintains state across days") {
    import graft.ops.CurateIncremental
    val bench = Seq((999L, "benchmark holdout nothing shared here at all"))
      .toDF("doc_id", "text")
    // every trigram contains an i-unique token, so distinct docs share no
    // shingles and survive near-dup intact; stopword density clears the
    // quality floor
    val mk = (i: Long) => s"the alpha$i of the beta$i and the gamma$i is " +
      s"a delta$i in the epsilon$i to the zeta$i it is a eta$i of the theta$i"
    val root = java.nio.file.Files.createTempDirectory("graft-daily-").toString
    val day0 = CurateIncremental.bootstrap(
      (0L until 6L).map(i => (i, mk(i))).toDF("doc_id", "text"),
      bench, "doc_id", "text", root)
    assert(day0.corpus.count() == 6)
    day0.release()
    // day 1: one new doc + one re-crawl of a day-0 survivor
    val day1 = CurateIncremental.daily(
      Seq((100L, mk(100L)), (101L, mk(2L))).toDF("doc_id", "text"),
      bench, "doc_id", "text", root)
    assert(day1.corpus.select("doc_id").as[Long].collect().toSet == Set(100L))
    day1.release()
    // day 2: a re-crawl of DAY 1's survivor must now die too — daily()
    // appended day 1's state without any manual bookkeeping
    val day2 = CurateIncremental.daily(
      Seq((200L, mk(100L)), (201L, mk(201L))).toDF("doc_id", "text"),
      bench, "doc_id", "text", root)
    assert(day2.corpus.select("doc_id").as[Long].collect().toSet == Set(201L))
    day2.release()
  }

  test("curateDelta: the existing corpus wins a near-dup tie regardless of ids") {
    import graft.ops.CurateIncremental
    val bench = Seq((999L, "nothing shared with anything here at all today"))
      .toDF("doc_id", "text")
    // the persisted survivor has the LARGER id — a full re-curate would
    // keep the newcomer (min id), but incremental semantics must keep the
    // already-shipped doc and drop the newcomer
    val kept = "the fox of the mill and the river is a village in the " +
      "meadow to the team it is a plan of the page and the list is here"
    val st = CurateIncremental.buildState(
      Seq((50L, kept)).toDF("doc_id", "text"), "doc_id", "text")
    // dropRight(3) keeps Jaccard at 0.89 and (checked) an LSH band
    // collision under the default 3×4 config — take(4/5) missed all bands
    val toks = kept.split(" ")
    val delta = Seq((10L, toks.dropRight(3).mkString(" ")))
      .toDF("doc_id", "text")
    val r = CurateIncremental.curateDelta(delta, bench, "doc_id", "text", st)
    assert(r.corpus.count() == 0, "newcomer with a smaller id displaced a shipped survivor")
    r.release()
  }

  test("curate: opt-in boilerplate and chunking stages bracket the pipeline") {
    import graft.ops.Curate
    val body1 = (1 to 30).map(i => s"alpha$i the of and is").mkString(" ")
    val body2 = (1 to 30).map(i => s"beta$i the of and is").mkString(" ")
    val footer = "all rights reserved"
    val docs = Seq(
      (1L, s"$body1\n$footer"),
      (2L, s"$body2\n$footer"),
      (3L, s"$body1\n$footer"), // exact dup of 1 ONLY once the footer goes
      (4L, footer)              // pure boilerplate: dropped at stage 0
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout phrase nothing shared here at all"))
      .toDF("doc_id", "text")
    val r = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(boilerplateMaxDocs = Some(2L), chunk = Some((40, 10))))
    val chunks = r.corpus.collect()
    // survivors: docs 1 and 2 (3 deduped against 1, 4 emptied) — chunked
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L), byDoc.keySet.toString)
    // 150 tokens, window 40, stride 30 → 1 + ceil(110/30) = 5 chunks/doc
    assert(byDoc(1L).length == 5, byDoc(1L).length.toString)
    chunks.foreach { c =>
      assert(!c.getAs[String]("chunk_text").contains(footer))
      // every chunk of a doc carries the doc's single split
      assert(Set("train", "val", "test").contains(c.getAs[String]("split")))
    }
    assert(byDoc(1L).map(_.getAs[String]("split")).toSet.size == 1)
    assert(r.stats.head().getLong(0) == 3L) // nb_input counts post-boilerplate
    r.release()
  }

  test("curate: opt-in temperature stage balances sources; default leaves counts alone") {
    import graft.ops.Curate
    // 50 rare vs 800 dominant unique docs, all passing every other stage
    val docs = ((0 until 50).map(i => (i.toLong, "rare")) ++
      (1000 until 1800).map(i => (i.toLong, "big")))
      .map { case (id, src) =>
        (id, src, (1 to 12).map(j => s"w${id}x$j the of and is").mkString(" "))
      }.toDF("doc_id", "source", "text")
    val bench = Seq((9999L, "benchmark holdout nothing shared at all"))
      .toDF("doc_id", "text")
    // near-dup off (threshold > 1), quality floor 0 — isolate the stage
    val base = Curate.Config(nearDupThreshold = 1.5, qualityFloor = 0.0)
    val off = Curate.curate(docs, bench, "doc_id", "text", base)
    assert(off.corpus.count() == 850L)
    off.release()
    val on = Curate.curate(docs, bench, "doc_id", "text",
      base.copy(temperatureBalanceCol = Some("source")))
    val bySrc = on.corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rarest source keeps everything; dominant shrinks toward
    // 800·√(50/800) = 200 (hash-grid wobble tolerated)
    assert(bySrc("rare") == 50L, bySrc.toString)
    assert(math.abs(bySrc("big") - 200.0) < 60, bySrc.toString)
    // splits still assigned on the balanced survivors
    assert(on.corpus.select("split").distinct().count() == 3)
    on.release()
  }

  test("curate: opt-in quantile stage keeps the top fraction per group; default leaves counts alone") {
    import graft.ops.Curate
    // same 50/800 fixture as the temperature test: equal quality scores
    // everywhere, so the quantile cut falls back to the id tiebreak and
    // the kept sets are exactly predictable
    val docs = ((0 until 50).map(i => (i.toLong, "rare")) ++
      (1000 until 1800).map(i => (i.toLong, "big")))
      .map { case (id, src) =>
        (id, src, (1 to 12).map(j => s"w${id}x$j the of and is").mkString(" "))
      }.toDF("doc_id", "source", "text")
    val bench = Seq((9999L, "benchmark holdout nothing shared at all"))
      .toDF("doc_id", "text")
    val base = Curate.Config(nearDupThreshold = 1.5, qualityFloor = 0.0)
    val on = Curate.curate(docs, bench, "doc_id", "text",
      base.copy(qualityQuantile = Some(("source", 0.5))))
    val bySrc = on.corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every group halves — the relative cut can't empty the small group
    assert(bySrc == Map("rare" -> 25L, "big" -> 400L), bySrc.toString)
    // all-tied scores → the kept half is the id-smallest half, per group
    val rareKept = on.corpus.filter(col("source") === "rare")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rareKept == (0L until 25L), s"tie fallback must keep smallest ids: $rareKept")
    assert(on.corpus.select("split").distinct().count() == 3)
    on.release()
  }

  test("splitLeakage flags only content groups that straddle splits") {
    import graft.ops.Sampling
    val df = Seq(
      (1L, "same content here", "train"),
      (2L, "same content here", "test"), // straddles → flagged
      (3L, "other content now", "train"),
      (4L, "other content now", "train"), // dup, same split → clean
      (5L, "unique snowflake doc", "val")
    ).toDF("doc_id", "text", "split")
    val out = Sampling.splitLeakage(df, "text", "doc_id", "split").collect()
    assert(out.length == 1, out.mkString(","))
    assert(out(0).getAs[Long]("min_id") == 1L)
    assert(out(0).getAs[Long]("nb_splits") == 2L)
  }

  test("capPerGroup: at most k per group, hash-deterministic, partition-stable") {
    import graft.ops.Sampling
    val df = (0L until 200L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val out = Sampling.capPerGroup(df, "src", "id", 10)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.size == 4 && counts.values.forall(_ == 10L), counts.toString)
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.capPerGroup(df.repartition(13), "src", "id", 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b) // same survivors at any partition count
    // survivors are exactly the k hash-smallest keys per group
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = (0L until 200L).groupBy(_ % 4).values
      .flatMap(g => g.sortBy(i => (h(i), i)).take(10)).toSeq.sorted
    assert(a == expect)
  }

  test("packSequential properties: ids preserved, bins contiguous, fill bounded") {
    import graft.ops.Packing
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      (i.toLong, (rnd.nextInt(120) + 1).toLong, (i % 7).toLong))
    val df = rows.toDF("id", "ntok", "grp")
    val out = Packing.packSequential(df, "id", "ntok", col("grp"), cap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == rows.map(_._1).toSet) // no doc lost or invented
    val sizes = rows.map(r => r._1 -> r._2).toMap
    // every bin fits the cap unless it holds a single oversized doc
    out.groupBy(o => (o._2, o._3)).foreach { case ((g, b), docs) =>
      val fill = docs.map(d => sizes(d._1)).sum
      assert(fill <= 100L || docs.size == 1, s"grp $g bin $b fill $fill n=${docs.size}")
    }
    // bins are contiguous from 0 within each group, non-decreasing in id order
    out.groupBy(_._2).foreach { case (g, docs) =>
      val byId = docs.sortBy(_._1).map(_._3).toSeq
      assert(byId.head == 0L, s"grp $g starts at bin ${byId.head}")
      byId.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b == a || b == a + 1, s"grp $g bin jump $a -> $b")
        case _ =>
      }
    }
  }

  test("termWeights: tf, corpus df, and rarity scaling are exact") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")
    ).toDF("doc_id", "text")
    val w = graft.ops.TextAnalysis.termWeights(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(w((1L, "apple")) == ((2L, 1L, 6.0)))  // tf=2, df=1 → 2×3/1
    assert(w((1L, "banana")) == ((1L, 2L, 1.5))) // tf=1, df=2 → 3/2
    assert(w((3L, "durian")) == ((1L, 1L, 3.0)))
    assert(w.size == 5, w.toString)
  }

  test("simhashNearDups: banded candidates, pigeonhole boundary, exact popcount") {
    val x = 0x0123456789abcdefL
    val df = Seq(
      (1L, x),
      (2L, x ^ 0x3L),                    // 2 bits in band 0 → 3 shared bands
      (3L, ~x),                          // every band differs → never candidate
      (4L, x ^ 0x0001000100010001L)      // 1 bit per band: hamming 4 but NO
    ).toDF("id", "h")                    //   shared band (pigeonhole boundary)
    val out = Dedup.simhashNearDups(df, "id", "h",
        bands = 4, width = 16, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 2)), out.toString)
  }

  test("ngramOverlap: planted leak flagged with exact shared-gram count") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "own words here alpha beta gamma delta epsilon tail"),
      (2L, "completely different content nothing shared at all"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramOverlap(corpus, bench, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares exactly "alpha beta gamma delta epsilon"; 2 shares
    // nothing; 3 has < 5 tokens and is guarded out
    assert(out == Map(1L -> 1L), out.toString)
  }

  test("mixtureSample: per-source fractions, partition-stable, default fallback") {
    import graft.ops.Sampling
    val df = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("k", "src")
    val fr = Map("a" -> 0.75, "b" -> 0.25)
    val kept = Sampling.mixtureSample(df, "k", "src", fr)
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ≈ 500×192/256 = 375 and 500×64/256 = 125
    assert(math.abs(counts("a") - 375) < 75, counts.toString)
    assert(math.abs(counts("b") - 125) < 60, counts.toString)
    val again = Sampling.mixtureSample(df.repartition(9), "k", "src", fr)
      .select("k").as[Long].collect().toSet
    assert(again == kept.select("k").as[Long].collect().toSet)
    // unknown source → defaultFraction 1.0 keeps everything
    val other = (0 until 100).map(i => (i.toLong, "zzz")).toDF("k", "src")
    assert(Sampling.mixtureSample(other, "k", "src", Map("a" -> 0.1)).count() == 100)
  }

  test("packSequential: first-fit order, exact fit, oversized doc, group isolation") {
    import graft.ops.Packing
    val df = Seq(
      // group 0: 60+40 fill bin 0 exactly (cap 100), 50 opens bin 1,
      // 300 (oversized) gets bin 2 alone, 10 opens bin 3
      (1L, 60L, 0L), (2L, 40L, 0L), (3L, 50L, 0L), (4L, 300L, 0L), (5L, 10L, 0L),
      // group 1 packs independently from bin 0
      (10L, 90L, 1L), (11L, 90L, 1L)
    ).toDF("id", "ntok", "grp")
    val out = Packing.packSequential(df, "id", "ntok", col("grp"), cap = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> (0L, 0L), 2L -> (0L, 0L), 3L -> (0L, 1L), 4L -> (0L, 2L), 5L -> (0L, 3L),
      10L -> (1L, 0L), 11L -> (1L, 1L)), out.toString)
  }

  test("ivfTopKQuantized: planted scaled copies rank 1 through probed cells") {
    // scaled copies are parallel to their source: integer centroid scores
    // scale with the vector, so the copy shares the query's best cell, and
    // its ~10× inner product makes it strictly dominant → rank 1. dim ≠ 64
    // exercises the probe path too.
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }
    val planted = base.take(5).map { case (id, v) => (id + 100L, v.map(_ * 10f)) }
    val corpus = (base ++ planted).toDF("c_id", "c_vec")
    val queries = corpus.filter(col("c_id") < 5)
      .select(col("c_id").as("q_id"), col("c_vec").as("q_vec"))
    val out = Similarity.ivfTopKQuantized(queries, corpus, k = 3,
        nCentroids = 8, nProbes = 4)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    for (i <- 0L until 5L)
      assert(out.contains((i, i + 100L, 1)),
        s"scaled copy of $i not rank-1: ${out.filter(_._1 == i)}")
  }

  test("pqTopK: parallel copies attain the maximal ADC score") {
    import graft.ops.Similarity
    // a scaled copy's per-block code is the query's own ADC maximizer
    // (argmax is scale-invariant), so no candidate can OUT-score it —
    // but coarse codebooks make code-tuple collisions common, so other
    // candidates can TIE and win the id tie-break. The PQ property to
    // assert is score maximality, not rank.
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j).toFloat))
    }
    val planted = base.take(5).map { case (id, v) => (id + 100L, v.map(_ * 10f)) }
    val corpus = (base ++ planted).toDF("c_id", "c_vec")
    val queries = corpus.filter(col("c_id") < 5)
      .select(col("c_id").as("q_id"), col("c_vec").as("q_vec"))
    val rows = Similarity.pqTopK(queries, corpus, k = 60,
        nBlocks = 4, codebookSize = 8)
      .select("q_id", "c_id", "score").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    for (i <- 0L until 5L) {
      val rs = rows(i)
      val maxScore = rs.map(_._3).max
      val copyScore = rs.find(_._2 == i + 100L).get._3
      assert(copyScore == maxScore, s"copy of $i: $copyScore < max $maxScore")
    }
  }

  test("trainPqCodebooks: codewords carry cell magnitude; trained ADC >= fixed on clustered data") {
    import graft.ops.Similarity
    // block 0 of every vector is exactly (3, 0); block 1 is (0, 1) or
    // (0, 2). Spherical k-means finds the directions; the least-squares
    // rescale must recover the magnitudes (3 resp. 1.5 = mean of {1,2}).
    val tiny = (0 until 8).map(i => (i.toLong, Seq(3.0, 0.0, 0.0, (i % 2 + 1).toDouble)))
      .toDF("id", "v")
    val tinyBooks = Similarity.trainPqCodebooks(tiny, "v",
      nBlocks = 2, codebookSize = 2, iters = 3, dim = 4)
    assert(tinyBooks.length == 2)
    // one distinct direction per block → a SHORTER book, never padding
    assert(tinyBooks(0).length == 1 &&
      math.abs(tinyBooks(0).head.head - 3.0) < 1e-9 &&
      math.abs(tinyBooks(0).head(1)) < 1e-9,
      s"block-0 codeword should be (3, 0): ${tinyBooks(0)}")
    assert(tinyBooks(1).length == 1 &&
      math.abs(tinyBooks(1).head(1) - 1.5) < 1e-9,
      s"block-1 codeword should be (0, 1.5): ${tinyBooks(1)}")

    // clustered corpus: 3 axis-aligned clusters with distinct magnitudes
    // and small deterministic jitter — the structure ±1 codebooks cannot
    // represent but trained ones can
    val pts = for { c <- 0 until 3; i <- 0 until 20 } yield {
      val v = Array.tabulate(8)(j => 0.05 * (((c * 20 + i) * 7 + j) % 5 - 2))
      v(c) = (c + 1).toDouble
      ((c * 20 + i).toLong, v.toSeq)
    }
    val df = pts.toDF("id", "v")
    val corpus = df.select(col("id").as("c_id"), col("v").as("c_vec"))
    val queries = df.filter(col("id") % 10 === 0)
      .select(col("id").as("q_id"), col("v").as("q_vec"))
    val truth = Similarity.cosineTopK(queries, corpus, 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val books = Similarity.trainPqCodebooks(df, "v",
      nBlocks = 2, codebookSize = 4, iters = 4, dim = 8)
    def recall(tb: Seq[Seq[Seq[Double]]]) = {
      val got = Similarity.pqTopK(queries, corpus, 5,
          nBlocks = 2, codebookSize = 4, dim = 8, trained = tb)
        .select("q_id", "c_id").as[(Long, Long)].collect().toSet
      (got intersect truth).size.toDouble / truth.size
    }
    val (rFixed, rTrained) = (recall(Nil), recall(books))
    assert(rTrained >= rFixed,
      s"trained books recall $rTrained < fixed ±1 recall $rFixed")

    // trained books round-trip bit-exact through IndexStore and give
    // identical rankings — the artifact contract for an offline trainer
    val root = java.nio.file.Files.createTempDirectory("graft-pqtrain-").toString
    graft.ops.IndexStore.savePqCodebooks(spark, books, s"$root/books")
    val loaded = graft.ops.IndexStore.loadPqCodebooks(spark, s"$root/books")
    assert(loaded == books.map(_.map(_.toVector).toVector).toVector)
    assert(recall(loaded) == rTrained)
  }

  test("ivfPqTopK: copy reaches its query through a shared cell, maximal ADC score") {
    import graft.ops.Similarity
    // parallel copy: scale-invariant cell assignment puts it in the
    // query's own best cell (always probed), and its codes are the ADC
    // maximizers — so it must appear among the candidates with the top
    // score (rank can tie under coarse codebooks, score cannot be beaten)
    val base = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 16 + j).toFloat))
    }
    val planted = base.take(5).map { case (id, v) => (id + 100L, v.map(_ * 10f)) }
    val corpus = (base ++ planted).toDF("c_id", "c_vec")
    val queries = corpus.filter(col("c_id") < 5)
      .select(col("c_id").as("q_id"), col("c_vec").as("q_vec"))
    val rows = Similarity.ivfPqTopK(queries, corpus, k = 60,
        nCentroids = 8, nProbes = 4, nBlocks = 4, codebookSize = 8)
      .select("q_id", "c_id", "score").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    for (i <- 0L until 5L) {
      val rs = rows(i)
      val copy = rs.find(_._2 == i + 100L)
      assert(copy.isDefined, s"copy of $i not among candidates")
      assert(copy.get._3 == rs.map(_._3).max,
        s"copy of $i: ${copy.get._3} < max ${rs.map(_._3).max}")
    }
  }

  test("embeddingNearDupsQuantized: planted pairs found, bit-stable under repartition") {
    val e = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).limit(100)
    val n = e.count()
    val base = e.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val planted = base.select((col("id") + 10000L).as("id"),
      transform(col("v"), x => x * lit(1.0009765625)).as("v"))
    val corpus = base.unionByName(planted)
    val pairs = Similarity.embeddingNearDupsQuantized(corpus, "id", "v",
      threshold = 0.999)
    val rows = pairs.collect().toSet
    val ids = rows.map(r => (r.getLong(0), r.getLong(1)))
    val hits = (0L until n).count(i => ids.contains((i, i + 10000L)))
    assert(hits >= (n * 9 / 10), s"only $hits/$n planted quantized pairs found")
    // integer sketch + pinned-order IEEE cosine ⇒ identical rows (cosine
    // bits included) at any partitioning
    val again = Similarity.embeddingNearDupsQuantized(
      corpus.repartition(7), "id", "v", threshold = 0.999).collect().toSet
    assert(again == rows)
  }

  test("embeddingNearDups finds planted near-identical vectors, never all-pairs") {
    val e = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).limit(100)
    // plant: copies with one component nudged — cosine ≈ 1 with source
    val planted = e.withColumn("vec_id", col("vec_id") + 10000L)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(1.001f)))
    val corpus = e.unionByName(planted)
    val pairs = Similarity.embeddingNearDups(corpus, "vec_id", "embedding",
        threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 100L).count(i => pairs.contains((i, i + 10000L)))
    assert(found >= 90, s"only $found/100 planted near-dup pairs found")
  }

  test("multimodal: stub decode plumbing — schema, batch, sizes") {
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.syntheticMedia(spark, docs, "doc_id", "text")
    val feats = Multimodal.decodeFeatures(media)
    val text0 = docs.filter(col("doc_id") === 0).head().getAs[String]("text")
    val row = feats.filter(col("media_id") === 0).head()
    assert(row.n_bytes == text0.getBytes("UTF-8").length)
    assert(row.histogram.length == 16)
    assert(math.abs(row.histogram.sum - 1.0) < 1e-9) // normalized
    assert(row.width == ((text0(0).toInt << 8) | text0(1).toInt)) // fake header = first bytes
    val frames = Multimodal.frameSampleStub(media, stride = 64)
    assert(frames.columns.toSeq == Seq("media_id", "frame_offset", "frame_hash"))
    assert(frames.count() > 0)
    val repart = Multimodal.repartitionBySize(media.toDF(), "bytes", 16 * 1024)
    assert(repart.rdd.getNumPartitions >= 2) // 500 docs × ~300 B ≫ 16 KiB target
  }

  // A real 77-byte 2×2 RGB PNG: (0,0)=black, (1,0)=white, (0,1)=red,
  // (1,1)=blue. Rec.601 integer luminances: 0, 255, 76, 29 → mean 90.0,
  // histogram bins 0/1/4/15 at 0.25 each.
  private val png2x2: Array[Byte] = Array[Int](
    -119, 80, 78, 71, 13, 10, 26, 10, 0, 0, 0, 13,
    73, 72, 68, 82, 0, 0, 0, 2, 0, 0, 0, 2,
    8, 2, 0, 0, 0, -3, -44, -102, 115, 0, 0, 0,
    20, 73, 68, 65, 84, 120, -100, 99, 96, 96, 96, -8,
    -1, -1, 63, -61, 127, 6, 16, 3, 0, 33, -20, 4,
    -4, -124, -21, -3, -124, 0, 0, 0, 0, 73, 69, 78,
    68, -82, 66, 96, -126).map(_.toByte)

  test("ImageIoCodec decodes a real 2x2 PNG byte literal (golden)") {
    assert(Multimodal.ImageIoCodec.available)
    val f = Multimodal.ImageIoCodec.decode(
      Multimodal.MediaRow(1L, "image/png", png2x2))
    assert(f.width == 2 && f.height == 2)
    assert(f.n_bytes == 77)
    assert(f.mean_byte == 90.0) // (0 + 255 + 76 + 29) / 4
    val expectedHist = Array.tabulate(16)(i =>
      if (Set(0, 1, 4, 15)(i)) 0.25 else 0.0)
    assert(f.histogram.toSeq == expectedHist.toSeq)
  }

  test("ImageIoCodec through the Spark decode path + stub fallback") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val corruptPng = png2x2.take(40) // valid signature, truncated body
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", png2x2),
      Multimodal.MediaRow(2L, "application/octet-stream", garbage),
      Multimodal.MediaRow(3L, "image/png", corruptPng)
    ).toDS()
    val feats = Multimodal.decodeFeatures(media, Multimodal.ImageIoCodec)
      .collect().map(f => f.media_id -> f).toMap
    // real decode for the valid PNG
    assert(feats(1L).width == 2 && feats(1L).mean_byte == 90.0)
    // non-image and corrupt payloads fall back to the stub, bit-for-bit,
    // without failing the partition (Array equality is by reference, so
    // compare the histogram separately)
    def same(a: Multimodal.MediaFeatures, b: Multimodal.MediaFeatures) = {
      assert(a.histogram.toSeq == b.histogram.toSeq)
      assert((a.media_id, a.kind, a.n_bytes, a.width, a.height, a.mean_byte)
        == (b.media_id, b.kind, b.n_bytes, b.width, b.height, b.mean_byte))
    }
    same(feats(2L), Multimodal.StubCodec.decode(
      Multimodal.MediaRow(2L, "application/octet-stream", garbage)))
    same(feats(3L), Multimodal.StubCodec.decode(
      Multimodal.MediaRow(3L, "image/png", corruptPng)))
  }

  // A real 60-byte 2-frame animated GIF, written by the JDK GIF writer
  // (non-interlaced — the JDK reader mis-rasterizes tiny interlaced GIFs):
  // 2×2 frames, frame 0 = black/white checkerboard, frame 1 = its inverse.
  private val gif2frames: Array[Byte] = Array[Int](
    71, 73, 70, 56, 57, 97, 2, 0, 2, 0, -16, 0,
    0, 0, 0, 0, -1, -1, -1, 44, 0, 0, 0, 0,
    2, 0, 2, 0, 0, 8, 7, 0, 1, 4, 8, 0,
    32, 32, 0, 44, 0, 0, 0, 0, 2, 0, 2, 0,
    0, 8, 7, 0, 3, 0, 0, 16, 32, 32, 0, 59).map(_.toByte)

  test("GifDemuxer demuxes a real 2-frame GIF byte literal (golden)") {
    assert(Multimodal.ImageIoCodec.available)
    def demux(stride: Int) = Multimodal.GifDemuxer.frames(
      Multimodal.MediaRow(7L, "image/gif", gif2frames), stride).toVector
    val frames = demux(1)
    // frame_offset is the frame INDEX within the container
    assert(frames.map(_.frame_offset) == Vector(0, 1))
    // golden ARGB raster hashes: Arrays.hashCode over row-major getRGB of
    // (B W / W B) and (W B / B W) — recomputed from the decoded pixels
    assert(frames(0).frame_hash == -1609690207)
    assert(frames(1).frame_hash == 537764641)
    assert(frames(0).frame_hash != frames(1).frame_hash)
    // stride samples every stride-th frame
    assert(demux(2).map(_.frame_offset) == Vector(0))
    // non-GIF and torn payloads fall back to the stub, never throw
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    def viaGif(id: Long, bytes: Array[Byte]) = Multimodal.GifDemuxer.frames(
      Multimodal.MediaRow(id, "application/octet-stream", bytes), 8).toVector
    def viaStub(id: Long, bytes: Array[Byte]) = Multimodal.StubDemuxer.frames(
      Multimodal.MediaRow(id, "application/octet-stream", bytes), 8).toVector
    assert(viaGif(8L, garbage) == viaStub(8L, garbage))
    assert(viaGif(9L, gif2frames.take(30)) == viaStub(9L, gif2frames.take(30)))
  }

  test("GifDemuxer through the Spark frameSample path with mixed payloads") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "image/gif", gif2frames),
      Multimodal.MediaRow(2L, "application/octet-stream", garbage)
    ).toDS()
    val byId = Multimodal.frameSample(media, stride = 1, Multimodal.GifDemuxer)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(byId(1L) == 2L) // two real GIF frames
    // the stub emits one frame per byte offset up to len-4 (stride 1)
    assert(byId(2L) == 29L)
  }

  test("multimodal features compose into the embedding near-dup + ANN index path") {
    import spark.implicits._
    import graft.ops.{AnnIndex, Similarity}
    assert(Multimodal.ImageIoCodec.available)
    // a transcode VARIANT of the checkerboard literal: a GIF comment
    // extension block (0x21 0xFE, "dup", terminator) spliced in after the
    // global palette — different container bytes, bit-identical raster.
    // (Round-tripping through the JDK GIF WRITER is not raster-lossless
    // at 2x2 — the same JDK quirk GifDemuxer documents — so the variant
    // is authored at the byte level, as a real transcoder would differ in
    // metadata, not pixels.)
    val comment = Array[Int](0x21, 0xFE, 3, 'd', 'u', 'p', 0).map(_.toByte)
    val gifReenc = gif2frames.take(19) ++ comment ++ gif2frames.drop(19)
    assert(!java.util.Arrays.equals(gifReenc, gif2frames),
      "re-encode must produce different bytes")
    // the composed pipeline a training-data user runs: decode features →
    // histogram as the embedding → near-dup collapse + persisted index;
    // png2x2 (black/white/red/blue) is the visually-DISTINCT bystander
    val media = Seq(
      Multimodal.MediaRow(1L, "image/gif", gif2frames),
      Multimodal.MediaRow(2L, "image/gif", gifReenc),
      Multimodal.MediaRow(3L, "image/png", png2x2)
    ).toDS()
    val emb = Multimodal.decodeFeatures(media, Multimodal.ImageIoCodec)
      .toDF().select(col("media_id").as("id"), col("histogram").as("v"))
    val pairs = Similarity.embeddingNearDups(emb, "id", "v",
      threshold = 0.99, nPlanes = 8, prefixBits = 4,
      seeds = Seq(42L, 1042L), dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"visually-identical re-encodes must near-dup (and only them): $pairs")
    // ANN index over the same features: the re-encode is its twin's top
    // neighbor with a perfect normalized dot (identical histograms)
    val root = java.nio.file.Files.createTempDirectory("graft-mmann-").toString
    AnnIndex.build(emb.select(col("id").as("c_id"), col("v").as("c_vec")),
      "c_id", "c_vec", root,
      AnnIndex.Config(nCells = 2, kmeansIters = 2, dim = 16), buckets = 2)
    val hit = AnnIndex.topK(
      emb.filter(col("id") === 2L)
        .select(col("id").as("q_id"), col("v").as("q_vec")),
      root, k = 1, nProbes = 2)
      .select("c_id").as[Long].collect()
    assert(hit.toSeq == Seq(1L),
      s"the re-encode's nearest indexed neighbor must be its twin: ${hit.toSeq}")
  }

  test("frameSample demux seam is pluggable") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(7L, "video/fake",
      Array.tabulate[Byte](256)(_.toByte))).toDS()
    // stub demuxer: stride-64 over 253 offsets → offsets 0,64,128,192
    val stub = Multimodal.frameSample(media, stride = 64)
      .select("frame_offset").as[Int].collect().sorted
    assert(stub.toSeq == Seq(0, 64, 128, 192))
    // a custom demuxer drops in with no other plumbing changes
    object EveryByteOnce extends Multimodal.Demuxer {
      override def frames(r: Multimodal.MediaRow, stride: Int) =
        Iterator.single(Multimodal.Frame(r.media_id, -1, r.bytes.length))
    }
    val custom = Multimodal.frameSample(media, 64, EveryByteOnce).collect()
    assert(custom.length == 1 && custom(0).getInt(1) == -1
      && custom(0).getInt(2) == 256)
  }

  // golden WAV byte literal: canonical 44-byte RIFF/WAVE header (PCM,
  // mono, 8-bit, 8 kHz) + 2500 deterministic samples — built field by
  // field, independent of javax.sound, so a header mis-parse shifts the
  // payload and breaks the window hashes below
  private lazy val wav2500: Array[Byte] = {
    val pcm = Array.tabulate[Byte](2500)(i => ((i * 13 + 7) % 256).toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(pcm.length)
      .put(pcm)
    bb.array()
  }

  test("AudioWavDemuxer windows a real WAV byte literal (golden)") {
    val pcm = wav2500.drop(44)
    def demux(stride: Int) = Multimodal.AudioWavDemuxer.frames(
      Multimodal.MediaRow(11L, "audio/wav", wav2500), stride).toVector
    val frames = demux(1)
    // 2500 samples / 1024-frame windows → 3 windows; offset = window index
    assert(frames.map(_.frame_offset) == Vector(0, 1, 2))
    // window hashes are over the raw PCM payload bytes (header skipped)
    def h(from: Int, until: Int) = java.util.Arrays.hashCode(
      java.util.Arrays.copyOfRange(pcm, from, math.min(until, pcm.length)))
    assert(frames.map(_.frame_hash) ==
      Vector(h(0, 1024), h(1024, 2048), h(2048, 3072)))
    assert(demux(2).map(_.frame_offset) == Vector(0, 2))
    // non-WAV and truncated payloads fall back to the stub, never throw
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    def viaWav(id: Long, bytes: Array[Byte]) = Multimodal.AudioWavDemuxer.frames(
      Multimodal.MediaRow(id, "application/octet-stream", bytes), 8).toVector
    def viaStub(id: Long, bytes: Array[Byte]) = Multimodal.StubDemuxer.frames(
      Multimodal.MediaRow(id, "application/octet-stream", bytes), 8).toVector
    assert(viaWav(12L, garbage) == viaStub(12L, garbage))
    assert(viaWav(13L, wav2500.take(40)) == viaStub(13L, wav2500.take(40)))
  }

  // minimal ISO-BMFF fixture, built box by box independent of the parser
  // under test: ftyp + mdat (4 coded samples in 2 chunks) + moov with one
  // 'vide' trak whose stbl (stsz/stsc/stco[/stss]) references the mdat
  // samples by ABSOLUTE file offset — so any box-walk or table-expansion
  // mis-parse shifts a sample range and breaks the golden hashes below
  private def mp4Fixture(withStss: Boolean): (Array[Byte], Seq[Array[Byte]]) = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
    }
    val samples = Seq("AAAA", "BBBBB", "CC", "DDDDDD").map(_.getBytes("US-ASCII"))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0), "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", samples.flatten.toArray)
    val chunk1 = ftyp.length + 8                      // samples 1-2
    val chunk2 = chunk1 + samples(0).length + samples(1).length // samples 3-4
    val stbl = box("stbl",
      box("stsz", be32(0), be32(0), be32(4), samples.map(s => be32(s.length)).flatten.toArray),
      box("stsc", be32(0), be32(1), be32(1), be32(2), be32(1)), // chunks of 2 samples
      box("stco", be32(0), be32(2), be32(chunk1), be32(chunk2)),
      if (withStss) box("stss", be32(0), be32(2), be32(1), be32(3)) else Array.empty[Byte])
    val trak = box("trak", box("mdia",
      box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII")),
      box("minf", stbl)))
    (ftyp ++ mdat ++ box("moov", trak), samples)
  }

  test("Mp4Demuxer extracts real sample byte ranges from the box tree (golden)") {
    def h(bytes: Array[Byte]) = java.util.Arrays.hashCode(bytes)
    // no stss → every sample is a sync sample, per spec
    val (mp4All, samples) = mp4Fixture(withStss = false)
    def demux(bytes: Array[Byte], stride: Int) = Multimodal.Mp4Demuxer.frames(
      Multimodal.MediaRow(21L, "video/mp4", bytes), stride).toVector
    val all = demux(mp4All, 1)
    assert(all.map(_.frame_offset) == Vector(0, 1, 2, 3))
    // golden: each hash is over the sample's coded bytes sliced out of mdat
    assert(all.map(_.frame_hash) == samples.map(h).toVector)
    assert(demux(mp4All, 3).map(_.frame_offset) == Vector(0, 3))
    // stss [1,3] → only sync samples (keyframes) are eligible
    val (mp4Sync, _) = mp4Fixture(withStss = true)
    val sync = demux(mp4Sync, 1)
    assert(sync.map(_.frame_offset) == Vector(0, 2))
    assert(sync.map(_.frame_hash) == Vector(h(samples(0)), h(samples(2))))
    assert(demux(mp4Sync, 2).map(_.frame_offset) == Vector(0))
    // garbage and truncated payloads fall back to the stub, never throw
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    def viaStub(id: Long, bytes: Array[Byte]) = Multimodal.StubDemuxer.frames(
      Multimodal.MediaRow(id, "x", bytes), 8).toVector
    assert(Multimodal.Mp4Demuxer.frames(
      Multimodal.MediaRow(22L, "x", garbage), 8).toVector == viaStub(22L, garbage))
    assert(Multimodal.Mp4Demuxer.frames(
      Multimodal.MediaRow(23L, "x", mp4All.take(30)), 8).toVector
      == viaStub(23L, mp4All.take(30)))
    // a hostile uniform-stsz claiming 2^31-1 samples must NOT allocate —
    // the count is bounded by what the payload could hold, so this falls
    // back to the stub instead of dying on an OutOfMemoryError the
    // NonFatal contract can't catch
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def bx(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
    }
    val hostile = bx("ftyp", "isom".getBytes("US-ASCII"), be32(0)) ++
      bx("moov", bx("trak", bx("mdia",
        bx("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII")),
        bx("minf", bx("stbl",
          bx("stsz", be32(0), be32(1), be32(Int.MaxValue)), // uniform=1, n=2^31-1
          bx("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
          bx("stco", be32(0), be32(1), be32(0)))))))
    assert(Multimodal.Mp4Demuxer.frames(
      Multimodal.MediaRow(24L, "x", hostile), 8).toVector == viaStub(24L, hostile))
  }

  test("videoNearDups: MP4 PNG-keyframe aHash pairing, re-encode + trim (golden)") {
    // 16x16 rasters whose 8x8 aHash cells are 2x2 pixel blocks driven by
    // a 64-bit mask — aHash64 recovers the mask EXACTLY (all-white cells
    // sit above the global mean, all-black below), so the pairing layer
    // is tested against known hashes while the bytes still cross a real
    // PNG/BMP encode + MP4 demux + ImageIO decode
    def raster(mask: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (c <- 0 until 64; dy <- 0 until 2; dx <- 0 until 2)
        img.setRGB((c % 8) * 2 + dx, (c / 8) * 2 + dy,
          if (((mask >> c) & 1L) == 1L) 0xffffff else 0x000000)
      img
    }
    def enc(mask: Long, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(raster(mask), fmt, bos)
      bos.toByteArray
    }
    // single-chunk all-sync MP4: ftyp + mdat(samples) + moov/trak('vide')
    def mp4(samples: Seq[Array[Byte]]): Array[Byte] = {
      def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
        val body = payload.flatten.toArray
        be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
      }
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0))
      val mdat = box("mdat", samples.flatten.toArray)
      val stbl = box("stbl",
        box("stsz", be32(0), be32(0), be32(samples.length),
          samples.flatMap(s => be32(s.length).toSeq).toArray),
        box("stsc", be32(0), be32(1), be32(1), be32(samples.length), be32(1)),
        box("stco", be32(0), be32(1), be32(ftyp.length + 8)))
      ftyp ++ mdat ++ box("moov", box("trak", box("mdia",
        box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII")),
        box("minf", stbl))))
    }
    val masks = Seq(0x00000000FFFFFFFFL, 0xFFFFFFFF00000000L,
      0x5555555555555555L, 0x7AAAAAAAAAAAAAAAL)
    val other = Seq(0x0F0F0F0F0F0F0F0FL, 0x70F0F0F0F0F0F0F0L,
      0x00FF00FF00FF00FFL, 0x7F00FF00FF00FF00L)
    val media = Seq(
      Multimodal.MediaRow(1L, "video/mp4", mp4(masks.map(enc(_, "png")))),
      Multimodal.MediaRow(2L, "video/mp4", mp4(masks.map(enc(_, "bmp")))), // re-encode
      Multimodal.MediaRow(3L, "video/mp4", mp4(masks.drop(1).map(enc(_, "png")))), // trim
      Multimodal.MediaRow(4L, "video/mp4", mp4(other.map(enc(_, "png"))))
    ).toDS()
    // the hash feed recovers the masks exactly through PNG and BMP alike
    val hashes = Multimodal.videoFrameHashes(media, stride = 1)
      .as[(Long, Int, Long)].collect().toSet
    assert(hashes.filter(_._1 == 1L).map(_._3) == masks.toSet,
      s"PNG keyframe hashes must equal the planted masks: $hashes")
    assert(hashes.filter(_._1 == 2L).map(_._3) == masks.toSet,
      "BMP re-encode must hash identically (same rasters)")
    val pairs = Multimodal.videoNearDups(media, stride = 1,
        minSharedFrames = 3L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 4L), (1L, 3L, 3L), (2L, 3L, 3L)),
      s"re-encode pairs on all 4 frames, trim on its surviving 3; " +
        s"the unrelated video never pairs — got $pairs")
  }

  // 3 handcrafted MPEG-1 Layer III frames (128 kbps / 44.1 kHz: 417 bytes,
  // +1 when the padding bit is set) behind a 27-byte ID3v2 tag — built from
  // the header arithmetic directly, so a frame-length mis-parse desyncs the
  // walk and breaks the golden hashes
  private lazy val mp3frames: (Array[Byte], Seq[Array[Byte]]) = {
    def frame(padding: Boolean, fill: Byte): Array[Byte] = {
      val len = 144 * 128000 / 44100 + (if (padding) 1 else 0)
      val f = Array.fill[Byte](len)(fill)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte // sync + MPEG-1 + Layer III
      f(2) = (if (padding) 0x92 else 0x90).toByte // 128 kbps, 44.1 kHz
      f(3) = 0x00
      f
    }
    val frames = Seq(frame(false, 7), frame(true, 11), frame(false, 13))
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 17) ++
      Array.fill[Byte](17)(99) // syncsafe tag length 17
    (id3 ++ frames.flatten, frames)
  }

  test("Mp3Demuxer walks frame syncs behind an ID3 tag (golden)") {
    val (mp3, frames) = mp3frames
    def h(bytes: Array[Byte]) = java.util.Arrays.hashCode(bytes)
    def demux(bytes: Array[Byte], stride: Int) = Multimodal.Mp3Demuxer.frames(
      Multimodal.MediaRow(31L, "audio/mpeg", bytes), stride).toVector
    val all = demux(mp3, 1)
    assert(all.map(_.frame_offset) == Vector(0, 1, 2))
    // each hash covers the frame's full bytes: header + coded payload
    assert(all.map(_.frame_hash) == frames.map(h).toVector)
    assert(demux(mp3, 2).map(_.frame_offset) == Vector(0, 2))
    // a truncated final frame is dropped, not hashed short
    assert(demux(mp3.dropRight(10), 1).map(_.frame_offset) == Vector(0, 1))
    // garbage with an aliased single sync byte falls back to the stub
    // (no second chained frame), as does plain garbage
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    junk(20) = 0xff.toByte; junk(21) = 0xfb.toByte; junk(22) = 0x90.toByte
    def viaStub(id: Long, bytes: Array[Byte]) = Multimodal.StubDemuxer.frames(
      Multimodal.MediaRow(id, "x", bytes), 4).toVector
    assert(Multimodal.Mp3Demuxer.frames(
      Multimodal.MediaRow(32L, "x", junk), 4).toVector == viaStub(32L, junk))
  }

  // MPEG-2 Layer III @ 22.05 kHz (the speech-rip rate), 64 kbps: the
  // 576-sample frames use the halved constant 72·br∕rate = 208 bytes
  private lazy val mp3Mpeg2Frames: (Array[Byte], Seq[Array[Byte]]) = {
    def frame(padding: Boolean, fill: Byte): Array[Byte] = {
      val len = 72 * 64000 / 22050 + (if (padding) 1 else 0)
      val f = Array.fill[Byte](len)(fill)
      f(0) = 0xff.toByte; f(1) = 0xf3.toByte // sync + MPEG-2 + Layer III
      f(2) = (if (padding) 0x82 else 0x80).toByte // 64 kbps, 22.05 kHz
      f(3) = 0x00
      f
    }
    val frames = Seq(frame(false, 3), frame(true, 5), frame(false, 9))
    (frames.flatten.toArray, frames)
  }

  test("Mp3Demuxer parses MPEG-2 22.05 kHz, Layer II, and Layer I frames (golden)") {
    def h(bytes: Array[Byte]) = java.util.Arrays.hashCode(bytes)
    def demux(id: Long, bytes: Array[Byte]) = Multimodal.Mp3Demuxer.frames(
      Multimodal.MediaRow(id, "audio/mpeg", bytes), 1).toVector

    // MPEG-2 Layer III @ 22.05 kHz — 208-byte frames (72·64000∕22050)
    val (m2, m2frames) = mp3Mpeg2Frames
    assert(m2frames.head.length == 208)
    val gotM2 = demux(41L, m2)
    assert(gotM2.map(_.frame_offset) == Vector(0, 1, 2))
    assert(gotM2.map(_.frame_hash) == m2frames.map(h).toVector)

    // MPEG-1 Layer II @ 48 kHz 192 kbps — 576-byte frames (144·192000∕48000)
    def l2frame(fill: Byte): Array[Byte] = {
      val f = Array.fill[Byte](576)(fill)
      f(0) = 0xff.toByte; f(1) = 0xfd.toByte // sync + MPEG-1 + Layer II
      f(2) = 0xa4.toByte // 192 kbps, 48 kHz
      f(3) = 0x00
      f
    }
    val l2 = Seq(l2frame(17), l2frame(19))
    val gotL2 = demux(42L, l2.flatten.toArray)
    assert(gotL2.map(_.frame_offset) == Vector(0, 1))
    assert(gotL2.map(_.frame_hash) == l2.map(h).toVector)

    // MPEG-1 Layer I @ 44.1 kHz 256 kbps — slot-padded length
    // (12·256000∕44100)·4 = 276 bytes
    def l1frame(fill: Byte): Array[Byte] = {
      val f = Array.fill[Byte](276)(fill)
      f(0) = 0xff.toByte; f(1) = 0xff.toByte // sync + MPEG-1 + Layer I
      f(2) = 0x80.toByte // 256 kbps, 44.1 kHz
      f(3) = 0x00
      f
    }
    val l1 = Seq(l1frame(23), l1frame(29))
    val gotL1 = demux(43L, l1.flatten.toArray)
    assert(gotL1.map(_.frame_offset) == Vector(0, 1))
    assert(gotL1.map(_.frame_hash) == l1.map(h).toVector)

    // reserved version bits (01) still reject: force EVERY frame header
    // in the MPEG-2 fixture to the reserved version (frames are 208,
    // 209, 208 bytes → headers at 0, 208, 417) and the walk must fall
    // back to the stub — no chained valid pair remains
    val bad = m2.clone()
    for (off <- Seq(0, 208, 417))
      bad(off + 1) = 0xeb.toByte // sync + reserved version + Layer III
    val viaStub = Multimodal.StubDemuxer.frames(
      Multimodal.MediaRow(44L, "x", bad), 1).toVector
    assert(demux(44L, bad) == viaStub)
  }

  test("every demuxer survives random mutation and truncation of every fixture") {
    val fixtures = Seq(gif2frames, wav2500, mp4Fixture(withStss = true)._1,
      mp3frames._1, mp3Mpeg2Frames._1)
    val demuxers = Seq(Multimodal.GifDemuxer, Multimodal.AudioWavDemuxer,
      Multimodal.Mp4Demuxer, Multimodal.Mp3Demuxer, Multimodal.AutoDemuxer)
    val rnd = new scala.util.Random(20260812L)
    for (fix <- fixtures; trial <- 0 until 40) {
      val mutated = fix.clone()
      // flip a few random bytes, then maybe truncate
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      val payload =
        if (rnd.nextBoolean()) mutated.take(rnd.nextInt(mutated.length + 1))
        else mutated
      for (d <- demuxers) {
        // contract: never throw, never hang — either real frames or the
        // stub fallback, on ANY corrupted payload
        val out = d.frames(
          Multimodal.MediaRow(trial.toLong, "x", payload), 3).toVector
        assert(out.forall(_.media_id == trial.toLong))
      }
    }
  }

  test("AutoDemuxer routes a mixed corpus by magic bytes through one seam") {
    import spark.implicits._
    val garbage = Array.tabulate[Byte](32)(i => (i * 7).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "image/gif", gif2frames),
      Multimodal.MediaRow(2L, "audio/wav", wav2500),
      Multimodal.MediaRow(3L, "application/octet-stream", garbage),
      Multimodal.MediaRow(4L, "video/mp4", mp4Fixture(withStss = false)._1),
      Multimodal.MediaRow(5L, "audio/mpeg", mp3frames._1)
    ).toDS()
    val byId = Multimodal.frameSample(media, stride = 1, Multimodal.AutoDemuxer)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(byId == Map(1L -> 2L, // real GIF frames
                       2L -> 3L, // real PCM windows
                       3L -> 29L, // stub fallback: one per byte offset
                       4L -> 4L, // real MP4 coded samples
                       5L -> 3L)) // real MP3 frames
  }

  test("corpusReport: grouping-sets levels are internally consistent") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "crawl", "en", "the cat sat on the mat and it is a fine day today ok"),
      (2L, "crawl", "fr", "le chat"),
      (3L, "curated", "en", "the dog ran far and it is a good day for a run now"),
      (4L, "curated", "en", "x")
    ).toDF("doc_id", "source", "lang", "text")
    val rep = TextAnalysis.corpusReport(docs, "text", "source", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    // gid: 0 = (source,lang), 1 = (source), 2 = (lang), 3 = grand total
    assert(rep((3L, None, None))._1 == 4L)
    assert(rep((1L, Some("crawl"), None))._1 == 2L)
    assert(rep((2L, None, Some("en")))._1 == 3L)
    assert(rep((0L, Some("curated"), Some("en")))._1 == 2L)
    // every finer level sums exactly to the grand total, per measure
    val total = rep((3L, None, None))
    def sumLevel(gid: Long) = rep.collect { case ((g, _, _), v) if g == gid => v }
      .foldLeft((0L, 0L, 0L, 0.0)) { case ((a, b, c, d), (w, x, y, z)) =>
        (a + w, b + x, c + y, d + z) }
    for (gid <- Seq(0L, 1L, 2L)) {
      val (n, t, c, q) = sumLevel(gid)
      assert((n, t, c) == ((total._1, total._2, total._3)), s"level $gid drifted")
      assert(math.abs(q - total._4) < 1e-9, s"level $gid quality drifted")
    }
  }

  test("dedupCorpusByPriority keeps the preferred source, not the smallest id") {
    val df = Seq(
      (1L, "alpha beta gamma", "crawl"),
      (2L, "alpha beta gamma", "curated"), // same content, higher id, better source
      (3L, "alpha beta gamma", "crawl"),
      (4L, "unique document here", "crawl")
    ).toDF("doc_id", "text", "source")
    val prio = when(col("source") === "curated", 0).otherwise(1)
    val out = Dedup.dedupCorpusByPriority(df, "text", "doc_id", prio)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 4L)) // curated wins over min-id 1
    val minId = Dedup.dedupCorpus(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(minId.toSeq == Seq(1L, 4L)) // the policy this overrides
  }

  test("containmentOnPairs: excerpt containment is 1 where Jaccard is low") {
    val orig = (1 to 20).map(i => s"t$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"t$i").mkString(" ") // prefix of orig
    val df = Seq((1L, orig), (2L, excerpt)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentOnPairs(pairs, df, "doc_id", "text", 3).head()
    assert(r.getAs[Int]("nb_inter") == 6) // all 6 excerpt 3-grams hit
    assert(r.getAs[Double]("containment_b") == 1.0)
    assert(r.getAs[Double]("containment_a") == 6.0 / 18.0)
    val j = Dedup.jaccardOnPairs(pairs, df, "doc_id", "text", 3)
      .head().getAs[Double]("jaccard")
    assert(j < 0.5, s"symmetric threshold would have caught it (j=$j)")
  }

  test("removeBoilerplate drops corpus-frequent lines, keeps order, empty-safe") {
    val docs = (1 to 10).map(i =>
      (i.toLong, s"header common\ncontent line $i\nfooter common")) ++ Seq(
      (11L, "header common\nfooter common"), // pure boilerplate
      (12L, "content a\nheader common\ncontent b"), // order must survive
      (13L, "\n\n")) // zero non-empty lines: must still get its row
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(df, "doc_id", "text", maxDocs = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(3) == (("content line 3", 1L, 2L)))
    assert(out(11) == (("", 0L, 2L))) // all-boilerplate doc survives, empty
    assert(out(12) == (("content a\ncontent b", 2L, 1L)))
    assert(out(13) == (("", 0L, 0L))) // review r12: used to vanish entirely
    assert(out.size == 13)
  }

  test("plan shape: chunkTokens is shuffle-free; boilerplate drop anti-joins") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val chunkPlan = Packing.chunkTokens(df, "doc_id", "text", 5, 2)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), chunkPlan.take(800))
    val bpPlan = TextAnalysis.removeBoilerplate(df, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(bpPlan.contains("LeftAnti"), bpPlan.take(1200))
  }

  test("chunkTokens: sliding windows with overlap, exact boundaries") {
    val df = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ")), // 12 tokens
      (2L, "a b c"), // fits one chunk
      (3L, "")) // empty: no chunks
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", "text", chunkSize = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L)
    assert(d1.length == 4) // stride 3: starts 1, 4, 7, 10
    assert(d1(0)._4 == "w1 w2 w3 w4 w5")
    assert(d1(1)._4 == "w4 w5 w6 w7 w8") // 2-token context overlap
    assert(d1(3) == ((1L, 3, 3, "w10 w11 w12"))) // tail clamps
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(!out.exists(_._1 == 3L))
    assert(d1.map(_._3).sum == 12 + 3 * 2) // coverage: n + (chunks-1)*overlap
  }

  test("spanDedup: canonical occurrence keeps its text, later copies lose the span") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")      // 12-token run
    val subK = (1 to 9).map(i => s"t$i").mkString(" ")         // 9 < k: too short
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, shared),                                            // canonical
      (2L, s"u1 u2 u3 $shared v1 v2 v3"),                      // later copy
      (3L, s"a1 a2 $subK a3 a4"),                              // sub-k dup: kept
      (4L, s"b1 b2 $subK b3 b4"),
      (5L, s"$rep $rep"),                                      // within-doc repeat
      (6L, "x1 x2")                                            // shorter than k
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", k = 10)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("nb_removed"))).toMap
    assert(out.size == 6) // every row comes back, affected or not
    assert(out(1L) == (shared, 0)) // least (id, pos) is canonical
    // doc 2: the 12 borrowed tokens go (3 overlapping windows merge into
    // one maximal span); the unique flanks survive
    assert(out(2L) == ("u1 u2 u3 v1 v2 v3", 12))
    // a 9-token shared run never fills a k=10 window: both docs untouched
    assert(out(3L)._2 == 0 && out(4L)._2 == 0)
    // within-doc repetition: first occurrence canonical, second removed
    assert(out(5L) == (rep, 10))
    assert(out(6L) == ("x1 x2", 0)) // sub-k doc passes through
  }

  test("bigramCommonRatio: corpus-frequent transitions score high, word salad low") {
    val df = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat"),
      (4L, "zz qq ww"),    // bigrams unique corpus-wide
      (5L, "solo")         // <2 tokens: NULL ratio
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCommonRatio(df, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("nb_bigrams"), r.getAs[Long]("nb_common"),
         Option(r.getAs[java.lang.Double]("common_ratio")))).toMap
    assert(out.size == 5)
    // "the cat" occurs 3×, "cat sat" 2×, "cat ran" 1×
    assert(out(1L) == (2L, 2L, Some(1.0)))
    assert(out(2L) == (2L, 1L, Some(0.5)))
    assert(out(4L) == (2L, 0L, Some(0.0)))
    assert(out(5L) == (0L, 0L, None))
  }

  test("semanticNearDups: same-cell planted pair found, cross-cell twin is the documented miss") {
    // centroid 0 = +1⁸, centroid 1 alternates: v1/v2 share cell 0,
    // v3 is near the cell-1 axis; v4 duplicates v1
    val c0 = Seq.fill(8)(1.0)
    val c1 = Seq.tabulate(8)(i => if (i % 2 == 0) 1.0 else -1.0)
    val df = Seq(
      (1L, c0.map(_ * 0.5)),
      (4L, c0.map(_ * 0.5001)),          // jittered copy of v1
      (3L, c1.map(_ * 0.7))              // alone in its cell: no pair
    ).toDF("id", "v")
    val out = Similarity.semanticNearDupsQuantized(df, "id", "v",
        threshold = 0.99, trained = Seq(c0, c1), dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 4L)))
  }

  test("semanticOverlap: planted paraphrase flagged, dissimilar corpus clean, zero vectors dropped") {
    val a = Seq(0.5, 0.5, 0.5, 0.5)
    val corpus = Seq(
      (1L, a),                                  // source of the leaked item
      (2L, Seq(0.9, -0.1, 0.02, -0.5)),         // cosine ~0.15 vs bench: clean
      (3L, Seq(0.0, 0.0, 0.0, 0.0))             // zero norm: never scored
    ).toDF("id", "v")
    val bench = Seq(
      Tuple1(a.map(_ * 1.001)),                 // paraphrase stand-in of doc 1
      Tuple1(Seq(0.0, 0.0, 0.0, 0.0))           // zero bench vector: dropped
    ).toDF("v")
    val out = Similarity.semanticOverlap(corpus, bench, "id", "v", 0.99)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("nb_matches")))
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("curate: opt-in span-dedup stage strips the borrowed run, default leaves it") {
    import graft.ops.Curate
    val run = "the quick brown fox jumps over the lazy dog near the river bank"
    val doc1 = s"a long opening about the state of the project and the team $run"
    // doc 2 borrows the 13-token run verbatim; its flanks are unique, so
    // Jaccard vs doc 1 stays below the near-dup threshold and only the
    // span stage can see the overlap
    val doc2 = s"totally different intro with many other words here $run " +
      "and a closing thought about the plans of the group for the year"
    val docs = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout nothing shared")).toDF("doc_id", "text")
    val withSpan = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(spanDedupK = Some(10)))
    val spanOut = withSpan.corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(spanOut.keySet == Set(1L, 2L)) // nothing dropped, text rewritten
    assert(spanOut(1L).contains(run))     // canonical (least id) keeps it
    assert(!spanOut(2L).contains("quick brown fox"), spanOut(2L))
    assert(spanOut(2L).contains("totally different intro")
      && spanOut(2L).contains("closing thought")) // unique flanks survive
    withSpan.release()
    val default = Curate.curate(docs, bench, "doc_id", "text")
    val defOut = default.corpus.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(defOut(2L).contains(run)) // stage is opt-in
    default.release()
  }

  test("curate: opt-in bigram-LM floor drops word salad the char-level score passes") {
    import graft.ops.Curate
    val phrase = "the users of the service are happy with the results"
    // four distinct prose docs share a 10-token phrase (below spanDedup's
    // reach — that stage is off here anyway — but its bigrams repeat 4x),
    // Jaccard pairwise < 0.5 so near-dup keeps all four
    val prose = Seq(
      (1L, s"alpha notes about features $phrase and more remarks follow"),
      (2L, s"beta report on tooling $phrase plus extra comments too"),
      (3L, s"gamma summary of changes $phrase with final thoughts added"),
      (4L, s"delta review of options $phrase and closing words here"))
    // the salad passes qualityScore (length ok, stopwords present, no
    // punctuation) but none of its bigrams repeat anywhere in the corpus
    val salad = (5L, "of zq the vx and plw of mnb the qrs and wtv the zzk " +
      "plus ooo of rrr the nnn and mmm")
    val docs = (prose :+ salad).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout nothing shared")).toDF("doc_id", "text")
    val r = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(bigramLmFloor = Some((2L, 0.25))))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L), ids.toString)
    r.release()
    val rDef = Curate.curate(docs, bench, "doc_id", "text")
    val idsDef = rDef.corpus.select("doc_id").as[Long].collect().toSet
    assert(idsDef.contains(5L)) // the floor is opt-in
    rDef.release()
  }

  test("trained char-trigram language-ID beats the stopword heuristic on planted minority languages") {
    import graft.ops.TextAnalysis
    // training labels OUTSIDE the heuristic's inventories (Finnish-ish,
    // Italian-ish) plus English
    val train = Seq(
      ("fi", "minä olen iloinen koska aurinko paistaa tänään"),
      ("fi", "me menemme järvelle uimaan koska vesi on lämmintä"),
      ("fi", "hän sanoo että talvi tulee pian ja lunta sataa"),
      ("it", "oggi andiamo alla spiaggia perché il sole splende"),
      ("it", "domani mangiamo la pasta con il formaggio e il vino"),
      ("it", "questa città è bellissima quando piove in primavera"),
      ("en", "the weather is nice today and we are going to the lake"),
      ("en", "tomorrow we will eat dinner and drink coffee together"),
      ("en", "this city is beautiful when it rains in the spring")
    ).toDF("lang", "text")
    val m = TextAnalysis.langIdTrain(train, "lang", "text")
    val held = Seq(
      (1L, "aurinko paistaa ja järvi on lämmin tänään"),
      (2L, "il sole splende e la spiaggia è bellissima"),
      (3L, "the rain in spring is nice and the coffee is warm"),
      (4L, "xy") // below trigram length → und
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langIdPredict(held, "text", m)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "fi", 2L -> "it", 3L -> "en", 4L -> "und"),
      got.toString)
    // the heuristic: no inventory hits on the Finnish doc -> "und"; the
    // Italian doc trips the FRENCH inventory ("la") -> wrong language
    val heur = held.select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(heur(1L) == "und" && heur(2L) != "it",
      s"planted minority docs should defeat the heuristic: $heur")
  }

  test("gram-agnostic NB: word-unigram domain classifier recovers planted vocabularies") {
    import graft.ops.TextAnalysis
    // three domains with disjoint content vocabulary riding on shared
    // function words — the nbTrain/nbPredict face over tokens() instead
    // of charTrigrams (the DoReMi/DSIR-style source classifier)
    val train = Seq(
      ("code", "the function returns a value and the compiler checks the type"),
      ("code", "a variable holds the pointer and the loop iterates the array"),
      ("code", "the parser reads the token and the stack stores the frame"),
      ("news", "the minister said the parliament votes on the budget today"),
      ("news", "the election results arrive and the president speaks tonight"),
      ("news", "the economy grows and the market reacts to the announcement"),
      ("chat", "lol that movie was so funny i cried haha totally"),
      ("chat", "omg yes we should hang out this weekend for sure"),
      ("chat", "haha no way dude that game was awesome last night")
    ).toDF("dom", "text")
    val m = TextAnalysis.nbTrain(train, "dom", TextAnalysis.tokens(col("text")))
    val held = Seq(
      (1L, "the compiler parses the array and returns the pointer"),
      // content-dominated on purpose: linear pooling weighs shared
      // function words ("the") by raw mass, the documented price of the
      // integer-exact score — signal must come from content tokens
      (2L, "parliament debates budget election president economy market"),
      (3L, "omg haha that was so funny dude"),
      (4L, "") // no tokens → und
    ).toDF("doc_id", "text")
    val got = TextAnalysis.nbPredict(held, TextAnalysis.tokens(col("text")), m,
        "dom_pred")
      .select("doc_id", "dom_pred").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "code", 2L -> "news", 3L -> "chat", 4L -> "und"),
      got.toString)
    // the char-trigram langId faces are unchanged by the refactor:
    // delegation, not a parallel code path
    val viaNb = TextAnalysis.nbPredict(held,
        TextAnalysis.charTrigrams(col("text")),
        TextAnalysis.nbTrain(train, "dom", TextAnalysis.charTrigrams(col("text"))),
        "p").select("doc_id", "p").as[(Long, String)].collect().toMap
    assert(viaNb(1L) == "code" && viaNb(4L) == "und", viaNb.toString)
    // the broadcast-join face predicts bit-identically to the
    // literal-map fold (incl. the und row and the no-topK-match case)
    val byId = TextAnalysis.nbPredictById(held, "doc_id",
        TextAnalysis.tokens(col("text")), m, "dom_pred")
      .select("doc_id", "dom_pred").as[(Long, String)].collect().toMap
    assert(byId == got, s"join face must equal the map face: $byId vs $got")
  }

  test("DSIR importance selection: target-like docs score positive, faces rank-agree") {
    import graft.ops.Sampling
    // target: medical-ish vocabulary; raw: general web chatter. A raw
    // pool doc written in the target's vocabulary must out-rank (and
    // keep over) raw-typical docs under BOTH scoring faces.
    val target = Seq(
      "the patient received the treatment and the dose was increased",
      "clinical trial results show the treatment reduces symptoms",
      "the diagnosis confirmed the patient needs continued therapy"
    ).map(Tuple1(_)).toDF("text")
    val rawCorpus = Seq(
      "click here for the best deals on shoes and bags today",
      "my cat did the funniest thing last night you have to see",
      "top ten travel destinations for your summer vacation plans"
    ).map(Tuple1(_)).toDF("text")
    val pool = Seq(
      (1L, "the patient responded to the treatment and the therapy"),
      (2L, "best deals on summer shoes click here today"),
      (3L, "")
    ).toDF("doc_id", "text")
    val t = Sampling.hashedNgramCounts(target, "text")
    val r = Sampling.hashedNgramCounts(rawCorpus, "text")
    val m = Sampling.dsirScores(pool, "text", t, r)
      .select("doc_id", "dsir_margin", "kept")
      .as[(Long, Long, Boolean)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(m(1L)._2 && m(1L)._1 > 0, s"target-like doc must keep: $m")
    assert(!m(2L)._2 && m(2L)._1 < 0, s"raw-typical doc must drop: $m")
    assert(m(3L)._1 == 0L && !m(3L)._2, s"empty doc scores zero, drops: $m")
    val lw = Sampling.dsirLogWeights(pool, "text", t, r)
      .select("doc_id", "dsir_log_w").as[(Long, Double)].collect().toMap
    assert(lw(1L) > 0 && lw(2L) < 0 && lw(3L) == 0.0,
      s"log-weight face must sign-agree: $lw")
    assert(lw(1L) > lw(2L) && m(1L)._1 > m(2L)._1, "faces must rank-agree")
    // profile fit is partition-count independent (pure count aggregate)
    val t7 = Sampling.hashedNgramCounts(target.repartition(7), "text")
    assert(t7.orderBy("bucket").collect().toSeq ==
      t.orderBy("bucket").collect().toSeq)
  }

  test("DSIR profile state: ledgered folds equal the one-shot profile, replay no-ops") {
    import graft.ops.{Sampling, Sketches}
    val docs = Seq(
      (1L, "the patient received the treatment today"),
      (2L, "clinical trial results show improvement"),
      (3L, "the diagnosis confirmed the therapy works")
    ).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-dsirstate-").toString
    try {
      Sampling.dsirProfileUpdateState(spark, root,
        docs.filter(col("doc_id") <= 2), "text", "day1")
      Sampling.dsirProfileUpdateState(spark, root,
        docs.filter(col("doc_id") === 3), "text", "day2")
      // replaying an applied deltaId must not double-count
      Sampling.dsirProfileUpdateState(spark, root,
        docs.filter(col("doc_id") === 3), "text", "day2")
      val fromState = Sketches.readState(spark, root)
        .orderBy("bucket").collect().toSeq
      val oneShot = Sampling.hashedNgramCounts(docs, "text")
        .orderBy("bucket").collect().toSeq
      assert(fromState == oneShot,
        s"N ledgered folds must equal the one-shot profile: $fromState vs $oneShot")
      // and the scoring face consumes the state frame directly
      val raw = Seq(Tuple1("click here for the best deals")).toDF("text")
      val viaState = Sampling.dsirScores(docs, "text",
          Sketches.readState(spark, root), Sampling.hashedNgramCounts(raw, "text"))
        .select("doc_id", "dsir_margin").as[(Long, Long)].collect().toMap
      val viaBatch = Sampling.dsirScores(docs, "text",
          Sampling.hashedNgramCounts(docs, "text"), Sampling.hashedNgramCounts(raw, "text"))
        .select("doc_id", "dsir_margin").as[(Long, Long)].collect().toMap
      assert(viaState == viaBatch, "state-backed profile must score bit-identically")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }

  test("components driver fast path equals the distributed rounds (r16)") {
    import graft.ops.Dedup
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val n = 200
      // random graph + a guaranteed chain (the shape single-hop
      // collapses get wrong and log-diameter rounds must walk)
      val edges = (0 until 300).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2) ++
        Seq((500L, 501L), (501L, 502L), (502L, 503L), (503L, 504L))
      val pairs = edges.toDF("id_a", "id_b")
      val (fastDf, fastRounds) = Dedup.componentsWithRounds(pairs)
      assert(fastRounds == 0,
        s"trial $trial: a small long-keyed pair set must take the driver path")
      val fast = fastDf.as[(Long, Long)].collect().toSet
      assert(fast.exists(_ == (504L, 500L)), "chain must collapse to its min")
      spark.conf.set("spark.graft.components.driverMaxEdges", "0")
      try {
        // hybrid: distributed rounds + the r17 contracted-edge handoff
        val (hybDf, hybRounds) = Dedup.componentsWithRounds(pairs)
        assert(hybRounds > 0, "threshold 0 must force at least one round")
        assert(fast == hybDf.as[(Long, Long)].collect().toSet,
          s"trial $trial: hybrid handoff != driver union-find")
        // pure distributed: handoff disabled too
        spark.conf.set("spark.graft.components.handoffMaxEdges", "0")
        val (distDf, distRounds) = Dedup.componentsWithRounds(pairs)
        assert(distRounds >= hybRounds,
          s"trial $trial: handoff must never add rounds ($hybRounds vs $distRounds)")
        assert(fast == distDf.as[(Long, Long)].collect().toSet,
          s"trial $trial: driver union-find != distributed label propagation")
      } finally {
        spark.conf.unset("spark.graft.components.driverMaxEdges")
        spark.conf.unset("spark.graft.components.handoffMaxEdges")
      }
    }
  }

  test("components contracted-edge handoff finishes a deep chain early and exactly (VERDICT r16 #2)") {
    import graft.ops.Dedup
    // a 400-node path: pure label propagation needs ~log2(400) rounds;
    // the handoff should finish from round 1's contracted residual
    val pairs = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    spark.conf.set("spark.graft.components.driverMaxEdges", "0")
    try {
      val (hybDf, hybRounds) = Dedup.componentsWithRounds(pairs)
      val hyb = hybDf.as[(Long, Long)].collect().toSet
      assert(hyb == (0L until 400L).map(i => (i, 0L)).toSet,
        "chain must collapse to node 0")
      spark.conf.set("spark.graft.components.handoffMaxEdges", "0")
      val (distDf, distRounds) = Dedup.componentsWithRounds(pairs)
      assert(distDf.as[(Long, Long)].collect().toSet == hyb)
      assert(hybRounds < distRounds,
        s"handoff must cut rounds on a deep chain: $hybRounds vs $distRounds")
    } finally {
      spark.conf.unset("spark.graft.components.driverMaxEdges")
      spark.conf.unset("spark.graft.components.handoffMaxEdges")
    }
  }

  test("packWithSpans: spans tile each bin exactly and agree with packSequential (VERDICT r16 #5)") {
    import graft.ops.Packing
    // lengths chosen to hit every fold case: exact fit, overflow,
    // oversized doc (> cap, gets its own bin), and a multi-group split
    val docs = Seq(
      (1L, 40L, 0L), (2L, 60L, 0L), (3L, 100L, 0L), // 40+60 fit cap=100, 3 overflows
      (4L, 250L, 0L),                               // oversized: own bin, len > cap
      (5L, 10L, 0L), (6L, 10L, 0L),
      (7L, 70L, 1L), (8L, 70L, 1L)                  // second group independent
    ).toDF("doc_id", "ntok", "g")
    val bins = Packing.packWithSpans(docs, "doc_id", "ntok", col("g"), cap = 100L)
    val rows = bins.select("grp", "bin", "fill", "n_docs", "spans")
      .as[(Long, Long, Long, Long, Seq[(Long, Long, Long)])].collect()
    rows.foreach { case (g, b, fill, nDocs, spans) =>
      assert(spans.nonEmpty && spans.size == nDocs, s"bin ($g,$b): $spans")
      assert(spans.head._2 == 0L, s"bin ($g,$b) must start at 0: $spans")
      spans.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, _)) =>
          assert(s2 == s1 + l1, s"bin ($g,$b) spans must tile: $spans")
        case _ =>
      }
      assert(spans.map(_._3).sum == fill,
        s"bin ($g,$b) fill must equal the span lengths: $spans vs $fill")
    }
    // the oversized doc sits alone with its true length
    val big = rows.find(_._5.exists(_._1 == 4L)).get
    assert(big._4 == 1L && big._3 == 250L, s"oversized doc bin: $big")
    // bin assignment is bit-identical to packSequential's
    val viaSpans = rows.flatMap { case (g, b, _, _, sp) =>
      sp.map(s => (s._1, g, b)) }.toSet
    val viaPack = Packing.packSequential(docs, "doc_id", "ntok", col("g"), 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSpans == viaPack, s"$viaSpans vs $viaPack")
  }

  test("canonicalUrl: collapses spelling twins, keeps significant parts (VERDICT r16 #6)") {
    import graft.ops.TextAnalysis
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(TextAnalysis.canonicalUrl(col("u"))).as[String].head()
    // the twin families collapse
    assert(canon("HTTPS://Example.COM/Path") == "https://example.com/Path")
    assert(canon("https://example.com:443/a/") == "https://example.com/a")
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    assert(canon("https://example.com/a?b=2&a=1#frag") ==
      "https://example.com/a?a=1&b=2")
    assert(canon("https://example.com/a?a=1&utm_source=tw&fbclid=Z") ==
      "https://example.com/a?a=1")
    // significant parts survive: PATH case, non-default port, non-tracking params
    assert(canon("https://example.com/CaseSensitive") ==
      "https://example.com/CaseSensitive")
    assert(canon("https://example.com:8443/a") == "https://example.com:8443/a")
    // tracking-only query drops the '?' entirely; trailing & noise drops
    assert(canon("https://example.com/a?utm_campaign=x") == "https://example.com/a")
    assert(canon("https://example.com/a?x=1&&") == "https://example.com/a?x=1")
    // :443 is NOT stripped from http (and vice versa)
    assert(canon("http://example.com:443/a") == "http://example.com:443/a")
    // non-http(s) input passes through trimmed-unchanged
    assert(canon("  ftp://Example.com/X  ") == "ftp://Example.com/X")
    assert(canon("not a url") == "not a url")
  }

  test("NULL text is a zero-signal row, not a NULL bomb (ADVICE r15)") {
    import graft.ops.{Sampling, TextAnalysis}
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    // the gram faces yield EMPTY arrays on NULL (split would propagate
    // NULL and skip every size(gs)===0 branch downstream)
    val z = docs.filter(col("doc_id") === 1)
      .select(size(TextAnalysis.tokens(col("text"))).as("nt"),
        size(TextAnalysis.charTrigrams(col("text"))).as("nc")).head()
    assert(z.getInt(0) == 0 && z.getInt(1) == 0,
      s"NULL text must gram to empty arrays: $z")
    // 'und' on both predict faces, exactly like empty text
    val m = TextAnalysis.langIdTrain(
      Seq(("en", "the cat sat on the mat"), ("de", "der hund lief im park"))
        .toDF("lang", "text"), "lang", "text")
    val p1 = TextAnalysis.langIdPredict(docs, "text", m)
      .filter(col("doc_id") === 1).select("lang_pred").as[String].head()
    assert(p1 == "und", s"literal-map face on NULL text: $p1")
    val p2 = TextAnalysis.nbPredictById(docs, "doc_id",
        TextAnalysis.charTrigrams(col("text")), m)
      .filter(col("doc_id") === 1).select("lang_pred").as[String].head()
    assert(p2 == "und", s"broadcast-join face on NULL text: $p2")
    // dsir: a NULL-text doc scores as a zero-gram doc (margin 0, drops)
    val prof = Sampling.hashedNgramCounts(docs.filter(col("doc_id") === 2), "text")
    val s1 = Sampling.dsirScores(docs, "text", prof, prof)
      .filter(col("doc_id") === 1).select("dsir_margin", "kept").head()
    assert(s1.getLong(0) == 0L && !s1.getBoolean(1),
      s"NULL text must dsir-score like an empty doc: $s1")
  }

  test("dsirScores: margins past the Long range null out, kept stays exact (ADVICE r15)") {
    import graft.ops.Sampling
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // the doc's own gram buckets, computed the way the scorer hashes
    val bs = docs.select(explode(Sampling.dsirGrams(col("text"))).as("g"))
      .select(Sampling.hashBucketHex(col("g"), 2).as("b"))
      .distinct().as[Long].collect().toSeq
    // target mass 1e13 on exactly those buckets, raw mass 1e10
    // everywhere: dot_t·(rn+B) ≈ 1.8e26 — far past 2^63, exactly the
    // multi-billion-gram-corpus regime the Long face silently wrapped in
    val t = bs.map(b => (b, 10_000_000_000_000L)).toDF("bucket", "cnt")
    val r = spark.range(256).select(col("id").as("bucket"),
      lit(10_000_000_000L).as("cnt"))
    val row = Sampling.dsirScores(docs, "text", t, r)
      .select("dsir_margin", "kept").head()
    assert(row.isNullAt(0),
      s"out-of-Long margin must be NULL, never a wrapped value: $row")
    assert(row.getBoolean(1),
      s"kept must stay correct from the decimal sign: $row")
    // and the log face agrees on the direction at the same magnitudes
    val lw = Sampling.dsirLogWeights(docs, "text", t, r)
      .select("dsir_log_w").as[Double].head()
    assert(lw > 0, s"log face must agree the doc is target-like: $lw")
  }

  test("dsirScores: the dot-product FOLD itself cannot wrap a Long (ADVICE r16)") {
    import graft.ops.Sampling
    // the regime the r16 advice cites: a LONG document against
    // near-Long per-bucket counts — dot_t ≈ 4000 grams × 9e15 = 3.6e19
    // > 2^63, so a LongType fold accumulator wraps mid-fold and
    // corrupts `kept` before any decimal cast can save it. Small vocab
    // (4 tokens repeated) keeps the doc's bucket set « 256, so the
    // linear-pooled margin is decisively positive, not degenerate-zero
    val docs = Seq((1L, ("alpha beta gamma delta " * 500).trim))
      .toDF("doc_id", "text")
    val bs = docs.select(explode(Sampling.dsirGrams(col("text"))).as("g"))
      .select(Sampling.hashBucketHex(col("g"), 2).as("b"))
      .distinct().as[Long].collect().toSeq
    assert(bs.size < 200, s"fixture needs a sparse bucket set: ${bs.size}")
    val t = bs.map(b => (b, 9_000_000_000_000_000L)).toDF("bucket", "cnt")
    val r = spark.range(256).select(col("id").as("bucket"),
      lit(1L).as("cnt"))
    val row = Sampling.dsirScores(docs, "text", t, r)
      .select("dsir_margin", "kept").head()
    assert(row.getBoolean(1),
      s"decimal fold: massively target-like doc must be kept: $row")
    assert(row.isNullAt(0),
      s"its margin is past the Long range, so NULL (never wrapped): $row")
    // mirrored profiles → mirrored verdict (the fold wrap, were it
    // still there, would corrupt BOTH directions the same way)
    val row2 = Sampling.dsirScores(docs, "text", r, t)
      .select("kept").head()
    assert(!row2.getBoolean(0), s"mirror must drop: $row2")
  }

  test("DSIR char-gram face: unspaced scripts separate where the token face cannot (VERDICT r15 #2)") {
    import graft.ops.{Sampling, Sketches}
    // planted UNSEGMENTED corpora: two disjoint character vocabularies,
    // no whitespace anywhere — the CJK/Thai regime
    def aDoc(i: Long) = (i, ("alphabetagamma" * 6) + s"pad$i")
    def bDoc(i: Long) = (i, ("zetaetathetaiota" * 6) + s"pad$i")
    val target = (1L to 4L).map(aDoc).toDF("doc_id", "text")
    val raw = ((11L to 14L).map(bDoc) ++ Seq(aDoc(15L), aDoc(16L)))
      .toDF("doc_id", "text")
    val pool = Seq(aDoc(100L), bDoc(101L)).toDF("doc_id", "text")
    // token face: ONE giant token per doc — the gram bag is a singleton,
    // so the margin is the corpus-size term plus at most a bucket
    // collision: the target-like and raw-like doc get the SAME verdict
    val tok = Sampling.dsirScores(pool, "text",
        Sampling.hashedNgramCounts(target, "text"),
        Sampling.hashedNgramCounts(raw, "text"))
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(tok(100L) == tok(101L),
      s"token face has no signal on unspaced docs, verdicts must agree: $tok")
    // char-trigram face (same bucket space): separates
    val chr = Sampling.dsirScores(pool, "text",
        Sampling.hashedNgramCounts(target, "text", charN = Some(3)),
        Sampling.hashedNgramCounts(raw, "text", charN = Some(3)),
        charN = Some(3))
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(chr(100L) && !chr(101L),
      s"char face must keep the target-vocabulary doc and drop the other: $chr")
    // profile STATE format unchanged: the char-gram profile folds through
    // the same counterUpdateState ledger and scores bit-identically
    val root = java.nio.file.Files.createTempDirectory("graft-chrstate-").toString
    Sampling.dsirProfileUpdateState(spark, root, target, "text", "d1",
      charN = Some(3))
    val rawChr = Sampling.hashedNgramCounts(raw, "text", charN = Some(3))
    val viaState = Sampling.dsirScores(pool, "text",
        Sketches.readState(spark, root), rawChr, charN = Some(3))
      .select("doc_id", "dsir_margin").as[(Long, Long)].collect().toMap
    val viaBatch = Sampling.dsirScores(pool, "text",
        Sampling.hashedNgramCounts(target, "text", charN = Some(3)), rawChr,
        charN = Some(3))
      .select("doc_id", "dsir_margin").as[(Long, Long)].collect().toMap
    assert(viaState == viaBatch,
      "state-backed char-gram profile must score bit-identically")
    // charNgrams generalizes charTrigrams exactly
    val t3 = Seq(Tuple1("AbC dEf")).toDF("text")
      .select(graft.ops.TextAnalysis.charTrigrams(col("text")).as("a"),
        graft.ops.TextAnalysis.charNgrams(col("text"), 3).as("b"))
      .head()
    assert(t3.getSeq[String](0) == t3.getSeq[String](1))
  }

  test("bpeTrain: deterministic merge sequence, greedy application, early stop") {
    import graft.ops.Vocab
    // words: aaab x3, ab x1. Round 1: (a,a)=6 beats (a,b)=4 -> merge aa
    // (greedy: aaab segments [aa, a, b]). Round 2: (a,b)=4 beats
    // (aa,a)=3 -> merge ab. Round 3: (aa,ab)=3 -> merge aaab. Round 4:
    // no pair repeats -> early stop despite merges=10.
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val rules = Vocab.bpeTrain(docs, "text", merges = 10)
    assert(rules == Seq(("a", "a"), ("a", "b"), ("aa", "ab")), rules.toString)
  }

  test("bpeTrainBatched: batched rule list equals sequential on the golden fixture and random corpora") {
    import graft.ops.Vocab
    // golden fixture: batching must still learn (a,a),(a,b),(aa,ab) —
    // the (a,a)/(a,b) overlap on 'a' forces one-merge rounds here
    val golden = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val (gRules, gRounds) = Vocab.bpeTrainBatched(golden, "text", merges = 10)
    assert(gRules == Vocab.bpeTrain(golden, "text", merges = 10), gRules.toString)
    assert(gRounds >= 1 && gRounds <= gRules.size)
    // random corpora: seeded words over small alphabets at several
    // shapes — shared letters, merged-token string collisions ("ab"
    // appearing both as a merge result and as raw text), repeats
    for ((seed, alpha, n, merges) <- Seq(
      (7L, "abcd", 120, 12), (19L, "abcd", 120, 12), (43L, "abcd", 120, 12),
      (101L, "abcdefgh", 300, 20), (211L, "abcdefgh", 300, 20))) {
      val rnd = new scala.util.Random(seed)
      val words = (0 until n).map { _ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val seqRules = Vocab.bpeTrain(docs, "text", merges = merges)
      val (batRules, rounds) = Vocab.bpeTrainBatched(docs, "text", merges = merges)
      assert(batRules == seqRules,
        s"seed $seed: batched ($batRules) != sequential ($seqRules)")
      assert(rounds <= math.max(1, seqRules.size),
        s"seed $seed: rounds $rounds exceeds merges ${seqRules.size}")
    }
    // a corpus with genuinely disjoint frequent pairs batches them in
    // ONE round: (a,b), (c,d), (e,f) share no symbols and the rank gaps
    // clear every raised bound
    val disjoint = Seq((1L,
      ("ab " * 40) + ("cd " * 30) + ("ef " * 20) + "xy")).toDF("doc_id", "text")
    val seqD = Vocab.bpeTrain(disjoint, "text", merges = 3)
    val (batD, roundsD) = Vocab.bpeTrainBatched(disjoint, "text", merges = 3)
    assert(batD == seqD && seqD == Seq(("a", "b"), ("c", "d"), ("e", "f")),
      s"$batD vs $seqD")
    assert(roundsD == 1, s"disjoint frequent pairs must batch in one round, got $roundsD")
  }

  test("bpe encode: learned rules segment unseen words greedily, map-side") {
    import graft.ops.Vocab
    val rules = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val docs = Seq((1L, "aaab ab aaa")).toDF("doc_id", "text")
    val out = Vocab.encode(docs, "text", rules).select("bpe_tokens").head()
      .getSeq[String](0)
    // aaab -> [aaab]; ab -> [ab]; aaa -> (a,a) greedy left-to-right [aa, a]
    assert(out == Seq("aaab", "ab", "aa", "a"), out.toString)
  }

  test("bpe pairCounts: frequency-weighted adjacent pairs over distinct words") {
    import graft.ops.Vocab
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val pc = Vocab.pairCounts(Vocab.wordTable(docs, "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pc == Map(("a", "a") -> 6L, ("a", "b") -> 4L), pc.toString)
  }

  test("stratifiedSplit: per-group floors, tiny-group degradation, partition stability") {
    import graft.ops.Sampling
    // big: 100 rows; small: 3 rows; tiny: 2 rows; singleton: 1 row
    val rows = (0 until 100).map(i => (i.toLong, "big")) ++
      Seq((200L, "small"), (201L, "small"), (202L, "small"),
        (300L, "tiny"), (301L, "tiny"), (400L, "solo"))
    val df = rows.toDF("id", "g")
    val out = Sampling.stratifiedSplit(df, "id", "g", 80, 10, 1, 1)
      .select("id", "g", "split").as[(Long, String, String)].collect()
    val byGroup = out.groupBy(_._2).map { case (g, xs) =>
      g -> xs.groupBy(_._3).view.mapValues(_.length).toMap
    }
    // big: proportional 10/10/80
    assert(byGroup("big") == Map("val" -> 10, "test" -> 10, "train" -> 80))
    // small (3): floors give 1 val + 1 test, 1 train
    assert(byGroup("small") == Map("val" -> 1, "test" -> 1, "train" -> 1))
    // tiny (2): 1 val + 1 test, train empty
    assert(byGroup("tiny") == Map("val" -> 1, "test" -> 1))
    // solo (1): val floor wins, test gets nothing
    assert(byGroup("solo") == Map("val" -> 1))
    // every row exactly one split; assignment partition-stable
    assert(out.length == rows.length)
    val re = Sampling.stratifiedSplit(df.repartition(7), "id", "g", 80, 10, 1, 1)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.map(x => x._1 -> x._3).toMap == re)
  }

  test("perceptual-hash mean compare is exact past the int64 product wrap (review r12)") {
    import graft.ops.Multimodal
    // giant-image regime: cellSum·n and total·cellN both exceed 2^63 —
    // the old direct Long products wrapped silently and could flip bits
    val (cellSum, n, total, cellN) = (255L * (1L << 25), 1L << 31, 200L * (1L << 31), 1L << 25)
    // naive products wrap negative here; the true compare is 255 > 200
    assert(cellSum * n < 0 || total * cellN < 0, "test must exercise the wrap regime")
    assert(Multimodal.mulGt(cellSum, n, total, cellN))
    assert(!Multimodal.mulGt(total, cellN, cellSum, n))
    // equality stays strictly-greater = false in both orders
    assert(!Multimodal.mulGt(cellSum, n, cellSum, n))
    // agrees with BigInt on a deterministic sweep including extremes
    val vals = Seq(0L, 1L, 3L, (1L << 31) - 1, (1L << 40) + 7, Long.MaxValue)
    for (a <- vals; b <- vals; c <- vals; d <- vals)
      assert(Multimodal.mulGt(a, b, c, d) ==
        (BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)), s"($a,$b,$c,$d)")
  }

  test("aHash64: re-encodes collide exactly, edits stay near, banded near-dup finds the pair") {
    import graft.ops.{Dedup, Multimodal}
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    assume(Multimodal.ImageIoCodec.available)
    // deterministic 64×48 gradient-with-structure raster
    def raster(brighten: Int): BufferedImage = {
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val base = (x * 3 + y * 2 + (if ((x / 8 + y / 8) % 2 == 0) 60 else 0))
        val v = math.min(255, base + brighten)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = enc(raster(0), "png")
    val bmp = enc(raster(0), "bmp")
    val bright = enc(raster(8), "png")
    val Some(hPng) = Multimodal.aHash64(png)
    val Some(hBmp) = Multimodal.aHash64(bmp)
    val Some(hBright) = Multimodal.aHash64(bright)
    // container bytes differ, decoded pixels don't: exact collision
    assert(!png.sameElements(bmp) && hPng == hBmp)
    // mild global edit: a few bits at most (uniform brighten saturates
    // only the brightest cells relative to the mean)
    val dist = java.lang.Long.bitCount(hPng ^ hBright)
    assert(dist <= 3, s"brightness variant drifted $dist bits")
    assert(Multimodal.aHash64("not an image".getBytes).isEmpty)

    // composition: the banded hamming near-dup machinery pairs them
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", bmp),
      Multimodal.MediaRow(3L, "image", bright),
      Multimodal.MediaRow(4L, "text", "not an image".getBytes)
    ).toDS()
    val hashes = Multimodal.imageHashes(media)
    assert(hashes.count() == 3) // row 4 undecodable, dropped here
    val pairs = Dedup.simhashNearDups(hashes, "media_id", "ahash",
        maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact re-encode pair missing: $pairs")
    assert(pairs.contains((1L, 3L)) == (dist <= 3))
  }

  test("verifyShards: clean layout passes; deletion and tamper are localized to their shard") {
    import graft.ops.Sampling
    val dir = java.nio.file.Files.createTempDirectory("shardverify").toString
    val df = spark.range(2000).select(col("id"))
    Sampling.writeTrainingShards(df, "id", 8, dir)
    assert(Sampling.verifyShards(spark, dir, "id").count() == 0,
      "freshly-written layout must verify clean")
    // tamper 1: delete one shard directory outright
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$dir/shard=3"))
    // tamper 2: rewrite a shard's file with one row dropped (count and
    // digest both drift)
    val s5 = spark.read.parquet(s"$dir/shard=5").filter(col("pos") =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("shard5").toString
    s5.coalesce(1).write.mode("overwrite").parquet(tmp)
    rm(new java.io.File(s"$dir/shard=5"))
    new java.io.File(s"$dir/shard=5").mkdirs()
    val part = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(s"$dir/shard=5/${part.getName}").toPath)
    val bad = Sampling.verifyShards(spark, dir, "id")
      .select("shard").as[Long].collect().toSet
    assert(bad == Set(3L, 5L), s"expected exactly shards 3 and 5 flagged: $bad")
  }

  test("audioHash64: gain-invariant, content-sensitive, format-guarded") {
    import graft.ops.Multimodal
    // 16-bit mono WAV builder (little-endian), independent of javax.sound
    def wav16(samples: Array[Short]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)
        .putInt(16000).putInt(32000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // structured waveform: alternating loud/quiet 256-frame blocks
    val base = Array.tabulate[Short](4096) { i =>
      val b = ((i * 13) % 201) - 100
      (b * (if ((i / 256) % 2 == 0) 3 else 1)).toShort
    }
    val doubled = base.map(s => (s * 2).toShort)
    val shifted = Array.tabulate[Short](4096) { i =>
      val b = ((i * 13) % 201) - 100
      (b * (if ((i / 256) % 2 == 1) 3 else 1)).toShort // loud blocks swapped
    }
    val Some(h1) = Multimodal.audioHash64(wav16(base))
    val Some(h2) = Multimodal.audioHash64(wav16(doubled))
    val Some(h3) = Multimodal.audioHash64(wav16(shifted))
    assert(h1 == h2, "exact re-mastering (2x gain) must collide")
    val dist = java.lang.Long.bitCount(h1 ^ h3)
    assert(dist >= 16, s"swapped loud/quiet structure only $dist bits apart")
    // structure sanity: loud blocks above the mean → alternating bit runs
    assert(h1 != 0L && h1 != -1L)
    // guards: non-audio and empty-payload → None
    assert(Multimodal.audioHash64("not audio".getBytes).isEmpty)
    assert(Multimodal.audioHash64(wav16(Array.empty[Short])).isEmpty)
  }

  test("curate: audit labels every input doc with the first stage that dropped it") {
    import graft.ops.{Curate, TextAnalysis}
    val good1 = "a longer piece of text with many common words that the people " +
      "of the town and the cities of the region use in the course of a day"
    val trunc = good1.split(" ").take(20).mkString(" ")
    val leakSrc = "benchmark holdout phrase alpha beta gamma delta epsilon zeta"
    val blocked = "a page that was ordered to be taken down by the rights owner " +
      "and all of the copies of it must go away from the training set now"
    val docs = Seq(
      (1L, good1),
      (2L, "  " + good1.replace(" ", "  ")), // exact dup of 1
      (3L, trunc),                           // near-dup of 1
      (4L, "xyz abc"),                       // quality floor
      (5L, "the quarterly report of the committee lists the numbers of the " +
        "projects and the goals of the teams alpha beta gamma delta epsilon"),
      (6L, blocked),                         // blocklist
      (7L, "a growing list of features and a set of tools is what the " +
        "platform offers and the users of the service are happy with it")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, leakSrc)).toDF("doc_id", "text")
    val bl = Seq(blocked).toDF("text")
      .select(TextAnalysis.fingerprint(
        TextAnalysis.redactPii(col("text"))).as("content_key"))
    val r = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(blocklist = Some(bl), audit = true))
    val got = r.audit.get.as[(Long, String)].collect().toMap
    assert(got(1L) == "survived" && got(7L) == "survived", got.toString)
    assert(got(2L) == "exact_dup" && got(3L) == "near_dup", got.toString)
    assert(got(4L) == "quality_floor" && got(6L) == "blocklist", got.toString)
    // 5 shares the benchmark's "alpha beta gamma delta epsilon" 5-gram
    assert(got(5L) == "contaminated", got.toString)
    // the audit partitions the input exactly: every id, exactly once
    assert(got.keySet == (1L to 7L).toSet && r.audit.get.count() == 7)
  }

  test("curate: audit accounts for the chunk stage too (review r12)") {
    import graft.ops.Curate
    // a doc that survives every doc-level stage but emits zero chunks
    // (whitespace-only text) used to be labeled "survived" while the
    // output contained nothing of it
    val long = (1 to 40).map(i => s"common the word$i of text").mkString(" ")
    val docs = Seq((1L, long), (2L, "   ")).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout unrelated")).toDF("doc_id", "text")
    val r = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(qualityFloor = 0.0, audit = true, chunk = Some((16, 4))))
    val got = r.audit.get.as[(Long, String)].collect().toMap
    assert(got(1L) == "survived", got.toString)
    assert(got(2L) == "chunk_empty", got.toString)
    assert(r.corpus.filter(col("doc_id") === 2L).count() == 0)
    r.release()
  }

  test("curate: blocklist stage drops blocked content and its PII-variant copies") {
    import graft.ops.{Curate, TextAnalysis}
    val blockedText = "a page that was ordered to be taken down by " +
      "dev@example.org and all of the copies of it must go away from the set"
    // same content, different PII value — must block TOGETHER because the
    // blocklist key is the REDACTED fingerprint ([EMAIL] either way)
    val blockedVariant = blockedText.replace("dev@example.org",
      "legal@example.com")
    val keeper = "a growing list of features and a set of tools is what the " +
      "platform offers and the users of the service are happy with the results"
    val docs = Seq(
      (1L, blockedText), (2L, keeper), (3L, blockedVariant)
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout nothing shared here at all"))
      .toDF("doc_id", "text")
    // the takedown list is built from the redacted canonical text
    val bl = Seq(blockedText).toDF("text")
      .select(TextAnalysis.fingerprint(
        TextAnalysis.redactPii(col("text"))).as("content_key"))
    // without the blocklist, the variant pair merely exact-dedups (1 wins)
    val off = Curate.curate(docs, bench, "doc_id", "text")
    assert(off.corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // with it, the whole content class is gone — including the variant,
    // which would otherwise have survived any takedown keyed on raw text
    val on = Curate.curate(docs, bench, "doc_id", "text",
      Curate.Config(blocklist = Some(bl)))
    assert(on.corpus.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("curate: nfcCanonical collapses decomposed re-encodes the raw fingerprint misses") {
    import graft.ops.Curate
    val composed = "the café down the street of the town serves many of " +
      "the people a set of meals and most of the visitors come back again"
    val decomposed = composed.replace("café", "café")
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark holdout nothing shared here at all"))
      .toDF("doc_id", "text")
    // near-dup OFF in both runs: MinHash would also catch a one-token
    // difference, so isolate what the EXACT stage sees
    val base = Curate.Config(nearDupThreshold = 1.5)
    val off = Curate.curate(docs, bench, "doc_id", "text", base)
    assert(off.corpus.count() == 2, "toolchain variants hash apart by default")
    val on = Curate.curate(docs, bench, "doc_id", "text",
      base.copy(nfcCanonical = true))
    val survivors = on.corpus.select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(1L), s"NFC must collapse the pair: $survivors")
    // idempotence: re-curating the curated output changes nothing (the
    // fixpoint contract extends to the NFC stage)
    val again = Curate.curate(
      on.corpus.select("doc_id", "text"), bench, "doc_id", "text",
      base.copy(nfcCanonical = true))
    assert(again.corpus.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}

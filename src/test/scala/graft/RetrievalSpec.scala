package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** Rational-BM25 retrieval (ops/Retrieval.scala): exact-arithmetic scoring
  * against an independent BigInt/BigDecimal reference, ranking behavior in
  * the df regimes, and the broadcast-only plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a zebra ran far away from the zoo"),
    (4L, "the the the cat"),
    (5L, "dog dog dog dog mat"))

  /** Independent reference: same rational-BM25 definition, computed with
    * BigInt factors and the DECIMAL(28,12) summation discipline (each
    * IEEE division rounded HALF_UP to 12 places before the exact sum —
    * what cast(decimal(28,12)) does), nothing shared with the operator
    * but the formula. */
  private def reference(docs: Seq[(Long, String)], queries: Seq[(Long, String)])
      : Map[(Long, Long), (Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    val dls = docs.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val n = BigInt(docs.size)
    val a = BigInt(dls.values.sum)
    val tf = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, o) => (id, w) -> BigInt(o.size) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> BigInt(ks.size) }
    val out = for {
      (qid, qt) <- queries
      (did, _) <- docs
      matched = toks(qt).distinct.filter(w => tf.contains((did, w)))
      if matched.nonEmpty
    } yield {
      val score = matched.map { w =>
        val t = tf((did, w)); val d = df(w); val dl = BigInt(dls(did))
        val num = (2 * n - 2 * d + 1) * 22 * t * a
        val den = (2 * d + 1) * (10 * a * t + 3 * a + 9 * dl * n)
        BigDecimal(num.toDouble / den.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (qid, did) -> (matched.size.toLong, score.toDouble)
    }
    out.toMap
  }

  test("bm25TopK matches the BigInt/BigDecimal reference exactly") {
    val queries = Seq((1L, "cat mat"), (2L, "zebra the"), (3L, "dog"))
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    val want = reference(corpus, queries)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (nm, s, _)) =>
      assert((nm, s) == want(k), s"$k: got ($nm, $s), want ${want(k)}")
    }
    // rank = position under (score desc, doc_id asc), per query
    queries.map(_._1).foreach { qid =>
      val ranked = got.collect { case ((q, d), (_, s, r)) if q == qid => (r, s, d) }
        .toSeq.sortBy(_._1)
      assert(ranked.map(_._1) == (1 to ranked.size))
      assert(ranked == ranked.sortBy { case (_, s, d) => (-s, d) })
    }
  }

  test("rare term dominates; stopword-heavy docs do not outrank it") {
    // 'zebra' df=1: its idf is (2N-1)/3 while 'the' df=4 gives 3/9 — the
    // one zebra doc must rank first however many 'the's the others stack
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq((7L, "zebra the")).toDF("query_id", "qtext"),
        "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
    assert(got.head.getLong(1) == 3L, "zebra doc must rank first")
    assert(got.length == 4) // docs 1-4 have 'the'; doc 5 matches neither term
  }

  test("duplicate query terms count once; absent-only queries emit nothing") {
    val qs = Seq((1L, "cat cat cat"), (2L, "cat"), (3L, "quantum flux"))
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        qs.toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
      .collect().groupBy(_.getLong(0))
    assert(!got.contains(3L), "absent-only query must match nothing")
    val dedup = got(1L).map(r => (r.getLong(1), r.getDouble(3))).toSet
    val plain = got(2L).map(r => (r.getLong(1), r.getDouble(3))).toSet
    assert(dedup == plain, "duplicate query terms must not change scores")
  }

  test("k caps each query's rows") {
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq((1L, "the")).toDF("query_id", "qtext"), "query_id", "qtext", k = 2)
      .collect()
    assert(got.length == 2 && got.map(_.getInt(4)).sorted.toSeq == Seq(1, 2))
  }

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-retrieval-$tag-").toString

  test("RetrievalState: bootstrap + append probes == batch bm25TopK of the union") {
    import graft.ops.RetrievalState
    val root = tmpRoot("union")
    val docs = corpus.toDF("doc_id", "text")
    RetrievalState.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", root, buckets = 4)
    assert(RetrievalState.appendExactlyOnce(
      docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", root, "d1"))
    val queries = Seq((1L, "cat mat"), (2L, "zebra the"), (3L, "dog"))
      .toDF("query_id", "qtext")
    val fromState = RetrievalState.probe(queries, "query_id", "qtext", root)
      .withColumnRenamed("id", "doc_id")
    val batch = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "query_id", "qtext")
    val key = Seq("query_id", "doc_id", "n_matched", "score", "rank")
    assert(fromState.select(key.map(col): _*).collect().toSet ==
      batch.select(key.map(col): _*).collect().toSet)
  }

  test("RetrievalState: replay no-ops; crash between append and ledger repairs") {
    import graft.ops.RetrievalState
    val root = tmpRoot("crash")
    val docs = corpus.toDF("doc_id", "text")
    RetrievalState.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", root, buckets = 4)
    val delta = docs.filter(col("doc_id") % 2 =!= 0)
    // crash AFTER the postings append + stats fold, BEFORE the ledger
    intercept[RuntimeException] {
      RetrievalState.appendHooked(delta, "doc_id", "text", root, "d1",
        None, () => throw new RuntimeException("boom"))
    }
    // the re-run repairs (rolls the unledgered postings back) and lands
    // the delta exactly once — tf/df undoubled, scores == batch
    assert(RetrievalState.appendExactlyOnce(delta, "doc_id", "text", root, "d1"))
    assert(!RetrievalState.appendExactlyOnce(delta, "doc_id", "text", root, "d1"),
      "ledgered replay must no-op")
    val queries = Seq((1L, "the dog zebra")).toDF("query_id", "qtext")
    val key = Seq("query_id", "doc_id", "n_matched", "score", "rank")
    val fromState = RetrievalState.probe(queries, "query_id", "qtext", root)
      .withColumnRenamed("id", "doc_id").select(key.map(col): _*)
    val batch = Retrieval.bm25TopK(docs, "doc_id", "text",
      queries, "query_id", "qtext").select(key.map(col): _*)
    assert(fromState.collect().toSet == batch.collect().toSet)
  }

  test("RetrievalState: compact bounds files, probe identical before/after") {
    import graft.ops.RetrievalState
    val root = tmpRoot("compact")
    val docs = corpus.toDF("doc_id", "text")
    RetrievalState.build(docs.filter(col("doc_id") === 1L),
      "doc_id", "text", root, buckets = 2)
    (2L to 5L).foreach { i =>
      RetrievalState.appendExactlyOnce(docs.filter(col("doc_id") === i),
        "doc_id", "text", root, f"d$i%03d")
    }
    val queries = Seq((1L, "the dog cat zebra mat")).toDF("query_id", "qtext")
    val before = RetrievalState.probe(queries, "query_id", "qtext", root)
      .collect().toSet
    val fpbBefore = RetrievalState.filesPerBucket(spark, root)
    assert(fpbBefore > 1.0, s"5 appends should leave multi-file buckets: $fpbBefore")
    assert(RetrievalState.maybeCompact(spark, root, maxFilesPerBucket = 1))
    assert(RetrievalState.filesPerBucket(spark, root) <= 1.0)
    val after = RetrievalState.probe(queries, "query_id", "qtext", root)
      .collect().toSet
    assert(before == after, "compaction must not change probe results")
  }

  test("RetrievalState: probe plans zero state-side exchange") {
    import graft.ops.RetrievalState
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = tmpRoot("plan")
    val docs = graft.sources.Testdata
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    RetrievalState.build(docs, "doc_id", "text", root, buckets = 4)
    val out = RetrievalState.probe(
      Seq((1L, "spark join fast"), (2L, "dup scan")).toDF("query_id", "qtext"),
      "query_id", "qtext", root)
    assert(out.count() > 0)
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case other => Seq(other)
      }
      self ++ self.flatMap(_.children.flatMap(expand))
    }
    val nodes = expand(out.queryExecution.executedPlan)
    // every exchange above the state carries query-vocab-BOUNDED rows,
    // never the raw corpus: each state scan must have the In(term)
    // pushdown (so matched postings are filtered AT the scan), and no
    // join may shuffle the state side (all joins broadcast)
    val stateScans = nodes.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("bm25_state/postings")) => s
    }
    assert(stateScans.nonEmpty)
    // the vocabulary filter must reach the scan as a parquet pushdown OR
    // as bucket pruning on the bucket column (strictly fewer buckets
    // selected than exist) — either way, non-matching state never loads
    stateScans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "").contains("In(term")
      val pruned = s.optionalBucketSet.exists(bs =>
        bs.cardinality() < s.relation.bucketSpec.map(_.numBuckets).getOrElse(0))
      assert(pushed || pruned,
        s"vocab filter never reached the scan: ${s.metadata}")
    }
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    val shuffleJoins = nodes.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    assert(shuffleJoins.isEmpty,
      s"probe joins must broadcast: ${shuffleJoins.map(_.nodeName)}")
    // df aggregation (groupBy term) rides the term bucketing: no exchange
    // may sit between a state scan and the first aggregate above it
    val badAggShuffles = nodes.collect {
      case e: ShuffleExchangeExec
        if expand(e.child).exists {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.exists(_.toString.contains("bm25_state/postings"))
          case _ => false
        } && !expand(e.child).exists(
          _.nodeName.toLowerCase.contains("aggregate")) => e
    }
    assert(badAggShuffles.isEmpty,
      "an exchange carries un-aggregated state rows: the bucketed scan " +
        s"was not used (${badAggShuffles.map(_.nodeName)})")
  }

  /** Quadratic BigInt reference for cosineSelfJoin — nothing shared with
    * the operator but the threshold inequality. */
  private def cosineBrute(docs: Seq[(Long, String)], tNum: Long, tDen: Long)
      : Set[(Long, Long, Long)] = {
    def tf(s: String) = s.split(" ").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, o) => w -> BigInt(o.length) }
    val vs = docs.map { case (id, t) => id -> tf(t) }.filter(_._2.nonEmpty)
    (for {
      (ia, va) <- vs; (ib, vb) <- vs if ia < ib
      dot = va.keySet.intersect(vb.keySet).toSeq
        .map(w => va(w) * vb(w)).sum
      nsqA = va.values.map(x => x * x).sum
      nsqB = vb.values.map(x => x * x).sum
      if dot * dot * tDen * tDen >= BigInt(tNum) * tNum * nsqA * nsqB
    } yield (ia, ib, dot.toLong)).toSet
  }

  test("cosineSelfJoin equals the quadratic reference on random corpora") {
    val words = Seq("a", "b", "c", "d", "e", "f")
    val rnd = new scala.util.Random(7331)
    (1 to 3).foreach { trial =>
      val docs = (1L to 40L).map { i =>
        i -> Seq.fill(2 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      }
      Seq((1L, 2L), (3L, 5L), (87L, 100L)).foreach { case (tn, td) =>
        val got = graft.ops.Retrieval
          .cosineSelfJoin(docs.toDF("doc_id", "text"), "doc_id", "text", tn, td)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = cosineBrute(docs, tn, td)
        assert(got == want,
          s"trial $trial t=$tn/$td: missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("cosineSelfJoin: tf-doubled twin pairs at cosine exactly 1; sets can't see it") {
    val docs = Seq(
      (1L, "x y x z"),
      (2L, "x y x z x y x z"),  // doubled: same token SET, tf 2x, cos = 1
      (3L, "p q r"))
    val got = graft.ops.Retrieval
      .cosineSelfJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), s"threshold 1 must keep only the twin: ${got.toSeq}")
  }

  test("cosineSelfJoin: exact threshold boundary, kept at 3/5, dropped just above") {
    // a = (x:3, y:4), b = (x:1): cos = 3/5 exactly
    val docs = Seq((1L, "x x x y y y y"), (2L, "x"))
    def pairs(tn: Long, td: Long) = graft.ops.Retrieval
      .cosineSelfJoin(docs.toDF("doc_id", "text"), "doc_id", "text", tn, td)
      .count()
    assert(pairs(3L, 5L) == 1, "cos == t must be KEPT (>= threshold)")
    assert(pairs(60001L, 100000L) == 0, "cos just under t must drop")
  }

  test("cosineSelfJoin never plans a cartesian product") {
    val docs = graft.sources.Testdata
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val out = graft.ops.Retrieval
      .cosineSelfJoin(docs, "doc_id", "text", 87L, 100L)
    assert(out.count() >= 0)
    val planStr = out.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      "candidate generation must ride the term equi-join, never a cross")
  }

  test("plan shape: every join broadcasts — no corpus-side join shuffle") {
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val docs = graft.sources.Testdata
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq((1L, "spark join fast"), (2L, "dup scan"))
        .toDF("query_id", "qtext"), "query_id", "qtext", k = 10)
    assert(out.count() > 0)
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case other => Seq(other)
      }
      self ++ self.flatMap(_.children.flatMap(expand))
    }
    val nodes = expand(out.queryExecution.executedPlan)
    val merges = nodes.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    assert(merges.isEmpty,
      s"query-side joins must broadcast, found: ${merges.map(_.nodeName)}")
  }
}

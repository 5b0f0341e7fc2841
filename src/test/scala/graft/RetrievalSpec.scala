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

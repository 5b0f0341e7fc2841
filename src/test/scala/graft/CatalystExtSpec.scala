package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Deduplicate

import graft.functions.{SimHash64Expr, WeightedMean}
import graft.ops.{Dedup, TextAnalysis}
import graft.plans.GraftExtensions

/** Custom Catalyst surface (SURVEY §7.3): typed Aggregator, native codegen
  * expression, optimizer rule + extension installation. */
class CatalystExtSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMean aggregator: exact weighted mean, NULL on zero weight") {
    val wm = udaf(WeightedMean)
    val df = Seq((1, 10.0, 1.0), (1, 20.0, 3.0), (2, 5.0, 0.0))
      .toDF("k", "x", "w")
    val out = df.groupBy("k")
      .agg(wm(col("x"), col("w")).as("wmean"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).contains(17.5)) // (10 + 60) / 4
    assert(out(2).isEmpty)        // zero total weight → NULL
  }

  test("HeavyHitters sketch surfaces planted hot tokens within the MG bound") {
    import org.apache.spark.sql.Dataset
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
    val words: Dataset[String] = docs
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .as[String]
    val hot = spark.range(2000).select(lit("hotword").as("w")).as[String]
    val all = words.union(hot).repartition(8)
    val n = all.count()
    val cap = 16
    val sketch = all.select(new graft.functions.HeavyHitters(cap).toColumn).head()
    assert(sketch.contains("hotword"), s"hot token missing from $sketch")
    // undercount-only, by at most N/capacity
    assert(sketch("hotword") <= 2000L)
    assert(sketch("hotword") >= 2000L - n / cap)
    assert(sketch.size <= cap)
  }

  test("HeavyHitters.merge preserves the Misra-Gries bound across partial merges") {
    // pure Aggregator-level property test: many partial sketches with
    // mostly-disjoint filler vocabularies are merged in a tree — the shape
    // where a truncating (non-subtracting) merge would silently evict a
    // true heavy hitter admitted early. Checks the mergeable-summaries
    // guarantees: undercount-only, error ≤ N/capacity, heavy survivor.
    val cap = 16
    val hh = new graft.functions.HeavyHitters(cap)
    val rnd = new scala.util.Random(7)
    val partitions: Seq[Seq[String]] = (0 until 50).map { p =>
      val fillers = Seq.fill(60)(s"f${p}_${rnd.nextInt(40)}") // per-partition vocab
      rnd.shuffle(Seq.fill(40)("hotword") ++ fillers)
    }
    val n = partitions.map(_.size).sum.toLong
    val exact = partitions.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val partials = partitions.map(_.foldLeft(hh.zero)(hh.reduce))
    val merged = partials.reduce(hh.merge) // left-deep: worst case for eviction
    val out = hh.finish(merged)
    assert(out.size <= cap)
    // undercount-only, and by at most N/capacity, for every surfaced item
    out.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(exact(k) - c <= n / cap, s"$k undercounted past the bound")
    }
    // the planted heavy hitter (2000 = 40×50 > N/capacity) must survive
    assert(exact("hotword") > n / cap)
    assert(out.contains("hotword"), s"true heavy hitter evicted: $out")
  }

  test("SimHash64Expr matches the higher-order-fold implementation exactly") {
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val toks = TextAnalysis.tokens(col("text"))
    GraftExtensions.install(spark) // registers graft_simhash64
    val both = docs.select(
        expr("graft_simhash64(filter(split(text, ' '), t -> t != ''))").as("fast"),
        Dedup.simhash64(toks).as("fold"))
    assert(both.count() == 100)
    assert(both.filter(col("fast") =!= col("fold")).count() == 0)
    // the kernel really went through codegen (not an eval fallback):
    // the expression appears inside the WholeStageCodegen subtree
    val planStr = both.queryExecution.executedPlan.toString
    assert(planStr.contains("graft_simhash64"))
  }

  test("SortedDotExpr matches the join-and-aggregate dot exactly (incl. nulls)") {
    GraftExtensions.install(spark) // registers graft_sorted_dot
    // packed sorted form vs the exploded equi-join + sum it replaced in
    // cosineSelfJoin's verify — r18-opt; null terms must NEVER match
    // (the old join was null-unsafe on the term key)
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
      .select(col("doc_id").as("id"),
        TextAnalysis.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
    val tw = docs.select(col("id"), explode(col("ts")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("long").as("w"))
    val packed = tw.groupBy("id")
      .agg(array_sort(collect_list(struct(col("term"), col("w")))).as("tw"))
    val pairs = packed.select(col("id").as("id_a"), col("tw").as("ta"))
      .crossJoin(packed.select(col("id").as("id_b"), col("tw").as("tb")))
      .filter(col("id_a") < col("id_b"))
    val fast = pairs.select(col("id_a"), col("id_b"),
      expr("graft_sorted_dot(ta, tb)").as("dot"))
    val slow = tw.select(col("id").as("id_a"), col("term"), col("w").as("wa"))
      .join(tw.select(col("id").as("id_b"), col("term"), col("w").as("wb")),
        "term")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("wa") * col("wb")).cast("long").as("dot"))
    // pairs sharing no term: fast yields 0, slow yields no row
    val joined = fast.join(slow.withColumnRenamed("dot", "dot_slow"),
      Seq("id_a", "id_b"), "left")
    assert(joined
      .filter(col("dot") =!= coalesce(col("dot_slow"), lit(0L))).count() == 0)
    assert(fast.count() > 0)
    // the kernel really went through codegen (not an eval fallback)
    assert(fast.queryExecution.executedPlan.toString.contains("graft_sorted_dot"))
    // null terms never match — matching the null-unsafe equi-join
    import spark.implicits._
    val withNull = Seq(
      (Seq((null.asInstanceOf[String], 7L), ("a", 2L), ("b", 3L)),
        Seq((null.asInstanceOf[String], 5L), ("b", 4L), ("c", 9L)))
    ).toDF("ta", "tb")
    assert(withNull.select(expr("graft_sorted_dot(ta, tb)")).head.getLong(0)
      == 12L) // only "b" matches: 3*4; the two NULL terms contribute 0
  }

  test("SqlFunctions: graft_hamming64 and graft_bucket match the Scala ops") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_hamming64(5L, 6L) AS h, graft_bucket(42) AS b").head()
    assert(r.getAs[Number]("h").intValue == 2) // 101 xor 110 = 011
    // the SQL bucket is bit-identical to the Scala sampling assignment
    val ids = (0L until 200L).toDF("id")
    val cmp = ids.select(
      expr("graft_bucket(id)").as("sqlb"),
      graft.ops.Sampling.hashBucket(col("id")).cast("int").as("scalab"))
    assert(cmp.filter(col("sqlb") =!= col("scalab")).count() == 0)
    assert(cmp.filter(col("sqlb") < 0 || col("sqlb") > 255).count() == 0)
  }

  test("CollapseDeduplicate removes a redundant identical-key dedup") {
    // the rule hooks analysis (post-hoc resolution) because the optimizer
    // rewrites Deduplicate into Aggregate before user rules run; here we
    // apply it to the analyzed plan directly, as the injection point does
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    def countDedups(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case d: Deduplicate => d }.size
    val stacked = df.dropDuplicates("k").dropDuplicates("k")
      .queryExecution.analyzed
    assert(countDedups(stacked) == 2)
    assert(countDedups(graft.plans.CollapseDeduplicate(stacked)) == 1,
      "inner identical-key Deduplicate should be collapsed")
    // different key sets must NOT collapse
    val mixed = df.dropDuplicates("k", "v").dropDuplicates("k")
      .queryExecution.analyzed
    assert(countDedups(graft.plans.CollapseDeduplicate(mixed)) == 2,
      "distinct key sets must be preserved")
  }

  test("product path: GraftExtensions-equipped session collapses the stacked dedup exchange") {
    import org.apache.spark.sql.SparkSession
    // Bench/Verify install the extensions via the spark.sql.extensions
    // config, which only takes effect on a fresh SparkContext (it is a
    // static conf) — in-JVM we exercise the identical injection machinery
    // with builder.withExtensions(new GraftExtensions), the same class the
    // config names, on a fresh session over the shared context.
    spark.sparkContext // force the shared context before detaching sessions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extSession = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    try {
      import extSession.implicits._
      val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      val stacked = df.dropDuplicates("k").dropDuplicates("k")
      // analyzer (post-hoc resolution) collapsed the inner dedup...
      assert(stacked.queryExecution.analyzed
        .collect { case d: Deduplicate => d }.size == 1,
        "config-installed rule did not collapse the stacked dedup")
      // ...so the physical plan carries ONE shuffle, not two
      def exchanges(p: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(p.queryExecution.executedPlan.toString).size
      assert(exchanges(stacked) == 1,
        s"stacked dedup should plan exactly one exchange")
      // safety check stays at the analysis layer (where the rule runs):
      // distinct key sets must survive it untouched — what the downstream
      // optimizer (RemoveRedundantAggregates) then does is its business
      assert(df.dropDuplicates("k", "v").dropDuplicates("k")
        .queryExecution.analyzed
        .collect { case d: Deduplicate => d }.size == 2,
        "distinct-key stack must keep both Deduplicates at analysis")
      // the SQL function rides the same config
      assert(extSession.sql("SELECT graft_simhash64(array('a','b')) AS h")
        .head().getLong(0) != 0L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("NfcNormalize: composed == normalized(decomposed), codegen'd, NULL-safe") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val composed = "café"        // é as U+00E9
    val decomposed = "café"     // e + combining acute U+0301
    val df = Seq(Some(decomposed), Some(composed), Some("plain ascii"), None)
      .toDF("t").select(col("t"), expr("graft_nfc(t)").as("n"))
    val rows = df.collect()
    assert(rows(0).getString(1) == composed) // decomposed → composed
    assert(rows(1).getString(1) == composed) // already-NFC fast path: identity
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).isNullAt(1))
    // plan assertion on a range-backed frame (a LocalRelation would be
    // constant-folded and hide the expression from the physical plan)
    val ranged = spark.range(10)
      .select(expr("graft_nfc(CAST(id AS STRING))").as("n"))
    assert(ranged.queryExecution.executedPlan.toString.contains("graft_nfc"))
    assert(ranged.count() == 10)
    // normalizedFingerprint collapses the pair; raw fingerprint does not
    val fps = Seq(composed, decomposed).toDF("text").select(
      TextAnalysis.normalizedFingerprint(col("text")).as("norm"),
      TextAnalysis.fingerprint(col("text")).as("raw")).collect()
    assert(fps(0).getString(0) == fps(1).getString(0))
    assert(fps(0).getString(1) != fps(1).getString(1))
  }

  test("SQL-composed normalized fingerprint equals the Column API") {
    GraftExtensions.install(spark)
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
      .withColumn("text", concat(col("text"), lit(" café"))) // decomposed
    val both = docs.select(
      expr("md5(concat_ws(' ', filter(split(lower(graft_nfc(text)), ' '), t -> t != '')))").as("sqlfp"),
      TextAnalysis.normalizedFingerprint(col("text")).as("apifp"))
    assert(both.filter(col("sqlfp") =!= col("apifp")).count() == 0)
  }

  test("graft_zorder2 matches Layout.interleave16 bit-for-bit") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (43690L, 21845L), (12345L, 54321L)).toDF("a", "b")
    val bad = pairs.select(
        expr("graft_zorder2(a, b)").as("sqlz"),
        graft.ops.Layout.interleave16(col("a"), col("b")).as("scalaz"))
      .filter(col("sqlz") =!= col("scalaz"))
    assert(bad.count() == 0)
    // spot value: full lanes interleave to 32 set bits
    assert(spark.sql("SELECT graft_zorder2(65535, 65535) AS z").as[Long].head()
      == 0xFFFFFFFFL)
  }

  test("graft_spreadbits matches Layout.spreadBits and guards its budget") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val vals = Seq(0L, 1L, 255L, 170L, 85L, 129L).toDF("q")
    // stride 3, 8 bits, all three offsets — the q109 composition
    for (off <- 0 to 2) {
      val bad = vals.select(
          expr(s"graft_spreadbits(q, 3, 8, $off)").as("sqls"),
          graft.ops.Layout.spreadBits(col("q"), 3, 8, off).as("scalas"))
        .filter(col("sqls") =!= col("scalas"))
      assert(bad.count() == 0, s"offset $off diverged")
    }
    // a 3-dim composed key equals zorderKeyN's interleave on the grid
    assert(spark.sql(
      "SELECT graft_spreadbits(255, 3, 8, 0) | graft_spreadbits(255, 3, 8, 1)" +
        " | graft_spreadbits(127, 3, 7, 2) AS z").as[Long].head()
      == (1L << 23) - 1) // 23 contiguous set bits
    // spread must stay inside a non-negative BIGINT
    val e = intercept[Exception] {
      // top bit would land at (21-1)*3 + 3 = 63 — the sign bit
      spark.sql("SELECT graft_spreadbits(1, 3, 21, 3)").collect()
    }
    assert(e.getMessage.contains("non-negative BIGINT"),
      s"budget guard missing: ${e.getMessage}")
    // non-literal stride is rejected loudly, not mis-planned
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_spreadbits(q, CAST(q AS INT), 8, 0) FROM VALUES (1L) t(q)").collect()
    }
    assert(e2.getMessage.contains("integer literal"),
      s"literal guard missing: ${e2.getMessage}")
  }

  test("BpeEncodeExpr: PRIORITY semantics, not one pass per rule") {
    GraftExtensions.install(spark)
    import graft.ops.Vocab
    // rank-0 ("cd","b") can only fire AFTER rank-1 ("c","d") creates its
    // operand: priority gives [cdb]; a sequential training-order replay
    // (Vocab.encode) leaves [cd, b] — the distinction this face exists for
    val rules = Seq(("cd", "b"), ("c", "d"))
    val df = Seq("cdb").toDF("text")
    val prio = df.select(Vocab.encodePriority(col("text"), rules).as("t"))
      .as[Seq[String]].head()
    assert(prio == Seq("cdb"), s"priority face gave $prio")
    val seqn = df.select(col("text")).withColumn("text", col("text"))
    val folded = Vocab.encode(seqn, "text", rules)
      .select(col("bpe_tokens")).as[Seq[String]].head()
    assert(folded == Seq("cd", "b"), s"sequential face gave $folded")
  }

  test("BpeEncodeExpr: overlap runs, multi-space, empty, multibyte, null") {
    GraftExtensions.install(spark)
    import graft.ops.Vocab
    val aa = Seq(("a", "a"))
    def enc(text: String, rules: Seq[(String, String)]): Option[Seq[String]] = {
      val r = Seq(Option(text)).toDF("text")
        .select(Vocab.encodePriority(col("text"), rules).as("t"))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
    }
    // left-to-right non-overlapping: aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(enc("aaa x aaaa", aa).contains(Seq("aa", "a", "x", "aa", "aa")))
    assert(enc("  ", aa).contains(Seq.empty))
    assert(enc("", aa).contains(Seq.empty))
    assert(enc(null, aa).isEmpty, "NULL text must stay NULL")
    // codepoint symbols: 'é' is one symbol, not two UTF-16/UTF-8 units
    assert(enc("éé ß", Seq(("é", "é")))
      .contains(Seq("éé", "ß")))
    // rules can chain onto merged tokens within one word
    assert(enc("cdb cd b", Seq(("cd", "b"), ("c", "d")))
      .contains(Seq("cdb", "cd", "b")))
  }

  test("BpeEncodeExpr equals the training-order fold on the trained corpus") {
    GraftExtensions.install(spark)
    import graft.ops.Vocab
    // training invariant: a rule's operand tokens are produced only by
    // strictly lower-rank rules, so rank order == training order and the
    // two faces agree on every word the rules were trained on
    val docs = graft.sources.Testdata
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(lower(col("text")).as("text"))
    val rules = Vocab.bpeTrain(docs, "text", merges = 6)
    assert(rules.size == 6)
    val both = Vocab.encode(docs, "text", rules)
      .withColumn("prio", Vocab.encodePriority(col("text"), rules))
    assert(both.filter(not(col("bpe_tokens") === col("prio"))).count() == 0)
    // and the kernel went through whole-stage codegen, not an eval fallback
    val planStr = both.queryExecution.executedPlan.toString
    assert(planStr.contains("graft_bpe_encode"))
  }
}

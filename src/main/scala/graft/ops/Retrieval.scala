package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the search face a
  * training-data pipeline needs for query-driven curation (pull the
  * documents most relevant to a capability probe), retrieval-based
  * decontamination (find what a benchmark question would retrieve), and
  * hard-negative mining against a lexical baseline.
  *
  * Scale shape (the reason this is phrased as three joins, not a UDF):
  *
  *  - ONE corpus-scale pass builds the postings frame (doc, term, tf, dl)
  *    — the same partial+final count aggregate every engine's inverted
  *    index starts from. Everything downstream is bounded by the QUERY
  *    vocabulary, not the corpus: the postings are semi-joined against the
  *    broadcast query-term set first, so df counting, per-query fan-out
  *    and scoring all price |postings of query terms|, never |corpus|.
  *  - df/N/avgdl come from the SAME pass (df from the restricted postings
  *    — a term's postings ARE its document frequency; N and total token
  *    count from a 1-row aggregate that broadcasts).
  *  - the only corpus-scale shuffle is the postings groupBy; the scoring
  *    aggregate shuffles (query, doc) pairs for matched docs only.
  *
  * Scoring is EXACT-ARITHMETIC BM25 (k1 = 1.2, b = 0.75), the engine's
  * cross-engine-determinism discipline (see LlmQueries doc): the idf is
  * the rational Robertson ratio (N − df + ½)/(df + ½) WITHOUT the log —
  * strictly positive, strictly decreasing in df, so common terms damp
  * exactly as BM25 intends while every per-term contribution stays the
  * IEEE division of two exact integers:
  *
  *   contrib = [(2N − 2df + 1) · 22·tf·A] / [(2df + 1) · (10·A·tf + 3·A + 9·dl·N)]
  *
  * (A = total corpus tokens, dl = doc length; the second factor is
  * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) with avgdl = A/N put over the
  * common denominator 10·A — no float appears before the final division).
  * Per-(query, doc) scores sum those divisions as DECIMAL(28,12), so the
  * aggregation is order-independent and ranking ties are impossible to
  * drift across partitionings; ties on the exact score break by doc id.
  * The RANKING runs on the exact decimal; the output `score` is its
  * double cast (the engine's output-surface convention — decimal
  * renderings disagree on trailing zeros across engines, doubles don't).
  * Both factors accumulate in DECIMAL(38,0), never a wrappable Long
  * (the DSIR margin discipline — at corpus scale 22·tf·A alone passes
  * 2^63).
  */
object Retrieval {

  /** (doc, term, tf, dl) postings + the restriction/scoring pipeline in
    * one call: top-`k` docs per query by rational-BM25.
    *
    * `queries` is a SMALL frame (a probe set, a benchmark, a mined query
    * log sample — thousands, not corpus-scale): it is broadcast twice
    * (term set, then per-query terms) and duplicate terms within one
    * query count once (bag-of-words queries are overwhelmingly sets; the
    * dedup makes the scoring insensitive to query phrasing repeats).
    *
    * Output: (query id, doc id, n_matched, score double, rank),
    * rank 1..k per query by (score desc, doc id asc). Queries matching
    * nothing produce no rows. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10): DataFrame = {
    val base = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    val postings = base
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // 1-row corpus stats; broadcast into every contribution
    val stats = base.agg(count(lit(1)).cast("long").as("__n"),
      coalesce(sum(col("__dl")), lit(0L)).as("__a"))
    val qterms = queryTerms(queries, qidCol, qtextCol)
    // corpus-scale → query-vocabulary-bounded, ONCE (before the per-query
    // fan-out, so df counts each posting exactly once)
    val qpost = postings.join(broadcast(qterms.select("term").distinct()),
      Seq("term"))
    rankMatches(qpost, idCol, qterms, qidCol, stats, k)
  }

  /** (query id, term) DISTINCT — the query side of every face. */
  private[ops] def queryTerms(queries: DataFrame, qidCol: String,
                              qtextCol: String): DataFrame =
    queries
      .select(col(qidCol), explode(TextAnalysis.tokens(col(qtextCol))).as("term"))
      .distinct()

  /** Scoring tail shared by [[bm25TopK]] and [[RetrievalState.probe]]:
    * `qpost` is the query-vocabulary-restricted postings frame
    * (`idCol`, `__dl`, term, tf) — ONE row per (doc, query term), so df
    * is a plain count — and `stats` a 1-row (`__n`, `__a`) frame. */
  private[ops] def rankMatches(qpost: DataFrame, idCol: String,
                               qterms: DataFrame, qidCol: String,
                               stats: DataFrame, k: Int): DataFrame = {
    val dfs = qpost.groupBy("term").agg(count(lit(1)).as("df"))
    val dec = "decimal(38,0)"
    val num = (lit(2L) * col("__n") - lit(2L) * col("df") + lit(1L)).cast(dec) *
      lit(22L).cast(dec) * col("tf").cast(dec) * col("__a").cast(dec)
    val den = (lit(2L) * col("df") + lit(1L)).cast(dec) *
      (lit(10L).cast(dec) * col("__a").cast(dec) * col("tf").cast(dec) +
        lit(3L).cast(dec) * col("__a").cast(dec) +
        lit(9L).cast(dec) * col("__dl").cast(dec) * col("__n").cast(dec))
    val contrib = (num.cast("double") / den.cast("double"))
      .cast("decimal(28,12)")
    val scored = qpost
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col(qidCol), col(idCol))
      .agg(count(lit(1)).as("n_matched"),
        sum(contrib).cast("decimal(38,12)").as("score"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("score", col("score").cast("double"))
  }

  /** Exact TERM-FREQUENCY cosine self-join: every unordered doc pair
    * whose tf-vector cosine meets `tNum/tDen` — the weighted sibling of
    * [[Dedup.exactJaccardPairs]] (set Jaccard is blind to repetition:
    * a doc and its text doubled share the same token SET; their tf
    * cosine is exactly 1, which is what catches template expansions and
    * boilerplate-stuffed rewrites).
    *
    * Scale shape — never all-pairs: candidates come from a LOSSLESS
    * Cauchy–Schwarz prefix filter. Order each doc's terms by corpus
    * rarity (df asc, term); keep rank r in the prefix while the suffix
    * FROM r could still reach the threshold alone, i.e. while
    * `(nsq − cumBefore(r)) · tDen² ≥ tNum² · nsq` in exact integers.
    * If a pair shares no kept term of doc a, every shared term lies in
    * a's dropped suffix S, and Cauchy–Schwarz gives
    * dot(a,b) ≤ √(Σ_{S} w²)·|b| < t·|a|·|b| — the pair cannot qualify,
    * so prefix(a) ⋈ FULL(b) on the term misses nothing (the
    * [[ExactJoinState]] probe orientation; prefix×prefix needs the
    * sharper positional lemma that only holds for sets). At a high
    * threshold the prefix is the rarest sliver of each doc's weight
    * mass, so candidate lists ride low-df postings; a stopword-heavy
    * corpus at a LOW threshold degrades toward wide candidate lists —
    * inherent to the problem (everything really is similar to
    * everything), not to the plan. Verification is candidate-keyed and
    * exact: dot² · tDen² ≥ tNum² · nsq_a · nsq_b in DECIMAL(38,0),
    * no float anywhere.
    *
    * Output: (id_a < id_b, dot, nsq_a, nsq_b) — all integers; cosine
    * itself is the caller's division. */
  def cosineSelfJoin(docs: DataFrame, idCol: String, textCol: String,
                     tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"threshold must be in (0, 1]: got $tNum/$tDen")
    val dec = "decimal(38,0)"
    val tn2 = lit(tNum).cast(dec) * lit(tNum).cast(dec)
    val td2 = lit(tDen).cast(dec) * lit(tDen).cast(dec)
    val tw = docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("id"), explode(col("ts")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("long").as("w"))
    // df and the squared norm via WINDOWS over the one tf pass, not
    // separate groupBy frames joined back (r18-opt, the
    // exactJaccardPairs restructure): the join form evaluated the
    // corpus tokenize/tf subtree once per reference (tw + nrm + dfT ≈
    // 3 evaluations inside the prefix branch alone); `base` computes
    // the same values in a single pass — one term-keyed and one
    // id-keyed exchange, which the join shape paid anyway.
    val wId = Window.partitionBy("id")
    val base = tw
      .withColumn("tdf", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("nsq", sum(col("w") * col("w")).over(wId))
    val pref = base
      .withColumn("cum_before", coalesce(
        sum(col("w") * col("w")).over(
          wId.orderBy(col("tdf"), col("term"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter((col("nsq") - col("cum_before")).cast(dec) * td2 >=
        tn2 * col("nsq").cast(dec))
      .select(col("id"), col("term"), col("nsq"))
    val ca = pref.select(col("id").as("ia"), col("term"),
      col("nsq").as("na"))
    val full = base
      .select(col("id").as("ib"), col("term"), col("nsq").as("nb"))
    // cand feeds three consumers below (the id union + both verify
    // joins) — cut once or each reference re-runs the prefix/self-join
    // subtree (the exactJaccardPairs discipline); pair-sized pin, four
    // longs per row
    val cand = Lineage.cut(ca.join(full, "term")
      .filter(col("ia") =!= col("ib"))
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        when(col("ia") < col("ib"), col("na")).otherwise(col("nb")).as("nsq_a"),
        when(col("ia") < col("ib"), col("nb")).otherwise(col("na")).as("nsq_b"))
      .distinct())
    // verify (r18-opt, guide §2.3 + §codegen): the exact dot is a
    // single codegen'd sorted-merge over the two docs' PACKED
    // (term, w) arrays — attached only for docs some candidate pair
    // references — instead of fanning every pair out to all of side
    // a's term rows and re-aggregating (two candidate×term exchanges +
    // a fan-out aggregation). An interpreted HOF dot was measured in
    // r17 at +59% wall (lambda-per-element); graft_sorted_dot is the
    // whole-stage-codegen kernel with the same O(|a|+|b|) merge. The
    // packed pin is candidate-bounded (semi-join first), never corpus-
    // sized; array_sort makes the collect_list order deterministic.
    graft.plans.GraftExtensions.install(docs.sparkSession)
    val ids = cand.select(col("id_a").as("id"))
      .unionAll(cand.select(col("id_b").as("id"))).distinct()
    val packed = Lineage.cut(tw.join(ids, Seq("id"), "left_semi")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("term"), col("w")))).as("tw")))
    cand
      .join(packed.select(col("id").as("id_a"), col("tw").as("__tw_a")), "id_a")
      .join(packed.select(col("id").as("id_b"), col("tw").as("__tw_b")), "id_b")
      .withColumn("dot",
        call_function("graft_sorted_dot", col("__tw_a"), col("__tw_b")))
      .filter(col("dot").cast(dec) * col("dot").cast(dec) * td2 >=
        tn2 * col("nsq_a").cast(dec) * col("nsq_b").cast(dec))
      .select("id_a", "id_b", "dot", "nsq_a", "nsq_b")
  }
}

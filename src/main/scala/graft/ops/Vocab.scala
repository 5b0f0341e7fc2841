package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE vocabulary induction — the tokenizer-training step of
  * a training-data pipeline, shaped the way it scales:
  *
  *  - ONE corpus-scale pass builds the word-frequency table (partial+final
  *    count keyed by the word). Everything after runs over DISTINCT words
  *    weighted by frequency — bounded by vocabulary size, not corpus size,
  *    which is why tokenizer training is tractable at 100 TB at all.
  *  - Each BPE round is: pair-count aggregate over the word table
  *    (partial+final, weighted by word freq) → argmax pair (a one-ROW
  *    driver action — the merge rule itself, not data) → map-side
  *    re-segmentation of the word table (a columnar left-to-right fold,
  *    no UDF). `merges` rounds cost `merges` small shuffles of the word
  *    table; the corpus is never touched again.
  *
  * Ties on pair count break lexicographically (a, then b) so the learned
  * merge sequence is deterministic on any partitioning — the
  * reproducibility contract tokenizers need.
  */
object Vocab {

  /** Per-character initial segmentation of a word. */
  private def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))

  /** (word, freq, syms): the corpus reduced to its distinct-word table —
    * the ONLY corpus-scale aggregate in BPE training. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", chars(col("word")))

  /** Adjacent-symbol pair counts over the current segmentation, weighted
    * by word frequency: (a, b, pair_count). The BPE objective function. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        zip_with(slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Apply one merge rule (a, b) → ab to a symbol array: the standard
    * greedy left-to-right pass (an overlapping run "aaa" under (a,a)
    * becomes [aa, a]), as a columnar fold — no UDF, map-side only. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn `merges` BPE merge rules from the corpus. Returns the ordered
    * rule list; stops early when no pair repeats (pair_count < 2 — a rule
    * observed once compresses nothing). Each round's argmax is a one-row
    * action; ties break lexicographically for partition-independence. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): Seq[(String, String)] =
    bpeTrainTrace(docs, textCol, merges).map(t => (t._2, t._3))

  /** [[bpeTrain]] with the full per-round trace: (rank, a, b, pair_count,
    * nb_symbols) where nb_symbols = Σ freq·|syms| over the word table
    * AFTER applying the round's merge — the oracle-checkable face of the
    * trainer (q117 hash-compares every round's argmax AND the
    * segmentation state it left behind, so a greedy-application bug that
    * happens to preserve the next argmax still fails). The nb_symbols
    * probe rides the word table (vocabulary-sized), adding one tiny
    * aggregate per round, never a corpus pass. */
  /** Materialize a word-table round WITH a lineage cut: `persist` caches
    * data but never cuts the LOGICAL plan, so chaining thousands of
    * merge rounds balloons the analyzed plan until AQE's per-query
    * explain rendering alone overflows the driver heap (found at 40
    * rounds in the r15 scale sweep — a 32k-merge vocabulary is ~800×
    * that). Each round therefore re-roots on the materialized rows (the
    * [[Lineage.mark]] discipline), keeping the plan ROUND-LOCAL; the
    * returned RDD handle is the round's unpersist hook. */
  private def cutRound(df: DataFrame)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val spark = df.sparkSession
    val rdd = df.rdd
    Lineage.mark(rdd, spark)
    rdd.count()
    (spark.createDataFrame(rdd, df.schema), rdd)
  }

  def bpeTrainTrace(docs: DataFrame, textCol: String,
                    merges: Int): Seq[(Int, String, String, Long, Long)] = {
    var (words, wrdd) = cutRound(wordTable(docs, textCol))
    val trace = Seq.newBuilder[(Int, String, String, Long, Long)]
    var done = false
    var i = 0
    while (i < merges && !done) {
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1).collect()
      top.headOption.filter(_.getAs[Long]("pair_count") >= 2) match {
        case Some(r) =>
          val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
          val (next, nrdd) = cutRound(
            words.withColumn("syms", applyMerge(col("syms"), a, b)))
          val nbSyms = next
            .select(sum(col("freq") * size(col("syms"))).cast("long").as("n"))
            .head().getLong(0)
          trace += ((i + 1, a, b, r.getAs[Long]("pair_count"), nbSyms))
          wrdd.unpersist(blocking = false)
          words = next
          wrdd = nrdd
        case None => done = true
      }
      i += 1
    }
    wrdd.unpersist(blocking = false)
    trace.result()
  }

  /** Adjacent-symbol TRIPLE counts over the current segmentation —
    * the batched trainer's raised-pair bound source: after merging
    * (a, b) → ab, every pair the merge CREATES or RAISES is (x, ab)
    * or (ab, y), and its gained count is at most the count of the
    * triple (x, a, b) / (a, b, y) (each gained adjacency contains that
    * triple; the quadruple patterns behind (ab, ab) contain both).
    * Vocabulary-segment-bound like [[pairCounts]], one extra aggregate
    * per ROUND, never a corpus pass. */
  def tripleCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 3)
      .select(col("freq"), explode(
        zip_with(
          zip_with(slice(col("syms"), lit(1), size(col("syms")) - 2),
            slice(col("syms"), lit(2), size(col("syms")) - 2),
            (x, y) => struct(x.as("t1"), y.as("t2"))),
          slice(col("syms"), lit(3), size(col("syms")) - 2),
          (xy, z) => struct(xy.getField("t1").as("t1"),
            xy.getField("t2").as("t2"), z.as("t3")))).as("t"))
      .groupBy(col("t.t1").as("t1"), col("t.t2").as("t2"), col("t.t3").as("t3"))
      .agg(sum(col("freq")).as("triple_count"))

  /** [[bpeTrain]] in BATCHED rounds (VERDICT r14 #6): the sequential
    * trainer runs one distributed pair-count job per merge — a
    * driver-side job-count bottleneck at a real 32k–64k-merge
    * vocabulary. Each batched round runs TWO aggregates (pair counts +
    * triple counts) and then applies the longest prefix of the static
    * rank order that is PROVABLY what sequential training would pick:
    *
    *  - exact decrease accounting: merging (a, b) → ab changes ONLY
    *    pairs of the forms (x, a) with the x·a·b triple present
    *    (decreased by at most that triple's count), (b, y) with a·b·y
    *    present (same), (a, b) itself (residual 0 — greedy consumes
    *    every adjacency), and pairs touching the new token ab (raised).
    *    Same-side sharing is FREE ((a, x) and (x, b) counts never
    *    move), so a later candidate sharing symbols with an earlier
    *    merge is accepted as long as its LOWER bound (static count
    *    minus the summed matching triple counts) still wins;
    *  - rank-gap safety: a raised pair's count is at most the worst
    *    static count of a pair touching any merged string plus the TWO
    *    largest per-merge triple gains (a pair has two sides, so at
    *    most two accepted merges can raise it — the per-candidate
    *    ledger of VERDICT r15 #8; the earlier summed-over-the-batch
    *    bound grew linearly in batch length and ended long batches
    *    early) — a candidate is accepted only while its lower bound
    *    STRICTLY beats that and the next candidate's static count;
    *  - candidates containing an earlier merge's token are never
    *    accepted (their count moved UP by an amount only a deeper
    *    n-gram pass could pin), and everything else is static rank
    *    order: the batch is a prefix, so any non-batch pair sits at or
    *    below the last accepted count with the (count desc, a, b)
    *    tie-break in the batch's favor.
    *
    * The first rejection ends the batch (falling back toward
    * sequential — a round always applies at least the static argmax,
    * which IS the sequential argmax on an up-to-date table), so the
    * returned rule list equals [[bpeTrain]]'s exactly (unit-tested on
    * the golden fixture and random corpora). Returns (rules, rounds);
    * rounds is the distributed-job-budget observable. `window` caps
    * the per-round candidate prefix (driver rows and the map-side fold
    * depth of the batch apply). */
  def bpeTrainBatched(docs: DataFrame, textCol: String, merges: Int,
                      window: Int = 32): (Seq[(String, String)], Int) = {
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    var (words, wrdd) = cutRound(wordTable(docs, textCol))
    val rules = Seq.newBuilder[(String, String)]
    var taken = 0
    var rounds = 0
    var done = false
    while (taken < merges && !done) {
      val m = math.min(window, merges - taken)
      val cand = pairCounts(words)
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(m).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          r.getAs[Long]("pair_count")))
        .filter(_._3 >= 2)
      if (cand.isEmpty) done = true
      else {
        rounds += 1
        // exact raised-pair bounds for the candidate window: one triple
        // aggregate + two broadcast joins, all candidate-bounded
        val candDf = spark.createDataFrame(
          cand.map(c => (c._1, c._2)).toSeq).toDF("ca", "cb")
        val candToks = cand.flatMap(c => Seq(c._1, c._2)).distinct.toSeq
        val tc = tripleCounts(words)
          .persist(StorageLevel.MEMORY_AND_DISK)
        def maxBy(cond: Column): Map[(String, String), Long] =
          tc.join(broadcast(candDf), cond)
            .groupBy("ca", "cb").agg(max(col("triple_count")).as("mx"))
            .collect()
            .map(r => (r.getAs[String]("ca"), r.getAs[String]("cb")) ->
              r.getAs[Long]("mx")).toMap
        val raisedLeft = maxBy(col("t2") === col("ca") && col("t3") === col("cb"))
        val raisedRight = maxBy(col("t1") === col("ca") && col("t2") === col("cb"))
        // exact triples whose pair is a candidate and whose third symbol
        // is a candidate token — the decrease ledger for shared-symbol
        // batching (candidate-window-bounded rows)
        val tripleR = tc // (a_i, b_i, y): decreases (b_i, y)
          .join(broadcast(candDf),
            col("t1") === col("ca") && col("t2") === col("cb"))
          .filter(col("t3").isin(candToks: _*))
          .collect().map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
            r.getAs[String]("t3")) -> r.getAs[Long]("triple_count")).toMap
        val tripleL = tc // (x, a_i, b_i): decreases (x, a_i)
          .join(broadcast(candDf),
            col("t2") === col("ca") && col("t3") === col("cb"))
          .filter(col("t1").isin(candToks: _*))
          .collect().map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"),
            r.getAs[String]("t3")) -> r.getAs[Long]("triple_count")).toMap
        tc.unpersist()
        // static counts of pairs touching a candidate's merged STRING
        // (the merged token may collide with a pre-existing symbol)
        val mergedDf = spark.createDataFrame(
          cand.map(c => Tuple1(c._1 + c._2)).toSeq).toDF("t")
        val sMax = pairCounts(words)
          .join(broadcast(mergedDf), col("a") === col("t") || col("b") === col("t"))
          .groupBy("t").agg(max(col("pair_count")).as("mx"))
          .collect().map(r => r.getAs[String]("t") -> r.getAs[Long]("mx")).toMap
        // driver walk: longest provably-sequential prefix. A pair can
        // gain from SEVERAL batch merges (one per adjacent merged
        // token), so the raised bound sums the per-merge gains and adds
        // the worst static count of a pair touching any merged string.
        // Shared symbols are allowed through exact decrease accounting:
        // candidate j's count after the earlier merges is at least its
        // static count minus the matching (x, a_i, b_i) / (a_i, b_i, y)
        // triple counts (static triples over-count decreases once
        // earlier merges consumed some occurrences — a valid lower
        // bound, since accepted pairs never contain merged tokens, so
        // no earlier merge can CREATE (a_i, b_i) adjacencies).
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var mergedToks = Set.empty[String]
        // per-candidate raised-pair LEDGER (VERDICT r15 #8): a pair has
        // two sides, so at most TWO distinct accepted merges can raise
        // it (one per side — a gained (x, t_i) adjacency embeds merge
        // i's triple on the right, (t_i, y) on the left, and (t_i, t_j)
        // embeds one of each). Any raised pair is therefore bounded by
        // the worst static count of a pair touching a merged string
        // PLUS THE TWO LARGEST per-merge gains — not the sum over the
        // whole batch, which grew linearly in batch length and ended
        // every long batch early.
        var gTop1 = 0L
        var gTop2 = 0L
        var maxS = 0L
        var stop = false
        for (((a, b, c), idx) <- cand.zipWithIndex if !stop) {
          val t = a + b
          val noMergedTok = !mergedToks(a) && !mergedToks(b) && !mergedToks(t) &&
            !accepted.contains((a, b))
          // merge (ai, bi) decreases (bi, y) by ≤ triple(ai, bi, y) and
          // (x, ai) by ≤ triple(x, ai, bi); same-side sharing is free
          val dec = accepted.iterator.map { case (ai, bi) =>
            (if (bi == a) tripleR.getOrElse((ai, bi, b), 0L) else 0L) +
              (if (ai == b) tripleL.getOrElse((a, ai, bi), 0L) else 0L)
          }.sum
          val lower = c - dec
          // every other live pair at this step is bounded by the next
          // candidate's static count (window prefix + rank order; after
          // the window's end, by this row's own count — conservative),
          // or by the raised-pair bound when it touches a merged token
          val othersStatic =
            if (idx + 1 < cand.length) cand(idx + 1)._3 else c
          // ties against STATIC pairs are safe when this candidate's
          // count is provably unchanged (dec == 0): the (count, a, b)
          // rank already broke that tie in its favor. A decreased count
          // hitting a tie is not (runtime tie-break is lexicographic
          // only), and ties against RAISED pairs never are (their names
          // are unknown) — both stay strict.
          val gapSafe = accepted.isEmpty ||
            (lower > maxS + gTop1 + gTop2 &&
              (lower > othersStatic || (dec == 0L && lower >= othersStatic)))
          if (noMergedTok && gapSafe && lower >= 2) {
            accepted += ((a, b))
            mergedToks += t
            val g = math.max(raisedLeft.getOrElse((a, b), 0L),
              raisedRight.getOrElse((a, b), 0L))
            if (g >= gTop1) { gTop2 = gTop1; gTop1 = g }
            else if (g > gTop2) gTop2 = g
            maxS = math.max(maxS, sMax.getOrElse(t, 0L))
          } else stop = true
        }
        val batch = accepted.result()
        rules ++= batch
        taken += batch.size
        val (next, nrdd) = cutRound(words
          .withColumn("syms", batch.foldLeft(col("syms")) {
            case (acc, (a, b)) => applyMerge(acc, a, b)
          }))
        wrdd.unpersist(blocking = false)
        words = next
        wrdd = nrdd
      }
    }
    wrdd.unpersist(blocking = false)
    (rules.result(), rounds)
  }

  /** Segment the corpus with a learned rule list: the map-side encode path
    * (rules fold in training order over each word — no shuffle at all).
    * Returns docs plus `bpe_tokens` (the subword stream) and
    * `nb_bpe_tokens`. */
  def encode(docs: DataFrame, textCol: String,
             rules: Seq[(String, String)]): DataFrame = {
    val seg = (w: Column) =>
      rules.foldLeft(chars(w)) { case (acc, (a, b)) => applyMerge(acc, a, b) }
    docs
      .withColumn("bpe_tokens",
        flatten(transform(TextAnalysis.tokens(col(textCol)), w => seg(w))))
      .withColumn("nb_bpe_tokens", size(col("bpe_tokens")))
  }

  /** PRIORITY-semantics encode — the merge-list algorithm every deployed
    * BPE tokenizer runs (repeatedly merge the lowest-RANK adjacent pair;
    * see [[graft.functions.BpeEncodeExpr]]): the face to use on text the
    * rules were NOT trained on. [[encode]] above replays rules in
    * training order, one pass each — on the TRAINING corpus the two
    * agree (a rule's operand tokens are produced only by strictly
    * lower-rank rules, so rank order and training order coincide;
    * property-tested in CatalystExtSpec), but on unseen text a low-rank
    * rule whose operand appears only after a higher-rank merge fires
    * must wait for it, which only the priority face honors. Codegen'd
    * scalar kernel with a distinct-word memo — prices distinct words,
    * not corpus tokens. Requires [[graft.plans.GraftExtensions]]
    * installed (registers `graft_bpe_encode`). */
  def encodePriority(text: Column, rules: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", text,
      typedlit(rules.map(r => Seq(r._1, r._2))))
}

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
  def bpeTrainTrace(docs: DataFrame, textCol: String,
                    merges: Int): Seq[(Int, String, String, Long, Long)] = {
    var words = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()
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
          val next = words
            .withColumn("syms", applyMerge(col("syms"), a, b))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nbSyms = next
            .select(sum(col("freq") * size(col("syms"))).cast("long").as("n"))
            .head().getLong(0)
          trace += ((i + 1, a, b, r.getAs[Long]("pair_count"), nbSyms))
          words.unpersist()
          words = next
        case None => done = true
      }
      i += 1
    }
    words.unpersist()
    trace.result()
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
}

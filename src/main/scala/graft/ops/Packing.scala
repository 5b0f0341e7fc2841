package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins — the
  * example-packing step that turns a corpus into dense training batches.
  *
  * Greedy sequential first-fit is inherently order-dependent, so it cannot
  * be a window function; instead of a UDF or a driver loop, the packing is
  * a fold (`aggregate`) over each group's id-sorted doc list. Higher-order
  * -function lambdas bind the accumulator as a variable (no expression-tree
  * blowup), the fold runs once per group at codegen speed, and groups pack
  * in parallel.
  *
  * 100 TB posture: one shuffle keyed on the group; `collect_list` is
  * bounded by the group size (the caller picks a group granularity that
  * fits memory — packing is only meaningful within bounded windows anyway,
  * a global sequential pack would serialize the corpus). */
object Packing {

  /** Pack docs into bins of token capacity `cap`, in ascending id order
    * within each group. A doc that doesn't fit opens the next bin; an
    * oversized doc gets a bin of its own (bins are never empty). Returns
    * (idCol, grp, bin). */
  def packSequential(df: DataFrame, idCol: String, tokCol: String,
                     group: Column, cap: Long): DataFrame = {
    val grouped = df.groupBy(group.as("grp"))
      .agg(sort_array(collect_list(struct(
        col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("t")))).as("docs"))
    val init = expr(
      "named_struct('bin', CAST(0 AS BIGINT), 'fill', CAST(0 AS BIGINT), " +
        "'out', CAST(array() AS ARRAY<STRUCT<id: BIGINT, bin: BIGINT>>))")
    def step(acc: Column, d: Column): Column = {
      val overflow = acc.getField("fill") > 0 &&
        acc.getField("fill") + d.getField("t") > cap
      val newBin = when(overflow, acc.getField("bin") + 1)
        .otherwise(acc.getField("bin"))
      val newFill = when(overflow, d.getField("t"))
        .otherwise(acc.getField("fill") + d.getField("t"))
      struct(newBin.as("bin"), newFill.as("fill"),
        concat(acc.getField("out"),
          array(struct(d.getField("id").as("id"), newBin.as("bin")))).as("out"))
    }
    grouped
      .withColumn("packed",
        aggregate(col("docs"), init, step, acc => acc.getField("out")))
      .select(col("grp"), explode(col("packed")).as("p"))
      .select(col("p.id").as(idCol), col("grp"), col("p.bin").as("bin"))
  }

  /** Sliding-window token chunking: cut each doc's token stream into
    * windows of `chunkSize` tokens advancing by `chunkSize - overlap` —
    * the long-document splitting step of sequence prep (every token lands
    * in ≥ 1 chunk; consecutive chunks share `overlap` tokens of context).
    * A doc with ≤ chunkSize tokens yields exactly one chunk; empty docs
    * yield none. Pure per-row transform + posexplode: linear work, no
    * shuffle, chunk count = 1 + ⌈(n − chunkSize) ∕ stride⌉. Returns one
    * row per chunk: (idCol, chunk_idx, n_tokens, chunk_text). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize) (got $overlap of $chunkSize)")
    val stride = chunkSize - overlap
    val n = size(col("__toks"))
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(((n - chunkSize + (stride - 1)) / stride).cast("int") + 1)
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("__toks"), i * stride + 1, lit(chunkSize)))).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}

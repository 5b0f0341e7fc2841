package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level monitoring operators: distribution drift between
  * snapshots — the observability layer a week-scale incremental pipeline
  * needs (a crawler config change or a broken source shows up as a shape
  * shift in doc-length / quality / per-source histograms long before it
  * shows up in downstream evals).
  *
  * Determinism contract: histogram compare is EXACT integer arithmetic
  * end to end — per-bucket share gaps are computed as cross-multiplied
  * numerators |c_a·tot_b − c_b·tot_a| (never a float subtraction of two
  * divisions), so the report is oracle-hash-checkable and byte-stable
  * across engines/partitionings. The cross-multiply runs in
  * DECIMAL(38,0) (a product of two int64 counts needs up to 38 digits —
  * BIGINT wraps silently past ~3·10⁹ rows/side with ANSI off, yielding
  * a wrong-but-plausible drift report); the BIGINT `gap_num` surface is
  * kept for the oracle face and RAISES if the exact value doesn't fit,
  * rather than wrapping. One IEEE division only at the ppm surface,
  * correctly rounded hence also deterministic (the double denominator
  * product is exact below 2⁵³ and correctly rounded above).
  *
  * 100 TB posture: each snapshot is reduced map-side to (bucket, count)
  * partials — the only thing on any exchange is a bucket id and a long;
  * totals ride a 1-row broadcast frame, the bucket join is
  * nBuckets-sized.
  */
object Monitor {

  /** Fixed-width bucket id: `least(value div width, nBuckets−1)`, NULLs
    * and negatives clamp to bucket 0 — fixed edges (not quantiles) so
    * two snapshots bucket identically regardless of their contents.
    * Exact `div` integer division (the Column `/` is IEEE double). */
  def bucketOf(valueCol: String, bucketWidth: Long, nBuckets: Int): Column =
    expr(s"least(greatest(coalesce(CAST(`$valueCol` AS BIGINT), " +
      s"CAST(0 AS BIGINT)), CAST(0 AS BIGINT)) div $bucketWidth, " +
      s"CAST(${nBuckets - 1} AS BIGINT))")

  /** Exact cross-multiplied gap numerator |c_a·tot_b − c_b·tot_a| in
    * DECIMAL(38,0): int64 counts are widened to DECIMAL(19,0) first so
    * the products (≤ ~8.5·10³⁷, 38 digits) never wrap. */
  private def gapDec(cA: Column, totA: Column, cB: Column, totB: Column): Column =
    abs(cA.cast("decimal(19,0)") * totB.cast("decimal(19,0)") -
      cB.cast("decimal(19,0)") * totA.cast("decimal(19,0)"))

  /** BIGINT face of the exact numerator: errors loudly (raise_error)
    * instead of wrapping when the exact value exceeds Long.MaxValue —
    * at that scale pass `decimalGap = true` to keep the exact
    * DECIMAL(38,0) surface instead. */
  private def gapLong(g: Column): Column =
    when(g <= lit(Long.MaxValue).cast("decimal(19,0)"), g.cast("long"))
      .otherwise(raise_error(concat(
        lit("Monitor histogram drift: exact gap_num overflows BIGINT ("),
        g.cast("string"),
        lit(") — rerun with decimalGap = true for the exact decimal surface"))))

  private def gapFace(g: Column, decimalGap: Boolean): Column =
    if (decimalGap) g else gapLong(g)

  /** ppm surface: one IEEE division, denominator as a double product
    * (exact below 2⁵³, correctly rounded above — never an int64 wrap). */
  private def ppm(g: Column, totA: Column, totB: Column): Column =
    (g.cast("double") * 1000000.0 / (totA.cast("double") * totB.cast("double")))
      .cast("double")

  /** Histogram drift between snapshots `a` and `b` on `valueCol`: one
    * row per bucket with both counts and the exact share-gap numerator
    * `gap_num = |c_a·tot_b − c_b·tot_a|` (the L1 drift is
    * Σ gap_num ∕ (tot_a·tot_b); `gap_ppm` surfaces each bucket's term in
    * parts-per-million, NULL when a snapshot is empty — no total to
    * normalize by, matching [[histogramDriftBy]]'s vanished-group
    * semantics, never a NaN). Missing buckets count 0 on the absent
    * side.
    *
    * `decimalGap = true` keeps `gap_num` as the exact DECIMAL(38,0)
    * instead of BIGINT — the escape hatch for snapshots past ~3·10⁹
    * rows/side, where the exact numerator can exceed int64 and the
    * default surface raises rather than wraps (review r12: the raise
    * previously had no reachable exact alternative). */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
                     bucketWidth: Long, nBuckets: Int,
                     decimalGap: Boolean = false): DataFrame =
    histogramDriftFromHists(
      histogram(a, valueCol, bucketWidth, nBuckets),
      histogram(b, valueCol, bucketWidth, nBuckets), decimalGap)

  /** One snapshot's bucket histogram `(bucket, cnt)` — the reusable half
    * of [[histogramDrift]]: a STATIC reference's histogram can be
    * computed once (it is nBuckets rows) and compared against many
    * deltas via [[histogramDriftFromHists]], instead of re-aggregating
    * the reference corpus per comparison (review r12: the streaming
    * drift sink was re-scanning the full reference every micro-batch). */
  def histogram(df: DataFrame, valueCol: String, bucketWidth: Long,
                nBuckets: Int): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 0,
      s"invalid histogram shape: width=$bucketWidth n=$nBuckets")
    df.groupBy(bucketOf(valueCol, bucketWidth, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[histogramDrift]] over two pre-computed [[histogram]] frames —
    * byte-identical output to the frame-level entry point. */
  def histogramDriftFromHists(ha: DataFrame, hb: DataFrame,
                              decimalGap: Boolean = false): DataFrame = {
    val joined = ha.select(col("bucket"), col("cnt").as("c_a"))
      .join(hb.select(col("bucket"), col("cnt").as("c_b")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val totals = joined.agg(
      sum(col("c_a")).as("__tot_a"), sum(col("c_b")).as("__tot_b"))
    joined.crossJoin(broadcast(totals))
      .withColumn("__gap", gapDec(col("c_a"), col("__tot_a"), col("c_b"), col("__tot_b")))
      .withColumn("gap_num", gapFace(col("__gap"), decimalGap))
      .withColumn("gap_ppm",
        when(col("__tot_a") > 0 && col("__tot_b") > 0,
          ppm(col("__gap"), col("__tot_a"), col("__tot_b"))))
      .drop("__gap", "__tot_a", "__tot_b")
  }

  /** Per-group drift — [[histogramDrift]] stratified on `groupCol`
    * (source, language): each group's histograms are compared against
    * that group's OWN totals, so a stable giant source can't mask a
    * collapsed small one (the per-source page-worthy alert). A group
    * absent from one snapshot entirely is the loudest signal: its
    * `gap_ppm` is NULL (no total to normalize by) while `gap_num` and
    * the zero-filled counts still report it. Exchanges carry
    * (group, bucket, count) only; per-group totals are a
    * group-cardinality-sized broadcast join. */
  def histogramDriftBy(a: DataFrame, b: DataFrame, valueCol: String,
                       groupCol: String, bucketWidth: Long,
                       nBuckets: Int, decimalGap: Boolean = false): DataFrame = {
    require(bucketWidth > 0 && nBuckets > 0,
      s"invalid histogram shape: width=$bucketWidth n=$nBuckets")
    def hist(df: DataFrame, out: String): DataFrame =
      df.groupBy(col(groupCol).as("grp"),
          bucketOf(valueCol, bucketWidth, nBuckets).as("bucket"))
        .agg(count(lit(1)).as(out))
    val joined = hist(a, "c_a").join(hist(b, "c_b"),
        Seq("grp", "bucket"), "full_outer")
      .select(col("grp"), col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val totals = joined.groupBy(col("grp"))
      .agg(sum(col("c_a")).as("__tot_a"), sum(col("c_b")).as("__tot_b"))
    joined.join(broadcast(totals), Seq("grp"))
      .withColumn("__gap", gapDec(col("c_a"), col("__tot_a"), col("c_b"), col("__tot_b")))
      .withColumn("gap_num", gapFace(col("__gap"), decimalGap))
      .withColumn("gap_ppm",
        when(col("__tot_a") > 0 && col("__tot_b") > 0,
          ppm(col("__gap"), col("__tot_a"), col("__tot_b"))))
      .drop("__gap", "__tot_a", "__tot_b")
      .withColumnRenamed("grp", groupCol)
  }

  /** Per-group QUANTILE drift between two log-histogram sketch frames
    * (VERDICT r13 #6 — [[Sketches.logHistogram]] output, fresh or read
    * back from a [[Sketches.lhUpdateState]] state via
    * [[Sketches.readState]]): for each group and each named quantile
    * `(name, qNum, qDen)`, both sides' bucket lower bounds plus the
    * exact integer shift `<name>_shift = <name>_b − <name>_a`. Where
    * [[histogramDriftBy]] reports per-bucket SHARE movement (sensitive
    * to any reshuffling), this reports ORDER-STATISTIC movement — the
    * "documents got 4× longer from source X" crawler-change signal,
    * answered from ≤ 8·61 counters per group per side, never a corpus
    * rescan. Everything is the log-bucket integer arithmetic of
    * [[Sketches.logQuantilesFromHist]], so the report hash-replays in
    * the oracle. A group present on only one side reports NULL on the
    * missing side and a NULL shift — the vanished-group posture of
    * [[histogramDriftBy]]: the loudest signal, never a dropped row. */
  def quantileDriftFromHists(ha: DataFrame, hb: DataFrame, groupCol: String,
                             quantiles: Seq[(String, Long, Long)]): DataFrame = {
    def side(h: DataFrame, suf: String): DataFrame =
      quantiles.foldLeft(Sketches.logQuantilesFromHist(h, groupCol, quantiles)) {
        case (df, (name, _, _)) => df.withColumnRenamed(name, s"${name}_$suf")
      }
    val joined = side(ha, "a").join(side(hb, "b"), Seq(groupCol), "full_outer")
    quantiles.foldLeft(joined) { case (df, (name, _, _)) =>
      df.withColumn(s"${name}_shift", col(s"${name}_b") - col(s"${name}_a"))
    }
  }

  /** [[quantileDriftFromHists]] over two raw frames — builds each side's
    * log-histogram first (one map-side pass per corpus). */
  def quantileDrift(a: DataFrame, b: DataFrame, groupCol: String,
                    value: Column,
                    quantiles: Seq[(String, Long, Long)]): DataFrame =
    quantileDriftFromHists(
      Sketches.logHistogram(a, groupCol, value),
      Sketches.logHistogram(b, groupCol, value), groupCol, quantiles)

  /** Embedding-distribution drift between two snapshots — the embedding
    * column's analog of [[histogramDrift]], catching encoder-version
    * swaps and stuck-feature ingest faults that scalar histograms can't
    * see. One diagonal-moments pass per side (d cells of exact integer
    * sums on the shared 2^20 fixed-point grid — the [[Pca]] contract,
    * map-side partial aggregation, exchange 2·d pre-combined cells at
    * any corpus size), joined per dimension; the mean/variance
    * faces and the two-sample normalized shift
    * z = (mean_b − mean_a) ∕ sqrt(var_a∕n_a + var_b∕n_b)
    * are pinned double chains over the exact longs, so the whole report
    * is oracle-replayable bit-for-bit. Zero-variance-both-sides
    * dimensions get NULL z (mean_shift still reports). The per-dimension
    * join is FULL OUTER: a dimension present in only one snapshot — the
    * encoder-dimensionality swap itself — reports NULL stats on the
    * missing side (histogramDriftBy's vanished-group posture: the
    * loudest signal, never silence), not a silently dropped row. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
                     quantScale: Double = (1L << 20).toDouble): DataFrame =
    embeddingDriftFromMoments(
      diagMoments(a, vecCol, quantScale),
      diagMoments(b, vecCol, quantScale), quantScale)

  /** Per-dimension diagonal moments (i, n, s1, s2) on the shared grid —
    * the reusable half of [[embeddingDrift]]: the streaming face
    * ([[graft.streaming.Streaming.embedDriftSink]]) computes the
    * reference side ONCE and pins it across micro-batches. */
  def diagMoments(df: DataFrame, vecCol: String,
                  quantScale: Double = (1L << 20).toDouble): DataFrame =
    df.select(posexplode(Similarity.quantize(col(vecCol), quantScale))
        .as(Seq("i", "qi")))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("s1"),
        sum(col("qi") * col("qi")).as("s2"))

  /** [[embeddingDrift]] from pre-computed [[diagMoments]] frames — the
    * same pinned chains, so a drift report built from a persisted or
    * checkpointed reference is bit-identical to the two-corpus call. */
  def embeddingDriftFromMoments(ma: DataFrame, mb: DataFrame,
                                quantScale: Double = (1L << 20).toDouble): DataFrame = {
    def side(m: DataFrame, suf: String): DataFrame =
      m.select(col("i"), col("n").as(s"n_$suf"),
        col("s1").as(s"s1_$suf"), col("s2").as(s"s2_$suf"))
    def d(c: Column) = c.cast("double")
    def mean(suf: String): Column =
      d(col(s"s1_$suf")) / d(col(s"n_$suf")) / quantScale
    def variance(suf: String): Column =
      (d(col(s"n_$suf")) * d(col(s"s2_$suf"))
        - d(col(s"s1_$suf")) * d(col(s"s1_$suf"))) /
        (d(col(s"n_$suf")) * d(col(s"n_$suf"))) / (quantScale * quantScale)
    val sem2 = variance("a") / d(col("n_a")) + variance("b") / d(col("n_b"))
    side(ma, "a").join(side(mb, "b"), Seq("i"), "full_outer")
      .withColumn("mean_a", mean("a"))
      .withColumn("mean_b", mean("b"))
      .withColumn("mean_shift", col("mean_b") - col("mean_a"))
      .withColumn("shift_z", when(sem2 > 0, col("mean_shift") / sqrt(sem2)))
  }
}

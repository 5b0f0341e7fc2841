package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering keys for
  * scan pruning at scale.
  *
  * A 100 TB lake is read through file- and row-group-level min/max stats
  * (Parquet footers, manifest pruning). Sorting by ONE column gives
  * perfect stats on that column and useless stats on every other; a
  * Z-order key bit-interleaves several dimensions so that a range-sorted
  * write yields files whose min/max envelope is narrow in ALL interleaved
  * dimensions at once — a predicate on any of them prunes files. This is
  * the layout lever behind `OPTIMIZE ... ZORDER BY` in lakehouse engines,
  * rebuilt here from first principles as pure Column arithmetic.
  *
  * Determinism contract (the repo-wide rule): quantization is exact
  * integer arithmetic (`div`, no doubles), the bit spread is a shift-or-
  * mask chain — every engine with bigint bitwise ops reproduces the key
  * bit-for-bit, so a Z-order key is also a legitimate oracle-checked
  * query output, not just a write-side hint.
  *
  * 100 TB posture: one dimension-sized min/max aggregate broadcast back
  * (same shape as [[Sampling.temperatureSample]]'s count frame); the key
  * itself is map-side codegen'd arithmetic. The write is ONE range
  * shuffle on the key — the same single-shuffle budget as any sorted
  * write, buying pruning on two dimensions instead of one.
  */
object Layout {

  /** Morton spread: distribute the low 16 bits of a non-negative long
    * over the even bit positions of a 32-bit lane (bit i → bit 2i) via
    * the classic shift-or-mask chain. Chain constants are the textbook
    * magic masks; each step doubles the gap between occupied bit groups.
    */
  def spread16(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(x.cast("long")) { case (acc, (s, mask)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(mask))
      }

  /** Interleave two pre-quantized 16-bit lanes: a gets the even bits,
    * b the odd — the 32-bit Morton code. */
  def interleave16(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Linear quantizer onto the full `[0, 2^bits)` grid in EXACT integer
    * arithmetic: `q = ((x − min) · (2^bits − 1)) div (max − min)`,
    * computed in DECIMAL — overflow-safe over the FULL int64 domain
    * (ADVICE r11: the BIGINT form wrapped silently once the range passed
    * ~1.4e14 — epoch-micros timestamps, hash keys — and `mx − mn` itself
    * wrapped for signed extremes, corrupting keys with no error). An
    * int64 difference needs ≤ 20 digits and the product ≤ ~25, so
    * DECIMAL(38,0) holds every intermediate exactly; the result is
    * bit-identical to the old BIGINT path wherever that path didn't
    * overflow, and engine-neutral (integer division truncates identically
    * on non-negative operands everywhere).
    *
    * Normalizing to the FULL grid (not a width-based `div`) matters for
    * layout quality: it puts every dimension's information at the same
    * bit significance, so a small-range dimension (`0..63` file ids)
    * interleaves on equal terms with a wide one (`0..10⁹` timestamps) —
    * a magnitude-preserving quantizer parks the small dimension in the
    * key's low bits and its pruning vanishes (caught by LayoutSpec /
    * StatsManifestSpec when this was tried). A constant column
    * (max = min) quantizes to 0; NULL passes through. */
  private def quantize(c: String, mn: String, mx: String, bits: Int): Column = {
    val top = (1L << bits) - 1
    // value goes through the SAME BIGINT truncation as the min/max stats
    // before widening to DECIMAL — a direct fractional→DECIMAL cast
    // rounds HALF_UP where the stats' long cast truncates, letting a
    // double column quantize outside [0, 2^bits) (caught in review r12).
    // The value is CLAMPED into [mn, mx] first: a no-op when the stats
    // are the observed min/max, and the correctness condition when the
    // caller declares bounds ([[zorderKeyN]]'s `bounds`) — an unclamped
    // out-of-range value would quantize outside [0, 2^bits) and the bit
    // spread would silently alias it into a wrong key
    val x = "CAST(CAST(least(greatest(" +
      s"CAST(`$c` AS BIGINT), CAST(`$mn` AS BIGINT)), " +
      s"CAST(`$mx` AS BIGINT)) AS BIGINT) AS DECIMAL(20,0))"
    val lo = s"CAST(`$mn` AS DECIMAL(20,0))"
    val hi = s"CAST(`$mx` AS DECIMAL(20,0))"
    expr(s"CASE WHEN `$c` IS NULL THEN CAST(NULL AS BIGINT) " +
      s"WHEN `$mx` <= `$mn` THEN CAST(0 AS BIGINT) " +
      s"ELSE (($x - $lo) * ${top}L) div ($hi - $lo) END")
  }

  /** Collision-free staging prefix for the broadcast stats columns (the
    * Blocklist ADVICE r11 remedy applied here too, via the shared
    * [[ColumnNames]] probe). */
  private def statsTag(df: DataFrame): String =
    ColumnNames.freePrefix(df, "__graft_z")

  /** Add a Z-order key over two numeric columns, each quantized to 16
    * bits against its corpus min/max via the overflow-safe exact-integer
    * [[quantize]], so the key is reproducible cross-engine (no IEEE
    * rounding anywhere). A NULL in either dimension yields a NULL key
    * (sorts last in the write — the usual stats-free tail).
    *
    * The min/max frame is one row, cross-joined back with an explicit
    * broadcast — the plan is a BroadcastNestedLoopJoin over a 1-row side,
    * i.e. map-side. */
  def zorderKey2(df: DataFrame, colA: String, colB: String,
                 out: String = "zkey"): DataFrame = {
    val t = statsTag(df)
    val stats = df.agg(
      min(col(colA).cast("long")).as(s"${t}mn_a"),
      max(col(colA).cast("long")).as(s"${t}mx_a"),
      min(col(colB).cast("long")).as(s"${t}mn_b"),
      max(col(colB).cast("long")).as(s"${t}mx_b"))
    df.crossJoin(broadcast(stats))
      .withColumn(out,
        interleave16(quantize(colA, s"${t}mn_a", s"${t}mx_a", 16),
                     quantize(colB, s"${t}mn_b", s"${t}mx_b", 16)))
      .drop(s"${t}mn_a", s"${t}mx_a", s"${t}mn_b", s"${t}mx_b")
  }

  /** Generic bit spread for N-way interleave: distribute the low `bits`
    * bits of a non-negative long with stride `n`, starting at bit
    * `offset` (bit i → bit i·n + offset). A fold of shift/and/or — plain
    * codegen'd bigint arithmetic, replayable in any engine's SQL as
    * Σᵢ ((q >> i) & 1) << (i·n + offset). The 2-D fast path keeps the
    * magic-mask [[spread16]]; this generic form is what makes the key
    * N-dimensional without a per-N mask table. */
  def spreadBits(x: Column, n: Int, bits: Int, offset: Int): Column = {
    // same guard as the graft_spreadbits SQL face (review r12): JVM
    // shifts mask the amount mod 64, so an unchecked top bit past 62
    // would silently alias into the low bits or the sign bit
    require(n >= 1 && bits >= 1 && offset >= 0 &&
      (bits - 1) * n + offset <= 62,
      s"spreadBits: spread must stay in a non-negative BIGINT " +
        s"(n=$n bits=$bits offset=$offset tops at ${(bits - 1) * n + offset})")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), i * n + offset)
    }.reduce(_.bitwiseOR(_))
  }

  /** N-dimensional Z-order key (VERDICT r11 #4 — generalizes
    * [[zorderKey2]]): each of `dims` is `(column, bits)`. Dimension j's
    * quantized bit i occupies key bit `i·n + j` — dimensions interleave
    * round-robin from the low bit, so a range predicate on ANY listed
    * dimension narrows file envelopes after a range-sorted write.
    * Budgets need not be equal: give a high-cardinality timestamp 24
    * bits and a small enum 8. The validity bound is therefore
    * PER-DIMENSION: dimension j's top bit lands at `(bits_j−1)·n + j`,
    * which must stay ≤ 62 so the key is a non-negative BIGINT — a plain
    * Σbits ≤ 63 check is NOT sufficient under unequal budgets (a 40-bit
    * dim in a 2-dim key would shift past bit 63, and JVM shifts mask the
    * amount mod 64, silently aliasing bits — caught in review r12).
    * Same exact-integer quantizer, same 1-row broadcast stats frame,
    * same NULL-propagates contract as the 2-D key.
    *
    * `bounds` (optional, per column) declares a dimension's [min, max]
    * instead of observing it — the 100 TB lever: a clustered write pays
    * three corpus passes (stats aggregate, range-partitioner sampling,
    * the write itself), and a caller that knows its domains (epoch
    * ranges, enum cardinalities, hash spaces) drops the first pass
    * entirely when every dimension is bound (no stats job, no broadcast
    * join — the key is pure map-side literals). Values outside declared
    * bounds CLAMP onto the grid edge (exact keys for in-range data,
    * edge-bucketed stragglers — never a corrupted key), so approximate
    * bounds degrade pruning quality, not correctness. Keys are
    * bit-identical to the observed-stats path when the declared bounds
    * equal the true min/max. */
  def zorderKeyN(df: DataFrame, dims: Seq[(String, Int)],
                 out: String = "zkey",
                 bounds: Map[String, (Long, Long)] = Map.empty): DataFrame = {
    require(dims.size >= 2, s"need >=2 dimensions (got ${dims.size})")
    require(dims.forall(_._2 > 0), s"bit budgets must be positive: $dims")
    require(bounds.keySet.subsetOf(dims.map(_._1).toSet),
      s"bounds name columns not in dims: ${bounds.keySet -- dims.map(_._1)}")
    bounds.foreach { case (c, (lo, hi)) =>
      require(lo <= hi, s"bounds for '$c' are inverted: [$lo, $hi]")
    }
    val n = dims.size
    dims.zipWithIndex.foreach { case ((c, bits), j) =>
      require((bits - 1) * n + j <= 62,
        s"dimension '$c' ($bits bits at stride $n, offset $j) would place " +
          s"its top bit at ${(bits - 1) * n + j} > 62 — the key must stay a " +
          "non-negative BIGINT; shrink the budget or reorder dimensions")
    }
    val t = statsTag(df)
    val unbound = dims.zipWithIndex.filter { case ((c, _), _) => !bounds.contains(c) }
    val key = dims.zipWithIndex.map { case ((c, bits), j) =>
      spreadBits(quantize(c, s"${t}mn_$j", s"${t}mx_$j", bits), n, bits, j)
    }.reduce(_.bitwiseOR(_))
    val withStats =
      if (unbound.isEmpty) df // every dimension declared: no stats job at all
      else {
        val aggs = unbound.flatMap { case ((c, _), j) =>
          Seq(min(col(c).cast("long")).as(s"${t}mn_$j"),
            max(col(c).cast("long")).as(s"${t}mx_$j"))
        }
        df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
      }
    val withBounds = dims.zipWithIndex.foldLeft(withStats) {
      case (acc, ((c, _), j)) => bounds.get(c) match {
        case Some((lo, hi)) =>
          acc.withColumn(s"${t}mn_$j", lit(lo)).withColumn(s"${t}mx_$j", lit(hi))
        case None => acc
      }
    }
    withBounds
      .withColumn(out, key)
      .drop(dims.indices.flatMap(j => Seq(s"${t}mn_$j", s"${t}mx_$j")): _*)
  }

  /** Z-order clustered write: key, range-repartition into `nFiles`
    * key-contiguous slices, sort within each, write. Each output file's
    * min/max envelope is then narrow in BOTH dimensions — a range
    * predicate on either column prunes most files (asserted in
    * LayoutSpec against a single-column sort, whose second-dimension
    * envelopes stay full-width). Range boundaries come from Spark's
    * sampling range partitioner — file CONTENTS are deterministic only
    * up to boundary placement, which is why the pruning contract is
    * stated on envelopes, not bytes. The `zkey` column is kept in the
    * written files (readers ignore it; re-clustering audits use it). */
  def zorderWrite(df: DataFrame, colA: String, colB: String, nFiles: Int,
                  path: String): Unit = {
    require(nFiles > 0, s"nFiles must be positive (got $nFiles)")
    zorderKey2(df, colA, colB)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** N-dimensional Z-order clustered write ([[zorderKeyN]] +
    * range-repartition + in-file sort): file envelopes stay narrow in
    * EVERY listed dimension, so a range predicate on any of them prunes
    * files (LayoutSpec asserts all three on a 3-dim write). Same
    * single-range-shuffle budget as [[zorderWrite]]; with `bounds`
    * covering every dimension the stats pass disappears too (see
    * [[zorderKeyN]]), leaving sampling + write as the only corpus
    * reads. */
  def zorderWriteN(df: DataFrame, dims: Seq[(String, Int)], nFiles: Int,
                   path: String,
                   bounds: Map[String, (Long, Long)] = Map.empty): Unit = {
    require(nFiles > 0, s"nFiles must be positive (got $nFiles)")
    zorderKeyN(df, dims, bounds = bounds)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)
  }
}

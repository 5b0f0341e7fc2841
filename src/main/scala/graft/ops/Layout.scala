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

  /** Add a Z-order key over two numeric columns, each linearly quantized
    * to 16 bits against its corpus min/max in EXACT integer arithmetic:
    * q = ((x − min) × 65535) div (max − min), so the key is reproducible
    * cross-engine (no IEEE rounding in the quantizer). A constant column
    * (max = min) quantizes to 0; a NULL in either dimension yields a NULL
    * key (sorts last in the write — the usual stats-free tail).
    *
    * The min/max frame is one row, cross-joined back with an explicit
    * broadcast — the plan is a BroadcastNestedLoopJoin over a 1-row side,
    * i.e. map-side. */
  def zorderKey2(df: DataFrame, colA: String, colB: String,
                 out: String = "zkey"): DataFrame = {
    val stats = df.agg(
      min(col(colA).cast("long")).as("__mn_a"),
      max(col(colA).cast("long")).as("__mx_a"),
      min(col(colB).cast("long")).as("__mn_b"),
      max(col(colB).cast("long")).as("__mx_b"))
    def quant(c: String, mn: String, mx: String): Column =
      when(col(c).isNull, lit(null))
        .when(col(mx) <= col(mn), lit(0L))
        .otherwise(expr(
          s"((CAST(`$c` AS BIGINT) - `$mn`) * 65535) div (`$mx` - `$mn`)"))
    df.crossJoin(broadcast(stats))
      .withColumn(out,
        interleave16(quant(colA, "__mn_a", "__mx_a"),
                     quant(colB, "__mn_b", "__mx_b")))
      .drop("__mn_a", "__mx_a", "__mn_b", "__mx_b")
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
}

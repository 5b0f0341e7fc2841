package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseCount, BitwiseOr, BitwiseXor, Cast, Conv, Expression, ExpressionInfo, Literal, Md5, ShiftLeft, ShiftRight, Substring}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL-surface registrations for library semantics that are pure
  * compositions of built-in Catalyst expressions — registered through
  * [[graft.plans.GraftExtensions]] so `spark.sql` users get the same
  * operators the Scala API exposes, at full codegen speed (these build
  * native expression trees, not UDFs; the analyzer inserts the usual
  * implicit input casts).
  */
object SqlFunctions {

  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** `graft_hamming64(a, b)` — Hamming distance between two 64-bit
    * fingerprints (the SQL face of [[graft.ops.Dedup.hamming64]]). */
  val hamming64: Descriptor = (
    new FunctionIdentifier("graft_hamming64"),
    new ExpressionInfo(BitwiseCount.getClass.getName, "graft_hamming64"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_hamming64 takes two integral arguments")
      BitwiseCount(BitwiseXor(children(0), children(1)))
    })

  /** `graft_bucket(key)` — the deterministic 0–255 md5 hash bucket behind
    * [[graft.ops.Sampling]]'s split/sample assignment (first two md5 hex
    * digits of the key rendered as a string). SQL users land in exactly
    * the same lanes as the Scala operators: samplers hash the bare key
    * (`graft_bucket(id) < cut`), while split assignment rides the
    * purpose-salted lane — `graft_bucket(concat(id, '|graft-split'))`,
    * matching [[graft.ops.Sampling.SplitSalt]]. */
  val bucket: Descriptor = (
    new FunctionIdentifier("graft_bucket"),
    new ExpressionInfo(Conv.getClass.getName, "graft_bucket"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_bucket takes one argument")
      Cast(
        Conv(Substring(Md5(Cast(children.head, StringType)),
          Literal(1), Literal(2)), Literal(16), Literal(10)),
        IntegerType)
    })

  /** `graft_zorder2(a16, b16)` — 32-bit Morton interleave of two
    * pre-quantized 16-bit lanes (the SQL face of
    * [[graft.ops.Layout.interleave16]], same shift-or-mask chain), so
    * `CLUSTER BY graft_zorder2(…)`-style SQL layouts match the Scala
    * writer bit-for-bit. */
  val zorder2: Descriptor = (
    new FunctionIdentifier("graft_zorder2"),
    new ExpressionInfo(ShiftLeft.getClass.getName, "graft_zorder2"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_zorder2 takes two integral arguments in [0, 65536)")
      def spread(e: Expression): Expression =
        Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
            (1, 0x55555555L))
          .foldLeft(Cast(e, LongType): Expression) { case (acc, (s, m)) =>
            BitwiseAnd(BitwiseOr(acc, ShiftLeft(acc, Literal(s))), Literal(m))
          }
      BitwiseOr(spread(children(0)), ShiftLeft(spread(children(1)), Literal(1)))
    })

  /** `graft_spreadbits(q, n, bits, offset)` — the generic N-way Morton
    * bit spread (the SQL face of [[graft.ops.Layout.spreadBits]]):
    * distribute the low `bits` bits of non-negative `q` with stride `n`
    * starting at bit `offset` (bit i → bit i·n + offset). `n`, `bits`,
    * `offset` must be foldable integer literals — the builder expands
    * the same shift/and/or fold the Scala writer codegens, so a
    * SQL-only N-dim layout (`graft_spreadbits(qa,3,8,0) |
    * graft_spreadbits(qb,3,8,1) | graft_spreadbits(qc,3,7,2)`) produces
    * byte-identical keys to [[graft.ops.Layout.zorderKeyN]]. */
  val spreadBits: Descriptor = (
    new FunctionIdentifier("graft_spreadbits"),
    new ExpressionInfo(ShiftLeft.getClass.getName, "graft_spreadbits"),
    (children: Seq[Expression]) => {
      require(children.length == 4,
        "graft_spreadbits takes (q, n, bits, offset)")
      def lit(e: Expression, name: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case Literal(v: Long, LongType) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_spreadbits: $name must be an integer literal (got $other)")
      }
      val n = lit(children(1), "n")
      val bits = lit(children(2), "bits")
      val offset = lit(children(3), "offset")
      require(n >= 1 && bits >= 1 && offset >= 0 &&
        (bits - 1) * n + offset <= 62,
        s"graft_spreadbits: spread must stay in a non-negative BIGINT " +
          s"(n=$n bits=$bits offset=$offset)")
      val q = Cast(children.head, LongType)
      (0 until bits).map { i =>
        ShiftLeft(BitwiseAnd(ShiftRight(q, Literal(i)), Literal(1L)),
          Literal(i * n + offset)): Expression
      }.reduce(BitwiseOr(_, _))
    })

  val all: Seq[Descriptor] = Seq(hamming64, bucket, zorder2, spreadBits)
}

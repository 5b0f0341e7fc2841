package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseCount, BitwiseOr, BitwiseXor, Cast, Conv, Expression, ExpressionInfo, Literal, Md5, ShiftLeft, Substring}
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
    * [[graft.ops.Sampling]]'s split/sample assignment, so SQL users can
    * write `WHERE graft_bucket(id) < 204` and land in exactly the same
    * buckets the Scala operators assign (first two md5 hex digits of the
    * key rendered as a string). */
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

  val all: Seq[Descriptor] = Seq(hamming64, bucket, zorder2)
}

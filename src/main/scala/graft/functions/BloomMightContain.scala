package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression (SURVEY.md §7.3 deliberate addition (b)):
  * `graft_bloom_might_contain(bloomBytes, keyHash)` — membership probe of
  * a 64-bit key against a serialized [[BloomFilter]], the map-side
  * prefilter behind [[graft.ops.Blocklist.bloomAntiJoin]].
  *
  * Design constraints, mirrored from Spark's own runtime-filtering
  * expression (`BloomFilterMightContain`, a non-SQL-surface internal):
  *  - the filter child must be a FOLDABLE binary (a literal carrying the
  *    serialized filter): it is deserialized ONCE per expression instance
  *    (driver + each executor's deserialized plan), never per row;
  *  - codegen references the deserialized filter object via
  *    `addReferenceObj`, so the hot path is one `mightContainLong` call
  *    inside whole-stage codegen — no interpreter round-trip, no UDF.
  *
  * The key child is a LONG (callers hash with `xxhash64`, which maps NULL
  * to its seed — so this expression itself never sees a NULL key from
  * that path; a genuinely NULL key yields NULL here).
  */
case class BloomMightContain(bloomExpr: Expression, keyExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomExpr
  override def right: Expression = keyExpr
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloomExpr.dataType, keyExpr.dataType) match {
      case (BinaryType, LongType) if bloomExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable (literal) serialized filter")
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got " +
          s"(${a.catalogString}, ${b.catalogString})")
    }

  @transient private lazy val bloom: BloomFilter =
    bloomExpr.eval() match {
      case null => null
      case bytes: Array[Byte] =>
        BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) null
    else {
      val k = keyExpr.eval(input)
      if (k == null) null else bloom.mightContainLong(k.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;""")
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      val key = keyExpr.genCode(ctx)
      ev.copy(code = code"""
        ${key.code}
        boolean ${ev.isNull} = ${key.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${key.value});
        }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomExpr = newLeft, keyExpr = newRight)
}

object BloomMightContain {
  /** Registration triple for `injectFunction` / `registerFunction`. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo, Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier(
      "graft_bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName,
      "graft_bloom_might_contain"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_bloom_might_contain takes (serialized_filter, key_hash)")
      BloomMightContain(children(0), children(1))
    })
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression (SURVEY.md §7.3 deliberate addition (b)):
  * 64-bit SimHash of an `array<string>` token column in ONE pass over the
  * array — the codegen'd form of [[graft.ops.Dedup.simhash64]], which as a
  * built-in higher-order fold walks the array 64 times (once per bit)
  * because lambda functions get no loop fusion.
  *
  * `doGenCode` stays inside whole-stage codegen by emitting a call to the
  * static [[SimHash64Expr.compute]] kernel (the standard pattern for
  * scalar kernels: no CodegenFallback, no interpreter round-trip).
  *
  * Hash function: xxHash64(seed 42) per token — bit-compatible with
  * `functions.xxhash64`, so the fold and this expression agree exactly
  * (asserted in CatalystExtSpec).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Single-pass kernel: per token xxHash64(seed 42), ±1 per bit, sign →
    * bit. Called from generated code — keep it static and allocation-lean
    * (one 64-int scratch per row). */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L // xxhash64(NULL) = seed, matching the builtin
        else {
          val s = arr.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            s, StringType, 42L)
        }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Registration triple for `injectFunction` / `registerFunction`. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo, Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_simhash64 takes one array<string> argument")
      SimHash64Expr(children.head)
    })
}

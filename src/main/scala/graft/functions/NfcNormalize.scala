package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_nfc(text)` — Unicode NFC
  * (canonical composition) normalization, the missing piece of
  * content-equivalence hashing that byte-level `lower`/`trim` can't see:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are DIFFERENT
  * byte strings that render identically, so crawl dumps from different
  * toolchains duplicate each other invisibly to a raw fingerprint.
  * [[graft.ops.TextAnalysis.normalizeText]] runs this first, then the
  * usual lower/whitespace canonicalization.
  *
  * Cross-engine contract: NFC is a Unicode-standard algorithm — Java's
  * `java.text.Normalizer` and DuckDB's `nfc_normalize` (utf8proc) agree
  * on it (the q91 oracle hash-checks that agreement end to end).
  *
  * Codegen: same pattern as [[SimHash64Expr]] — a static kernel called
  * from generated code, no CodegenFallback. Fast path: NFC-normalized
  * input (the overwhelmingly common case — most crawl text is pure
  * ASCII, which `Normalizer.isNormalized` confirms in one scan) returns
  * the input UTF8String with NO allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Registration triple for `injectFunction` / `registerFunction`. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo, Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_nfc takes one string argument")
      NfcNormalize(children.head)
    })
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression (SURVEY.md §7.3 deliberate addition (b)):
  * apply a trained BPE merge table to a text column — the ENCODE half of
  * the tokenizer loop whose TRAIN half is [[graft.ops.Vocab.bpeTrain]].
  * Corpus-scale tokenization is a map-side scalar kernel, so it belongs
  * in an expression (stays inside whole-stage codegen, composes with
  * every downstream array op), not a UDF and not a shuffle.
  *
  * Semantics are the standard priority ones (the merge-list algorithm
  * every deployed BPE tokenizer uses): repeatedly find the LOWEST-RANK
  * adjacent symbol pair present in the word and merge ALL its
  * left-to-right non-overlapping occurrences, until no listed pair
  * remains. This is NOT one sequential pass per rule: a low-rank rule
  * whose left symbol is produced by a higher-rank rule (e.g. rank-1
  * ("cd","b") with rank-2 ("c","d")) must fire after the later rule
  * creates its operand — pinned in CatalystExtSpec. Words are the
  * single-space tokens of [[graft.ops.TextAnalysis.tokens]]; initial
  * symbols are CODEPOINTS (so multi-byte text segments identically in
  * the JVM and in codepoint-indexed SQL engines).
  *
  * The rules operand must be a FOLDABLE `array<array<string>>` (each
  * element `[a, b]`, rank = position). The per-word result is memoized
  * in a bounded concurrent cache: corpus word distributions are heavily
  * Zipfian, so the kernel prices distinct words, not corpus tokens —
  * the same observation that makes [[graft.ops.Vocab]] training
  * tractable, applied to encode. */
case class BpeEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_bpe_encode requires a foldable (literal) rules argument")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode requires (string, array<array<string>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  /** (a, b, merged) per rank. Built once per JVM from the foldable rules
    * operand; `rankOf` is a two-level map so the hot scan loop does no
    * string concatenation. */
  @transient private lazy val rules: Array[(String, String, String)] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"graft_bpe_encode: rule $i must be [a, b]")
      val a = pair.getUTF8String(0).toString
      val b = pair.getUTF8String(1).toString
      (a, b, a + b)
    }.toArray
  }
  @transient private lazy val rankOf
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    rules.zipWithIndex.foreach { case ((a, b, _), r) =>
      val inner = m.computeIfAbsent(a,
        _ => new java.util.HashMap[String, Integer]())
      // first occurrence of a duplicated pair keeps the lower rank
      if (!inner.containsKey(b)) inner.put(b, Integer.valueOf(r))
    }
    m
  }
  @transient private lazy val wordCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val WordCacheCap = 1 << 16

  private def encodeWord(word: String): Array[String] = {
    // codepoint split (JVM chars are UTF-16 units; SQL substr is
    // codepoint-based — the symbols must agree)
    var syms = {
      val buf = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        buf += word.substring(i, i + n)
        i += n
      }
      buf.toArray
    }
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val inner = rankOf.get(syms(i))
        if (inner != null) {
          val r = inner.get(syms(i + 1))
          if (r != null && r.intValue < best) best = r.intValue
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b, ab) = rules(best)
        val out = collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += ab; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Kernel: split on single spaces (TextAnalysis.tokens semantics),
    * BPE-merge each word, concatenate the per-word token runs. Called
    * from generated code. */
  def encode(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val w = s.substring(start, i)
          val toks =
            if (wordCache.size < WordCacheCap)
              wordCache.computeIfAbsent(w, encodeWord(_))
            else {
              val hit = wordCache.get(w)
              if (hit != null) hit else encodeWord(w)
            }
          var t = 0
          while (t < toks.length) {
            out += UTF8String.fromString(toks(t)); t += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any, rulesIgnored: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncodeExpr].getName)
    defineCodeGen(ctx, ev, (t, _) => s"$ref.encode($t)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object BpeEncodeExpr {
  /** Registration triple for `injectFunction` / `registerFunction`. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo, Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_encode"),
    new ExpressionInfo(classOf[BpeEncodeExpr].getName, "graft_bpe_encode"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "graft_bpe_encode takes (text, rules array<array<string>>)")
      BpeEncodeExpr(children.head, children(1))
    })
}

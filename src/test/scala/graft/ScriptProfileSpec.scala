package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private val cls = TextAnalysis.ScriptClasses.toMap

  test("charClassCount counts exactly, per class") {
    val rows = Seq(
      ("abc def", 6L, 0L),
      ("привет", 0L, 6L),
      ("a1б!", 1L, 1L),
      ("", 0L, 0L)
    ).toDF("t", "lat", "cyr")
    val bad = rows.filter(
      TextAnalysis.charClassCount(col("t"), cls("latin")) =!= col("lat") ||
      TextAnalysis.charClassCount(col("t"), cls("cyrillic")) =!= col("cyr"))
    assert(bad.count() == 0)
  }

  test("dominantScript: argmax with precedence, none for script-free text") {
    val got = Seq(
      "hello world",            // latin
      "привет мир",             // cyrillic
      "你好世界",                // cjk (Han)
      "こんにちは",              // cjk (kana)
      "مرحبا بالعالم",          // arabic
      "नमस्ते दुनिया",            // devanagari
      "12345 !!!",              // none
      "abc где"                 // tie 3-3 → latin (list-order precedence)
    ).toDF("t").select(TextAnalysis.dominantScript(col("t"))).as[String]
      .collect().toSeq
    assert(got == Seq("latin", "cyrillic", "cjk", "cjk", "arabic",
      "devanagari", "none", "latin"))
  }
}

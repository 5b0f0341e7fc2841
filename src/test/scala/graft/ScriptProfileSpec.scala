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

  test("stripMarkup: blocks die whole, tags strip, entities decode once, amp last") {
    val html = "<html><head><style>p{x:1}</style></head><body>" +
      "<h1>A &amp; B</h1><p>keep &amp;lt;this&amp;gt; text&nbsp;here</p>" +
      "<script>var s = '<not a tag>';</script></body></html>"
    val got = Seq(html).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).as[String].head()
    // &amp;lt; decodes exactly once → literal &lt; (never <)
    assert(got == "A & B keep &lt;this&gt; text here", s"got: '$got'")
    // idempotent on clean prose
    val clean = Seq("plain text stays").toDF("t")
      .select(TextAnalysis.stripMarkup(col("t"))).as[String].head()
    assert(clean == "plain text stays")
  }

  test("url ops: count, domains, exact link-char ratio") {
    val t = "go https://a.example.org/x and http://b.example.net end"
    val row = Seq(t).toDF("t").select(
      TextAnalysis.urlCount(col("t")).as("n"),
      TextAnalysis.urlDomains(col("t")).as("d"),
      TextAnalysis.linkCharRatio(col("t")).as("r")).head()
    assert(row.getAs[Int]("n") == 2)
    assert(row.getSeq[String](1) == Seq("a.example.org", "b.example.net"))
    val urlChars = "https://a.example.org/x".length + "http://b.example.net".length
    assert(row.getAs[Double]("r") == urlChars.toDouble / t.length)
    // empty text → NULL ratio, no URLs
    val empty = Seq("").toDF("t").select(
      TextAnalysis.linkCharRatio(col("t")).as("r"),
      TextAnalysis.urlCount(col("t")).as("n")).head()
    assert(empty.isNullAt(0) && empty.getAs[Int]("n") == 0)
  }
}

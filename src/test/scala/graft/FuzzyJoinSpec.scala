package graft

import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = df.toDF("id_a", "str_a")
    val b = df.toDF("id_b", "str_b")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().sorted.toSeq
  }

  private val corpus = Seq(
    1L -> "kitten", 2L -> "sitting", 3L -> "mitten", 4L -> "kitte",
    5L -> "kittens", 6L -> "bitten", 7L -> "flitting",
    8L -> "abcdefgh", 9L -> "abcdefgx", 10L -> "xbcdefgh",
    11L -> "aaaa", 12L -> "aaab", 13L -> "abab", 14L -> "baba",
    15L -> "", 16L -> "a", 17L -> "b", 18L -> "ab",
    19L -> "zzzzzzzzzzzz", 20L -> "zzzzzzzzzzz"
  ).toDF("id", "s")

  test("editSelfJoin equals brute force at k = 1 and k = 2 (incl. short strings)") {
    for (k <- Seq(1, 2); q <- Seq(2, 3); pf <- Seq(true, false)) {
      val got = FuzzyJoin.editSelfJoin(corpus, "id", "s", maxDist = k, q = q,
          prefixFilter = pf)
        .as[(Long, Long, Int)].collect().sorted.toSeq
      assert(got == brute(corpus, k),
        s"prefilter lost or invented pairs at k=$k q=$q prefixFilter=$pf")
    }
  }

  test("duplicate grams count as a multiset: aaaa pairs with aaab, not with baba") {
    val got = FuzzyJoin.editSelfJoin(corpus, "id", "s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((11L, 12L, 1)))
    assert(!got.exists(p => Set(p._1, p._2) == Set(13L, 14L)),
      "abab vs baba is distance 2, must not appear at k=1")
  }

  test("cross-frame join: left and right differ, known distances surface") {
    val left = Seq(1L -> "spark", 2L -> "graft").toDF("lid", "ls")
    val right = Seq(10L -> "spork", 11L -> "sparkle", 12L -> "draft").toDF("rid", "rs")
    val got = FuzzyJoin.editJoin(left, "lid", "ls", right, "rid", "rs", maxDist = 2)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 12L, 1)))
  }

  test("the gram path never plans an unbounded cartesian product") {
    val noShort = corpus.filter(length(col("s")) > 1)
    val plan = FuzzyJoin.editSelfJoin(noShort, "id", "s", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"gram-path plan must not contain CartesianProduct:\n$plan")
  }
}

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

  test("fuzzy state: pairs(state) ∪ probe(delta) == full editSelfJoin of the union") {
    import graft.ops.FuzzyJoinState
    val root = java.nio.file.Files.createTempDirectory("graft-fzs-").toString
    // even ids = state, odd ids = delta — pairs straddle the boundary in
    // both directions, and the short strings (15/16/17/18) split across
    // it so the length-window lanes cross the state boundary too
    val state = corpus.filter(col("id") % 2 === 0)
    val delta = corpus.filter(col("id") % 2 === 1)
    for (k <- Seq(1, 2)) {
      val r = s"$root/k$k"
      FuzzyJoinState.build(state, "id", "s", maxDist = k, q = 2, r, buckets = 4)
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, Long, Int)].collect().sorted.toSeq
      val full = brute(corpus, k)
      val statePairs = norm(FuzzyJoin.editSelfJoin(state, "id", "s", k))
      val probed = norm(FuzzyJoinState.probe(delta, "id", "s", r))
      assert((statePairs ++ probed).sorted == full,
        s"k=$k: state ($statePairs) ∪ probe ($probed) != full ($full)")

      // append the delta; a second delta probing the UNION state finds
      // its cross pairs to BOTH original state and first-delta strings
      FuzzyJoinState.append(delta, "id", "s", r)
      val delta2 = Seq(21L -> "sittind", 22L -> "xbcdefgg", 23L -> "aa")
        .toDF("id", "s")
      val all2 = corpus.unionByName(delta2)
      val full2 = brute(all2, k)
      val probed2 = norm(FuzzyJoinState.probe(delta2, "id", "s", r))
      assert((full ++ probed2).sorted == full2,
        s"k=$k after append: ($full) ∪ probe2 ($probed2) != full2 ($full2)")

      // re-append is a no-op (string anti-join): probe results unchanged
      FuzzyJoinState.append(delta, "id", "s", r)
      assert(norm(FuzzyJoinState.probe(delta2, "id", "s", r)) == probed2,
        s"k=$k: re-append duplicated string rows")
    }
  }

  test("fuzzy state: crash between writes repairs through the marker; remove purges") {
    import graft.ops.FuzzyJoinState
    val root = java.nio.file.Files.createTempDirectory("graft-fzc-").toString
    val state = corpus.filter(col("id") % 2 === 0)
    FuzzyJoinState.build(state, "id", "s", maxDist = 1, q = 2, root, buckets = 4)
    // crash between the string and prefix writes — the marker routes the
    // re-run through whole-delta re-prefixing; the crashed doc becomes
    // probe-discoverable and pairs count once
    val d3 = Seq(31L -> "kitte1").toDF("id", "s") // dist 1 to "kitte" (4)
    val boom = intercept[RuntimeException] {
      FuzzyJoinState.appendHooked(d3, "id", "s", root,
        () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage == "injected crash")
    FuzzyJoinState.append(d3, "id", "s", root) // repair re-run
    val d4 = Seq(33L -> "kitte2").toDF("id", "s")
    val probed = FuzzyJoinState.probe(d4, "id", "s", root)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(probed == Seq((4L, 33L, 1), (31L, 33L, 1)),
      s"crash-repaired doc 31 must pair exactly once: $probed")

    // takedown with a mid-sweep crash: the next load finishes the purge
    val boom2 = intercept[RuntimeException] {
      FuzzyJoinState.removeHooked(Seq(4L).toDF("__del_id"), root,
        () => throw new RuntimeException("injected crash"))
    }
    assert(boom2.getMessage == "injected crash")
    val after = FuzzyJoinState.probe(d4, "id", "s", root)
      .as[(Long, Long, Int)].collect().sorted.toSeq
    assert(after == Seq((31L, 33L, 1)),
      s"purged id 4 must not pair after the marker repair: $after")
    assert(!new java.io.File(s"$root/fuzzy_state/_remove_pending").exists())
  }

  test("the gram path never plans an unbounded cartesian product") {
    val noShort = corpus.filter(length(col("s")) > 1)
    val plan = FuzzyJoin.editSelfJoin(noShort, "id", "s", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"gram-path plan must not contain CartesianProduct:\n$plan")
  }
}

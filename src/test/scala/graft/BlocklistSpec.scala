package graft

import org.apache.spark.sql.functions._

import graft.ops.Blocklist

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Some("alpha"), "keep"),
    (2L, Some("beta"), "drop"),
    (3L, Some("gamma"), "keep"),
    (4L, Some("beta"), "drop"), // duplicate key, both copies drop
    (5L, None: Option[String], "keep") // NULL key never matches a blocklist
  ).toDF("id", "k", "expect")

  private lazy val block = Seq("beta", "delta", "epsilon").toDF("bk")

  test("bloomAntiJoin equals the plain anti-join (incl. dup and NULL keys)") {
    val got = Blocklist.bloomAntiJoin(corpus, "k", block, "bk")
      .select("id").as[Long].collect().sorted
    val want = corpus.join(block, corpus("k") === block("bk"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.toSeq == Seq(1L, 3L, 5L))
  }

  test("bloomAntiJoin is exact even at an absurd fpp (false positives confirmed away)") {
    val got = Blocklist.bloomAntiJoin(corpus, "k", block, "bk", fpp = 0.5)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 5L))
  }

  test("the Bloom probe has no false negatives and few false positives") {
    graft.plans.GraftExtensions.install(spark)
    val members = (0 until 500).map(i => s"key$i")
    val bytes = Blocklist.serialize(
      Blocklist.buildBloom(members.toDF("bk"), "bk", members.size, 0.01))
    def probeHits(keys: Seq[String]): Long =
      keys.toDF("k")
        .filter(call_function("graft_bloom_might_contain",
          lit(bytes), xxhash64(col("k"))))
        .count()
    // no false negatives: every inserted key probes true
    assert(probeHits(members) == members.size)
    // few false positives: disjoint keys probe true at ~fpp
    val strangers = (0 until 1000).map(i => s"other$i")
    assert(probeHits(strangers) <= 50) // fpp 1%, generous 5% bound
  }

  test("a caller's column named like the staging column survives intact") {
    // ADVICE r11: r11 staged through a hardcoded __might column, silently
    // overwriting and dropping any same-named caller column. The staging
    // name must now dodge collisions — the caller's data comes through.
    val withClash = corpus
      .withColumn("__might", col("id") * 10)
      .withColumn("__graft_might_0", col("id") * 100)
    val got = Blocklist.bloomAntiJoin(withClash, "k", block, "bk")
      .select("id", "__might", "__graft_might_0")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 5L))
    got.foreach { case (id, m, g) =>
      assert(m == id * 10 && g == id * 100,
        s"caller columns corrupted for id=$id: __might=$m __graft_might_0=$g")
    }
  }

  test("plan shape: exactly one join — the clean branch never joins") {
    // range-backed frames: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation and hide the probe from the physical plan
    val bigCorpus = spark.range(1000).select(col("id"),
      concat(lit("k"), col("id") % 100).as("k"))
    val bigBlock = spark.range(10).select(concat(lit("k"), col("id")).as("bk"))
    val plan = Blocklist.bloomAntiJoin(bigCorpus, "k", bigBlock, "bk")
      .queryExecution.executedPlan.toString
    val joins = "Join".r.findAllIn(plan).length
    // one anti-join (its physical name contains "Join" once per operator
    // line; broadcast variant prints BroadcastHashJoin ... LeftAnti)
    assert(plan.contains("LeftAnti"))
    assert(joins <= 2, s"expected a single anti-join, got plan:\n$plan")
    assert(plan.contains("graft_bloom_might_contain"))
  }
}

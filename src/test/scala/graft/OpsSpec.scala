package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Relational

/** Per-operator unit + property tests (SURVEY.md §5 layers 1 and 4).
  * Properties drive ScalaCheck generators directly under fixed seeds
  * (scalatestplus is not in the offline dependency cache). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("notNullViolations: empty column list is a no-op, not a crash") {
    val df = Seq((1, "a"), (2, null: String)).toDF("k", "v")
    val r = Relational.notNullViolations(df, Nil).head()
    assert(r.getLong(0) == 0 && r.getLong(1) == 2)
    val r2 = Relational.notNullViolations(df, Seq("v")).head()
    assert(r2.getLong(0) == 1)
    Relational.assertQuality(df, Nil, Seq("k")) // must not throw
  }

  test("uniqueViolations counts duplicate key groups and surplus rows") {
    val df = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "v")
    val r = Relational.uniqueViolations(df, Seq("k")).head()
    assert(r.getLong(0) == 1) // one dup key group
    assert(r.getLong(1) == 2) // two surplus rows
    intercept[IllegalArgumentException] {
      Relational.assertQuality(df, Seq("k"), Seq("k"))
    }
  }

  test("countIf: NULL condition counts as 0 (CASE → ELSE parity)") {
    val df = Seq(Some(5), None, Some(15)).toDF("x")
    val n = df.agg(Relational.countIf(col("x") > 10)).head().getLong(0)
    assert(n == 1) // NULL > 10 is NULL → not counted
  }

  test("topK is a total-order limit") {
    val df = Seq((1, 10.0), (2, 30.0), (3, 20.0), (4, 30.0)).toDF("id", "v")
    val top = Relational.topK(df, 2, col("v").desc, col("id").asc)
      .select("id").as[Int].collect().toSeq
    assert(top == Seq(2, 4)) // ties broken by id
  }

  test("lastWriteWins: idempotent and insensitive to duplication (property)") {
    val rows = Gen.listOfN(40, for {
      k <- Gen.choose(1, 6)
      ts <- Gen.choose(1L, 1000L)
      v <- Gen.choose(0, 100)
    } yield (k, ts, v))
    for (seed <- 1L to 10L) {
      val data = rows(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator failed for seed $seed"))
      val df = data.toDF("k", "ts", "v")
      val order = Seq(col("ts").desc, col("v").desc)
      val once = Relational.lastWriteWins(df, Seq("k"), order: _*)
      val twice = Relational.lastWriteWins(once, Seq("k"), order: _*)
      val reunion = Relational.lastWriteWins(df.union(df), Seq("k"), order: _*)
      val a = once.orderBy("k").collect().toSeq
      assert(twice.orderBy("k").collect().toSeq == a)   // idempotent
      assert(reunion.orderBy("k").collect().toSeq == a) // dup-insensitive
      assert(once.groupBy("k").count().filter($"count" > 1).count() == 0)
    }
  }

  test("asOfJoin: latest dim row at-or-before fact time, ties to greatest key") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val fact = Seq(
      (100L, 1L, t("2026-01-10 00:00:00")), // after both orders of key 1
      (101L, 1L, t("2026-01-05 00:00:00")), // exactly at order time (inclusive)
      (102L, 1L, t("2026-01-01 00:00:00")), // before any order
      (103L, 2L, t("2026-01-10 00:00:00"))  // key with tied order dates
    ).toDF("event_id", "k", "ts")
    val dim = Seq(
      (1L, t("2026-01-03 00:00:00"), 7L, 70.0),
      (1L, t("2026-01-05 00:00:00"), 8L, 80.0),
      (2L, t("2026-01-04 00:00:00"), 3L, 30.0),
      (2L, t("2026-01-04 00:00:00"), 4L, 40.0) // tie → greatest key wins
    ).toDF("k", "odate", "okey", "price")
    val out = Relational.asOfJoin(fact, dim, "k", "k", "ts", "odate", "okey", Seq("price"))
      .select("event_id", "asof_okey", "asof_price").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(100L) == ((Some(8L), Some(80.0))))
    assert(out(101L) == ((Some(8L), Some(80.0)))) // inclusive <=
    assert(out(102L) == ((None, None)))           // no prior order
    assert(out(103L) == ((Some(4L), Some(40.0)))) // tie broken by key
  }

  test("rangeJoin: inclusive start, exclusive end, bins spanned correctly") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val fact = Seq(
      (1L, 1L, t("2026-01-05 00:00:00")), // == start → in
      (2L, 1L, t("2026-01-07 23:59:59")), // inside, different day-bin
      (3L, 1L, t("2026-01-08 00:00:00")), // == end → out
      (4L, 1L, t("2026-01-04 23:59:59")), // before → out
      (5L, 2L, t("2026-01-05 12:00:00"))  // wrong key
    ).toDF("event_id", "k", "ts")
    val dim = Seq((10L, 1L, t("2026-01-05 00:00:00"), t("2026-01-08 00:00:00")))
      .toDF("okey", "k", "start", "end")
    val out = Relational.rangeJoin(fact, dim, "k", "k", "ts", "start", "end", 86400L)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("saltedJoin equals the plain join and replicates the dim per salt") {
    val fact = (1 to 200).map(i => (i % 3, i)).toDF("k", "x")
    val dim = Seq((0, "a"), (1, "b"), (2, "c"), (7, "zzz")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "x", "name")
      .collect().map(_.toSeq).toSet
    val salted = Relational.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select("k", "x", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val old = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (4L, Option("d"))).toDF("k", "v")
    val nw = Seq((2L, Option("bX")), (3L, Option.empty[String]), (4L, Option("d")),
      (5L, Option("e"))).toDF("k", "v")
    val out = Relational.snapshotDiff(old, nw, "k", Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", // NULL <=> NULL: null-safe compare, not "changed"
      4L -> "unchanged", 5L -> "added"), out.toString)
  }

  test("leftEnrich: NULL fact keys never match (J2 contract)") {
    val fact = Seq((Some("a"), 1), (None: Option[String], 2)).toDF("k", "x")
    val dim = Seq(("a", "m"), (null: String, "n")).toDF("k", "name")
    val out = Relational.leftEnrich(fact, dim, Seq("k"), "missing", "name")
      .select("x", "missing").as[(Int, Boolean)].collect().toMap
    assert(out(1) == false)
    assert(out(2) == true) // NULL = NULL does not match, even vs a NULL dim key
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Scd2State, Temporal}

/** Contracts of the incremental SCD2 fold: N daily folds equal the
  * one-shot batch collapse, replays no-op, out-of-order folds refuse,
  * and the crash window between the history write and the current swap
  * replays cleanly. */
class Scd2StateSpec extends SparkSpec {
  import spark.implicits._

  private def snaps(rows: Seq[(Long, String, String)]) =
    rows.toDF("k", "d", "attr").select(col("k"),
      to_date(col("d")).as("d"), col("attr"))

  // a week of snapshots exercising every fold case: key 1 extends, key 2
  // changes attrs mid-week, key 3 is deleted then reappears IDENTICAL
  // (gap must split the version), key 4 is born late, key 5 is deleted
  // and never returns
  private val week = Seq(
    (1L, "2024-01-01", "a"), (2L, "2024-01-01", "x"), (3L, "2024-01-01", "m"),
    (5L, "2024-01-01", "z"),
    (1L, "2024-01-02", "a"), (2L, "2024-01-02", "x"), (3L, "2024-01-02", "m"),
    (1L, "2024-01-03", "a"), (2L, "2024-01-03", "y"), (4L, "2024-01-03", "q"),
    (1L, "2024-01-04", "a"), (2L, "2024-01-04", "y"), (3L, "2024-01-04", "m"),
    (4L, "2024-01-04", "q"))

  private def foldAll(root: String, rows: Seq[(Long, String, String)],
                      bootDates: Seq[String], foldDates: Seq[String]): Unit = {
    val df = snaps(rows)
    Scd2State.bootstrap(df.filter(col("d").isin(bootDates: _*)),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    foldDates.foreach { dt =>
      Scd2State.fold(
        df.filter(col("d") === lit(dt)).select("k", "attr"), root, dt)
    }
  }

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("version"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("nb_snapshots"), col("attr"))
      .as[(Long, Long, String, String, Long, String)].collect().sorted.toSeq

  test("N daily folds equal one-shot scd2WithDeletions over all snapshots") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2s-").toString
    foldAll(root, week, Seq("2024-01-01"),
      Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    val got = normalize(Scd2State.intervals(spark, root))
    val want = normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d"))
    assert(got == want, s"folded ($got) != batch ($want)")
    // spot-check the reappearance-splits-version contract: key 3 absent
    // on the 3rd, back identical on the 4th -> two versions
    assert(got.filter(_._1 == 3L).map(_._2).sorted == Seq(1L, 2L))
  }

  test("multi-day bootstrap plus folds equals batch; replay and out-of-order folds behave") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2r-").toString
    foldAll(root, week, Seq("2024-01-01", "2024-01-02"),
      Seq("2024-01-03", "2024-01-04"))
    val before = normalize(Scd2State.intervals(spark, root))
    assert(before == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")))

    // replaying an already-folded date is a no-op (the ledger)
    Scd2State.fold(
      snaps(week).filter(col("d") === "2024-01-04").select("k", "attr"),
      root, "2024-01-04")
    assert(normalize(Scd2State.intervals(spark, root)) == before,
      "replayed fold must be a ledgered no-op")

    // an out-of-order NEVER-APPLIED date refuses (an applied one no-ops
    // through the ledger instead — tested above)
    val ex = intercept[IllegalArgumentException] {
      Scd2State.fold(snaps(week).filter(col("d") === "2024-01-03")
        .select("k", "attr").limit(1), root, "2023-12-31")
    }
    assert(ex.getMessage.contains("date-ordered"))

    // an empty snapshot no-ops (the date is not in the batch calendar)
    Scd2State.fold(snaps(week).filter(lit(false)).select("k", "attr"),
      root, "2024-01-09")
    assert(normalize(Scd2State.intervals(spark, root)) == before)
  }

  test("crash between the history write and the current swap replays cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2c-").toString
    val df = snaps(week)
    Scd2State.bootstrap(df.filter(col("d") === "2024-01-01"),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    Scd2State.fold(df.filter(col("d") === "2024-01-02").select("k", "attr"),
      root, "2024-01-02")
    // simulate the crash: day 3's history subdir exists but the current
    // swap (and its ledger) never landed — write the retired rows by
    // hand, then run the real fold, which must overwrite them once
    val day3 = df.filter(col("d") === "2024-01-03").select("k", "attr")
    spark.read.parquet(s"$root/scd2_state/history/d=bootstrap")
      .limit(0).write.mode("overwrite")
      .parquet(s"$root/scd2_state/history/d=2024-01-03")
    Scd2State.fold(day3, root, "2024-01-03")
    Scd2State.fold(df.filter(col("d") === "2024-01-04").select("k", "attr"),
      root, "2024-01-04")
    assert(normalize(Scd2State.intervals(spark, root)) == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")),
      "a replayed crash window must not double history rows")
  }
}

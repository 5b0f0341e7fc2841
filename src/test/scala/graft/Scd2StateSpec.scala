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

  test("fold write cost is delta-proportional: bootstrap files are never rewritten") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2w-").toString
    val df = snaps(week)
    Scd2State.bootstrap(df.filter(col("d") === "2024-01-01"),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    val curDir = new java.io.File(s"$root/scd2_state/current")
    def partFiles() = curDir.listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val gen0 = partFiles()
    assert(gen0.nonEmpty)
    for (dt <- Seq("2024-01-02", "2024-01-03", "2024-01-04"))
      Scd2State.fold(df.filter(col("d") === lit(dt)).select("k", "attr"), root, dt)
    // every bootstrap part-file survives byte-for-byte: folds APPEND a
    // generation of delta-key rows, they never rewrite the state
    assert(gen0.subsetOf(partFiles()),
      s"fold rewrote bootstrap files:\n$gen0\nvs\n${partFiles()}")
    assert(normalize(Scd2State.intervals(spark, root)) == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")))
  }

  test("a torn generation append is invisible and its replay lands cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2t-").toString
    val df = snaps(week)
    Scd2State.bootstrap(df.filter(col("d") === "2024-01-01"),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    val day2 = df.filter(col("d") === "2024-01-02").select("k", "attr")
    // crash AFTER the generation append, BEFORE the ledger: the
    // generation is on disk but unledgered
    intercept[RuntimeException] {
      Scd2State.foldHooked(day2, root, "2024-01-02",
        () => sys.error("boom before ledger"))
    }
    // the torn generation must be invisible to every reader
    val visible = normalize(Scd2State.intervals(spark, root))
    assert(visible == normalize(Temporal.scd2WithDeletions(
      snaps(week.filter(_._2 == "2024-01-01")), Seq("k"), Seq("attr"), "d")),
      "an unledgered generation leaked into intervals")
    // the replayed fold appends byte-identical rows (LWW absorbs the
    // duplicates) and the final state equals the batch collapse
    Scd2State.fold(day2, root, "2024-01-02")
    for (dt <- Seq("2024-01-03", "2024-01-04"))
      Scd2State.fold(df.filter(col("d") === lit(dt)).select("k", "attr"), root, dt)
    assert(normalize(Scd2State.intervals(spark, root)) == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")))
  }

  test("a torn fold on a RETIRING day never double-counts the retired version") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2d-").toString
    val df = snaps(week)
    Scd2State.bootstrap(df.filter(col("d") === "2024-01-01"),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    // 2024-01-03 flips key 2's attr x→y, so its current version RETIRES
    // into history/d=2024-01-03 BEFORE the ledger; fold day2 first
    Scd2State.fold(df.filter(col("d") === "2024-01-02").select("k", "attr"),
      root, "2024-01-02")
    val before = normalize(Scd2State.intervals(spark, root))
    val day3 = df.filter(col("d") === "2024-01-03").select("k", "attr")
    intercept[RuntimeException] {
      Scd2State.foldHooked(day3, root, "2024-01-03",
        () => sys.error("boom before ledger"))
    }
    // the orphan history dir is on disk but UNLEDGERED: every read face
    // must ignore it — the retired version would otherwise appear twice
    // (history copy ∪ still-LWW current copy)
    val seen = normalize(Scd2State.intervals(spark, root))
    assert(seen == before,
      s"crash-orphan history generation leaked into intervals:\n$seen\nvs\n$before")
    assert(seen.size == seen.distinct.size, s"duplicate intervals: $seen")
    assert(!Scd2State.prunedHistLabels(spark, root, "2024-01-01", "2024-01-04")
      .contains("2024-01-03"), "pruned read opened an unledgered orphan dir")
    // the replay lands and the final state equals the batch collapse
    Scd2State.fold(day3, root, "2024-01-03")
    Scd2State.fold(df.filter(col("d") === "2024-01-04").select("k", "attr"),
      root, "2024-01-04")
    assert(normalize(Scd2State.intervals(spark, root)) == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")))
  }

  test("replayed-fold crash between history overwrite and manifest leaves no stale range (ADVICE r16)") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2m-").toString
    val df = snaps(week)
    Scd2State.bootstrap(df.filter(col("d") === "2024-01-01"),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    val mfFile = new java.io.File(s"$root/scd2_state/_graft_hist_ranges.json")
    def mfBody() = new String(
      java.nio.file.Files.readAllBytes(mfFile.toPath), "UTF-8")
    // attempt 1: a RETIRING fold (key 2 flips on the 3rd) crashes after
    // its manifest entry landed but before the ledger
    Scd2State.fold(df.filter(col("d") === "2024-01-02").select("k", "attr"),
      root, "2024-01-02")
    val day3 = df.filter(col("d") === "2024-01-03").select("k", "attr")
    intercept[RuntimeException] {
      Scd2State.foldHooked(day3, root, "2024-01-03",
        () => sys.error("boom before ledger"))
    }
    assert(mfBody().contains("2024-01-03"),
      "fixture: attempt 1 must leave a manifested orphan entry")
    // attempt 2 (replay — possibly with refetched, DIFFERENT rows)
    // crashes between the d=2024-01-03 overwrite and its manifest
    // update: the drop-first discipline must have already removed the
    // attempt-1 entry, so the window degrades to missing-entry =
    // unpruned read, never attempt-1's range over attempt-2's rows
    intercept[RuntimeException] {
      Scd2State.foldHooked(day3, root, "2024-01-03",
        () => (), () => sys.error("boom after history overwrite"))
    }
    assert(!mfBody().contains("2024-01-03"),
      s"stale attempt-1 range survived the overwrite window: ${mfBody()}")
    // the clean replay re-manifests and the folded week matches batch
    Scd2State.fold(day3, root, "2024-01-03")
    assert(mfBody().contains("2024-01-03"))
    Scd2State.fold(df.filter(col("d") === "2024-01-04").select("k", "attr"),
      root, "2024-01-04")
    assert(normalize(Scd2State.intervals(spark, root)) == normalize(
      Temporal.scd2WithDeletions(snaps(week), Seq("k"), Seq("attr"), "d")))
  }

  test("compaction folds generations and history dirs; intervals row-identical") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2k-").toString
    foldAll(root, week, Seq("2024-01-01"),
      Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    val before = normalize(Scd2State.intervals(spark, root))
    val filesBefore = Scd2State.currentFileCount(spark, root)
    val dirsBefore = Scd2State.historyDirCount(spark, root)
    assert(filesBefore > 4, s"expected >1 file per bucket, got $filesBefore")
    assert(dirsBefore == 4, s"expected bootstrap + 3 fold dirs, got $dirsBefore")
    Scd2State.compact(spark, root)
    assert(Scd2State.currentFileCount(spark, root) <= 4,
      "compactCurrent must land at most one file per bucket")
    assert(Scd2State.historyDirCount(spark, root) == 1,
      "compactHistory must fold the per-date dirs into one generation")
    assert(normalize(Scd2State.intervals(spark, root)) == before)
    // folding continues normally on the compacted state
    Scd2State.fold(snaps(Seq((1L, "2024-01-05", "b"))).select("k", "attr"),
      root, "2024-01-05")
    val got = normalize(Scd2State.intervals(spark, root))
    val want = normalize(Temporal.scd2WithDeletions(
      snaps(week :+ ((1L, "2024-01-05", "b"))), Seq("k"), Seq("attr"), "d"))
    assert(got == want)
  }

  test("autoCompact keeps a hands-off daily fold loop file-bounded; every read bit-identical (VERDICT r15 #3)") {
    // a month of daily snapshots: every key present daily, key 2 flips
    // its attr every 3 days (real churn), key 6 exists on even days
    // only (deletion/reappearance churn)
    val dates = (1 to 24).map(d => f"2024-02-$d%02d")
    val rows = dates.zipWithIndex.flatMap { case (dt, i) =>
      Seq((1L, dt, "a"), (2L, dt, s"v${i / 3}")) ++
        (if (i % 2 == 0) Seq((6L, dt, "e")) else Seq.empty)
    }
    val df = snaps(rows)
    def run(root: String, auto: Option[Int]): Unit = {
      Scd2State.bootstrap(df.filter(col("d") === lit(dates.head)),
        Seq("k"), Seq("attr"), "d", root, buckets = 4)
      dates.tail.foreach { dt =>
        Scd2State.fold(df.filter(col("d") === lit(dt)).select("k", "attr"),
          root, dt, autoCompact = auto)
      }
    }
    val rootA = java.nio.file.Files.createTempDirectory("graft-scd2auto-").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-scd2noauto-").toString
    run(rootA, auto = Some(4))
    run(rootB, auto = None)
    // bounded: <= (threshold + within-one-cycle growth) files per bucket
    // on current, <= threshold+1 history dirs — where the uncompacted
    // loop accrues one per fold
    val curA = Scd2State.currentFileCount(spark, rootA)
    val histA = Scd2State.historyDirCount(spark, rootA)
    assert(curA <= 5 * 4,
      s"autoCompact must bound current files per bucket: $curA files / 4 buckets")
    assert(histA <= 5,
      s"autoCompact must bound history dirs: $histA")
    assert(Scd2State.currentFileCount(spark, rootB) > curA &&
      Scd2State.historyDirCount(spark, rootB) > histA,
      "the uncompacted loop must actually accrue more files (test sanity)")
    // bit-identical reads: current AND full interval history equal the
    // never-compacted loop's
    assert(normalize(Scd2State.intervals(spark, rootA)) ==
      normalize(Scd2State.intervals(spark, rootB)),
      "intervals must be identical across auto-compaction")
    assert(
      Scd2State.currentTable(spark, rootA).select("k", "attr")
        .as[(Long, String)].collect().sorted.toSeq ==
      Scd2State.currentTable(spark, rootB).select("k", "attr")
        .as[(Long, String)].collect().sorted.toSeq,
      "current must be identical across auto-compaction")
    // and the loop keeps folding cleanly after a compaction
    Scd2State.fold(snaps(Seq((1L, "2024-02-25", "a2")))
      .select("k", "attr"), rootA, "2024-02-25", autoCompact = Some(4))
    assert(Scd2State.currentTable(spark, rootA).filter(col("k") === 1)
      .select("attr").as[String].head() == "a2")
  }

  test("removeKeys purges a key everywhere, survives a mid-sweep crash, refold re-admits at version 1") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2d-").toString
    foldAll(root, week, Seq("2024-01-01"),
      Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    // key 2 has multiple versions (history + current) — crash between
    // the current sweep and the history sweep
    intercept[RuntimeException] {
      Scd2State.removeKeysHooked(Seq(2L).toDF("k"), root,
        () => sys.error("boom between sweeps"))
    }
    // any later load finishes the removal through the persisted marker
    val after = normalize(Scd2State.intervals(spark, root))
    assert(!after.exists(_._1 == 2L),
      s"key 2 must be purged from current AND history: $after")
    assert(!new java.io.File(s"$root/scd2_state/_remove_pending").exists(),
      "the remove marker must clear once the sweeps complete")
    // everything else is untouched
    val others = normalize(Temporal.scd2WithDeletions(
      snaps(week), Seq("k"), Seq("attr"), "d")).filterNot(_._1 == 2L)
    assert(after == others)
    // a purged key folding again is simply unknown: version 1
    Scd2State.fold(snaps(Seq((2L, "2024-01-06", "z"))).select("k", "attr"),
      root, "2024-01-06")
    val re = normalize(Scd2State.intervals(spark, root)).filter(_._1 == 2L)
    assert(re.map(_._2) == Seq(1L), s"refolded purged key must re-admit as v1: $re")
  }

  test("intervalsAt prunes history generations by manifested date range; rows identical to the unpruned filter (VERDICT r15 #7)") {
    import org.apache.spark.sql.DataFrame
    val dates = (1 to 20).map(d => f"2024-03-$d%02d")
    // churn so most days RETIRE something (attr flips every 2 days) —
    // every fold lands a non-empty history generation with a narrow
    // [valid_from, valid_to] range
    val rows = dates.zipWithIndex.flatMap { case (dt, i) =>
      Seq((1L, dt, s"a${i / 2}"), (2L, dt, "x")) ++
        (if (i % 3 == 0) Seq((3L, dt, s"m$i")) else Seq.empty)
    }
    val df = snaps(rows)
    val root = java.nio.file.Files.createTempDirectory("graft-scd2pit-").toString
    Scd2State.bootstrap(df.filter(col("d") === lit(dates.head)),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    dates.tail.foreach { dt =>
      Scd2State.fold(df.filter(col("d") === lit(dt)).select("k", "attr"), root, dt)
    }
    def pitNorm(f: DataFrame) =
      f.select(col("k"), col("version"), col("valid_from").cast("string"),
          col("valid_to").cast("string"), col("nb_snapshots"), col("attr"))
        .as[(Long, Long, String, String, Long, String)].collect().sorted.toSeq
    val allLabels = (1 to 19).count(_ => true) // sanity anchor below
    for (pit <- Seq("2024-03-01", "2024-03-07", "2024-03-14", "2024-03-20",
        "2023-12-31", "2025-01-01")) {
      val pruned = Scd2State.intervalsAt(spark, root, pit)
      val want = pitNorm(Scd2State.intervals(spark, root)
        .filter(col("valid_from") <= lit(pit).cast("date") &&
          col("valid_to") >= lit(pit).cast("date")))
      assert(pitNorm(pruned) == want,
        s"pruned PIT at $pit diverged from the unpruned filter")
    }
    // the point query OPENS only overlapping generations: a mid-history
    // date must prune most of the 19 per-date dirs + bootstrap
    val kept = Scd2State.prunedHistLabels(spark, root, "2024-03-07")
    assert(kept.size < 6 && kept.nonEmpty,
      s"expected a handful of overlapping generations, read $kept of ~$allLabels")
    // and the FILES the pruned plan scans stay inside kept dirs ∪ current
    val files = Scd2State.intervalsAt(spark, root, "2024-03-07").inputFiles
    val histFiles = files.filter(_.contains("/history/d="))
    assert(histFiles.nonEmpty &&
      histFiles.forall(f => kept.exists(l => f.contains(s"/d=$l/"))),
      s"plan reads non-overlapping generation files:\n${histFiles.mkString("\n")}")
    // history compaction folds the manifest with the dirs
    Scd2State.compactHistory(spark, root)
    for (pit <- Seq("2024-03-07", "2024-03-20")) {
      val want = pitNorm(Scd2State.intervals(spark, root)
        .filter(col("valid_from") <= lit(pit).cast("date") &&
          col("valid_to") >= lit(pit).cast("date")))
      assert(pitNorm(Scd2State.intervalsAt(spark, root, pit)) == want,
        s"post-compaction pruned PIT at $pit diverged")
    }
    // the RANGE face: overlap semantics against the unpruned filter,
    // including a window straddling the (compacted) history boundary
    for ((lo, hi) <- Seq(("2024-03-05", "2024-03-09"),
        ("2024-03-18", "2024-03-25"), ("2023-01-01", "2023-12-31"))) {
      val want = pitNorm(Scd2State.intervals(spark, root)
        .filter(col("valid_from") <= lit(hi).cast("date") &&
          col("valid_to") >= lit(lo).cast("date")))
      assert(pitNorm(Scd2State.intervalsBetween(spark, root, lo, hi)) == want,
        s"pruned range read [$lo, $hi] diverged from the unpruned filter")
    }
    // a torn/missing manifest degrades to the unpruned read, never a
    // wrong answer
    val mf = new java.io.File(s"$root/scd2_state/_graft_hist_ranges.json")
    assert(mf.exists()); mf.delete()
    val want = pitNorm(Scd2State.intervals(spark, root)
      .filter(col("valid_from") <= lit("2024-03-07").cast("date") &&
        col("valid_to") >= lit("2024-03-07").cast("date")))
    assert(pitNorm(Scd2State.intervalsAt(spark, root, "2024-03-07")) == want)
  }

  test("an empty snapshot replayed after later folds no-ops instead of throwing") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2e-").toString
    foldAll(root, week, Seq("2024-01-01"), Seq("2024-01-02", "2024-01-03"))
    val before = normalize(Scd2State.intervals(spark, root))
    // ADVICE r14: the empty check must precede the date-order require
    Scd2State.fold(snaps(week).filter(lit(false)).select("k", "attr"),
      root, "2024-01-02")
    assert(normalize(Scd2State.intervals(spark, root)) == before)
  }

  test("ledger-pinned column names are validated at bootstrap") {
    val root = java.nio.file.Files.createTempDirectory("graft-scd2v-").toString
    val bad = snaps(week).withColumnRenamed("attr", "at,tr")
    val ex = intercept[IllegalArgumentException] {
      Scd2State.bootstrap(bad, Seq("k"), Seq("at,tr"), "d", root, buckets = 4)
    }
    assert(ex.getMessage.contains("[A-Za-z0-9_]"))
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

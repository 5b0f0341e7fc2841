package graft

import java.sql.Date

import graft.ops.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2 collapses runs, breaks on change, spans gaps, null-safe attrs") {
    val snaps = Seq(
      // key 1: A A B B A — three versions
      (1L, d("2026-01-01"), Some("A")), (1L, d("2026-01-02"), Some("A")),
      (1L, d("2026-01-03"), Some("B")), (1L, d("2026-01-04"), Some("B")),
      (1L, d("2026-01-05"), Some("A")),
      // key 2: present, absent 3 days, back with SAME attr — one version
      (2L, d("2026-01-01"), Some("X")), (2L, d("2026-01-05"), Some("X")),
      // key 3: NULL attr runs compare as values, not as perpetual change
      (3L, d("2026-01-01"), None), (3L, d("2026-01-02"), None),
      (3L, d("2026-01-03"), Some("C"))
    ).toDF("id", "snap_date", "attr")
    val got = Temporal.scd2(snaps, Seq("id"), Seq("attr"), "snap_date")
      .select("id", "version", "valid_from", "valid_to", "nb_snapshots", "attr")
      .as[(Long, Long, Date, Date, Long, Option[String])]
      .collect().sorted.toSeq
    assert(got == Seq(
      (1L, 1L, d("2026-01-01"), d("2026-01-02"), 2L, Some("A")),
      (1L, 2L, d("2026-01-03"), d("2026-01-04"), 2L, Some("B")),
      (1L, 3L, d("2026-01-05"), d("2026-01-05"), 1L, Some("A")),
      (2L, 1L, d("2026-01-01"), d("2026-01-05"), 2L, Some("X")),
      (3L, 1L, d("2026-01-01"), d("2026-01-02"), 2L, None),
      (3L, 2L, d("2026-01-03"), d("2026-01-03"), 1L, Some("C"))
    ), s"got $got")
  }

  test("scd2WithDeletions: an observed-elsewhere gap closes the interval") {
    val snaps = Seq(
      // the calendar (dates anyone was observed): 01..05
      // key 1: present every day, attr constant — one open-run version
      (1L, d("2026-01-01"), Some("A")), (1L, d("2026-01-02"), Some("A")),
      (1L, d("2026-01-03"), Some("A")), (1L, d("2026-01-04"), Some("A")),
      (1L, d("2026-01-05"), Some("A")),
      // key 2: DELETED for 02..04, back with the SAME attr — plain scd2
      // spans this as one version; the deletion face must close at 01
      // and reopen at 05
      (2L, d("2026-01-01"), Some("X")), (2L, d("2026-01-05"), Some("X")),
      // key 3: born on 03 — days 01/02 are not absence (not yet born);
      // vanished after 04 — its last version closes at 04
      (3L, d("2026-01-03"), Some("C")), (3L, d("2026-01-04"), Some("C")),
      // key 4: attr change AND a gap: B(01), B(02), gap(03), D(04)
      (4L, d("2026-01-01"), Some("B")), (4L, d("2026-01-02"), Some("B")),
      (4L, d("2026-01-04"), Some("D"))
    ).toDF("id", "snap_date", "attr")
    val got = Temporal.scd2WithDeletions(snaps, Seq("id"), Seq("attr"), "snap_date")
      .select("id", "version", "valid_from", "valid_to", "nb_snapshots", "attr")
      .as[(Long, Long, Date, Date, Long, Option[String])]
      .collect().sorted.toSeq
    assert(got == Seq(
      (1L, 1L, d("2026-01-01"), d("2026-01-05"), 5L, Some("A")),
      (2L, 1L, d("2026-01-01"), d("2026-01-01"), 1L, Some("X")),
      (2L, 2L, d("2026-01-05"), d("2026-01-05"), 1L, Some("X")),
      (3L, 1L, d("2026-01-03"), d("2026-01-04"), 2L, Some("C")),
      (4L, 1L, d("2026-01-01"), d("2026-01-02"), 2L, Some("B")),
      (4L, 2L, d("2026-01-04"), d("2026-01-04"), 1L, Some("D"))
    ), s"got $got")
  }

  test("scd2 with multiple attrs breaks when ANY of them changes") {
    val snaps = Seq(
      (1L, d("2026-02-01"), "gold", 10),
      (1L, d("2026-02-02"), "gold", 20), // second attr changes
      (1L, d("2026-02-03"), "gold", 20)
    ).toDF("id", "snap_date", "tier", "limit")
    val got = Temporal.scd2(snaps, Seq("id"), Seq("tier", "limit"), "snap_date")
      .select("id", "version", "nb_snapshots", "tier", "limit")
      .as[(Long, Long, Long, String, Int)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L, 1L, "gold", 10), (1L, 2L, 2L, "gold", 20)))
  }

  test("pitJoin picks the covering version, boundaries inclusive, misses drop") {
    val dim = Seq(
      (1L, 1L, d("2026-01-01"), d("2026-01-03"), "A"),
      (1L, 2L, d("2026-01-04"), d("2026-01-06"), "B"),
      (2L, 1L, d("2026-01-02"), d("2026-01-02"), "X")
    ).toDF("id", "version", "valid_from", "valid_to", "attr")
    val facts = Seq(
      (100L, 1L, d("2026-01-01")), // lower boundary of v1
      (101L, 1L, d("2026-01-03")), // upper boundary of v1
      (102L, 1L, d("2026-01-05")), // inside v2
      (103L, 1L, d("2026-01-09")), // after every version: drops
      (104L, 2L, d("2026-01-02")), // exact single-day interval
      (105L, 3L, d("2026-01-02"))  // unknown key: drops
    ).toDF("fact_id", "id", "fd")
    val got = graft.ops.Temporal.pitJoin(facts, dim, Seq("id"), "fd")
      .select("fact_id", "attr").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((100L, "A"), (101L, "A"), (102L, "B"), (104L, "X")))
  }

  test("densifyFfill fills gaps with the last observation, flags synthesized rows") {
    val df = Seq(
      (1L, d("2026-01-01"), Some(10.0)),
      (1L, d("2026-01-04"), Some(40.0)), // 2 gap days forward-filled 10.0
      (2L, d("2026-01-02"), None),       // observed NULL stays NULL until 03
      (2L, d("2026-01-03"), Some(3.0))
    ).toDF("id", "dt", "v")
    val got = graft.ops.Temporal.densifyFfill(df, Seq("id"), "dt", Seq("v"))
      .select("id", "dt", "v", "was_observed")
      .as[(Long, java.sql.Date, Option[Double], Boolean)]
      .collect().sortBy(r => (r._1, r._2.toString)).toSeq
    assert(got == Seq(
      (1L, d("2026-01-01"), Some(10.0), true),
      (1L, d("2026-01-02"), Some(10.0), false),
      (1L, d("2026-01-03"), Some(10.0), false),
      (1L, d("2026-01-04"), Some(40.0), true),
      (2L, d("2026-01-02"), None, true),
      (2L, d("2026-01-03"), Some(3.0), true)
    ), s"got $got")
  }

  test("scd2 is partition-count independent") {
    // i < 17*28 keeps (id, snap_date) unique — scd2's precondition
    val snaps = (0L until 476L)
      .map(i => (i % 17, d(f"2026-03-${(i / 17) % 28 + 1}%02d"), (i / 51) % 3))
      .toDF("id", "snap_date", "attr")
    def run(parts: Int) =
      Temporal.scd2(snaps.repartition(parts), Seq("id"), Seq("attr"), "snap_date")
        .select("id", "version", "valid_from", "valid_to")
        .as[(Long, Long, Date, Date)].collect().sorted.toSeq
    assert(run(1) == run(11))
  }
}

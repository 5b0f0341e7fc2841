package graft

import org.apache.spark.sql.functions._

import graft.ops.Monitor

class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("histogramDrift: exact gaps, missing buckets zero-filled, NULL/overflow clamped") {
    val a = Seq(10L, 20L, 80L, 160L).toDF("v")                  // buckets 0,0,1,2
    val b = Seq[Option[Long]](Some(10L), Some(700L), None).toDF("v") // 0, clamp→3, NULL→0
    val rows = Monitor.histogramDrift(a, b, "v", 75L, 4)
      .orderBy("bucket")
      .select("bucket", "c_a", "c_b", "gap_num").as[(Long, Long, Long, Long)]
      .collect().toSeq
    // tot_a=4 tot_b=3; gaps: b0 |2*3-2*4|=2, b1 |1*3-0|=3, b2 |1*3-0|=3, b3 |0-1*4|=4
    assert(rows == Seq((0L, 2L, 2L, 2L), (1L, 1L, 0L, 3L),
      (2L, 1L, 0L, 3L), (3L, 0L, 1L, 4L)))
  }

  test("identical snapshots drift zero; disjoint snapshots drift maximally") {
    val x = Seq(1L, 100L, 200L, 300L).toDF("v")
    val same = Monitor.histogramDrift(x, x, "v", 75L, 8)
    assert(same.agg(sum("gap_num")).as[Long].head() == 0L)
    val y = Seq(500L, 550L).toDF("v")
    val disj = Monitor.histogramDrift(x, y, "v", 75L, 8)
    // L1 of disjoint distributions = 2 → Σ gap_num = 2·tot_a·tot_b
    assert(disj.agg(sum("gap_num")).as[Long].head() == 2L * 4L * 2L)
  }

  test("histogramDriftBy: per-group totals; a vanished group reports NULL ppm, not silence") {
    val a = Seq(("s1", 10L), ("s1", 100L), ("s2", 10L), ("s2", 20L)).toDF("g", "v")
    val b = Seq(("s1", 10L), ("s1", 100L)).toDF("g", "v") // s2 vanished
    val rows = Monitor.histogramDriftBy(a, b, "v", "g", 75L, 2)
      .orderBy("g", "bucket").collect()
    val s1 = rows.filter(_.getString(0) == "s1")
    // s1 unchanged → zero gaps, ppm 0.0 (its own totals, unaffected by s2)
    assert(s1.forall(r => r.getAs[Long]("gap_num") == 0L &&
      r.getAs[Double]("gap_ppm") == 0.0))
    val s2 = rows.filter(_.getString(0) == "s2")
    assert(s2.nonEmpty, "vanished group must still report")
    assert(s2.forall(r => r.getAs[Long]("c_b") == 0L && r.isNullAt(r.fieldIndex("gap_ppm"))))
  }

  test("empty snapshot reports NULL ppm (not NaN); decimalGap keeps the exact face") {
    // review r12: an empty side made gap_ppm 0·1e6/0 = NaN while the
    // per-group sibling returned NULL for the same condition — the two
    // report surfaces must agree, and NaN must never land in a report
    val a = Seq(10L, 100L).toDF("v")
    val empty = a.filter(lit(false))
    val rows = Monitor.histogramDrift(a, empty, "v", 75L, 2)
      .orderBy("bucket").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("gap_ppm"))),
      s"empty-side ppm must be NULL: ${rows.toSeq}")
    assert(rows.forall(r => r.getAs[Long]("gap_num") == 0L)) // |c·0 − 0·tot| = 0
    // the exact decimal escape hatch: same values, DECIMAL(38,0) face
    val dec = Monitor.histogramDrift(a, a, "v", 75L, 2, decimalGap = true)
    assert(dec.schema("gap_num").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0))
    assert(dec.orderBy("bucket").collect()
      .forall(_.getDecimal(3).longValueExact() == 0L))
  }

  test("histogramDrift is partition-count independent") {
    val a = spark.range(1000).select((col("id") * 7 % 613).as("v"))
    val b = spark.range(800).select((col("id") * 11 % 613).as("v"))
    def run(parts: Int) =
      Monitor.histogramDrift(a.repartition(parts), b.repartition(parts), "v", 50L, 16)
        .orderBy("bucket").collect().toSeq
    assert(run(1) == run(7))
  }

  test("embeddingDrift: planted mean shift flagged, null dims quiet, constant dim NULL z") {
    // dim 0 constant on both sides (zero variance → NULL z, shift still
    // reports); dim 2 shifted +0.5 on side B; dim 1 is two INDEPENDENT
    // same-distribution draws (A and B consume disjoint RNG output), so
    // its z is ~N(0,1) for this seed — quiet, not exactly zero
    val r = new scala.util.Random(3)
    def vec(shift: Double) =
      Seq(1.0, r.nextGaussian() * 0.1, r.nextGaussian() * 0.1 + shift)
    val a = (0 until 60).map(i => i -> vec(0.0)).toDF("id", "v")
    val b = (0 until 60).map(i => i -> vec(0.5)).toDF("id", "v")
    val out = Monitor.embeddingDrift(a, b, "v").collect()
      .map(r => r.getAs[Int]("i") ->
        (r.getAs[Double]("mean_shift"),
          Option(r.getAs[java.lang.Double]("shift_z")))).toMap
    assert(out.size == 3)
    assert(out(0)._2.isEmpty && math.abs(out(0)._1) < 1e-9) // constant dim
    assert(math.abs(out(1)._2.get) < 4.0)                   // null dim quiet
    assert(out(2)._2.get > 10.0 && out(2)._1 > 0.4)         // planted shift
  }

  test("embeddingDrift: a dimensionality swap reports the vanished dims, not silence") {
    val a = (0 until 20).map(i => i -> Seq(i * 0.1, 1.0, 2.0)).toDF("id", "v")
    val b = (0 until 20).map(i => i -> Seq(i * 0.1, 1.0)).toDF("id", "v") // 3→2 dims
    val out = Monitor.embeddingDrift(a, b, "v").collect()
      .map(r => r.getAs[Int]("i") ->
        (Option(r.getAs[java.lang.Long]("n_a")), Option(r.getAs[java.lang.Long]("n_b")))).toMap
    assert(out.size == 3) // dim 2 present with NULL B-side stats — the loudest signal
    assert(out(2) == ((Some(20L), None)))
    assert(out(0) == ((Some(20L), Some(20L))))
  }

  test("embeddingDrift is partition-count independent") {
    val a = (0 until 40).map(i => i -> Seq(i * 0.01, 1.0 - i * 0.02)).toDF("id", "v")
    val b = (0 until 40).map(i => i -> Seq(i * 0.015, 0.5 + i * 0.01)).toDF("id", "v")
    def run(parts: Int) =
      Monitor.embeddingDrift(a.repartition(parts), b.repartition(parts), "v")
        .orderBy("i").collect().toSeq
    assert(run(1) == run(7))
  }
}

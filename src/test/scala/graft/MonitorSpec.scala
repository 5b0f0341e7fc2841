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

  test("histogramDrift is partition-count independent") {
    val a = spark.range(1000).select((col("id") * 7 % 613).as("v"))
    val b = spark.range(800).select((col("id") * 11 % 613).as("v"))
    def run(parts: Int) =
      Monitor.histogramDrift(a.repartition(parts), b.repartition(parts), "v", 50L, 16)
        .orderBy("bucket").collect().toSeq
    assert(run(1) == run(7))
  }
}

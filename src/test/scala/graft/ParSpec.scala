package graft

import graft.ops.Par

/** Pins the r17-opt scan-parallelism floor's two contractual behaviors:
  * it widens small frames to the session's parallelism WITHOUT touching
  * the row set, and it is a strict NO-OP above the size gate (the
  * scale-adaptive promise — at cluster scale no corpus ever pays the
  * repartition). */
class ParSpec extends SparkSpec {

  test("floor fires on a small frame and preserves the row set exactly") {
    val df = spark.range(1000).toDF("id")
    val out = Par.ensureMinPartitions(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "a small frame must be widened to defaultParallelism")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 1000L).toSeq,
      "the guard must never change the row set")
  }

  test("no-op above the size gate: big frames are returned untouched") {
    // stats estimate: 2^32 longs ≈ 32 GB >> defaultParallelism × 128 MB —
    // the guard must hand back the SAME frame (no added exchange), which
    // is exactly what keeps it scale-adaptive at 100 TB
    val big = spark.range(1L << 32).toDF("id")
    assert(Par.ensureMinPartitions(big) eq big,
      "a frame the planner estimates big must pass through untouched")
  }
}

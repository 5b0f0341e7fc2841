package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan-parallelism floor for compute-heavy operator
  * faces (optimization guide §2.5/§6.1).
  *
  * The problem: a parquet file is splittable only at row-group
  * boundaries, so a table written as one row group scans as ONE
  * partition however many cores the session has. Any face whose heavy
  * per-row work (char-gram explodes, md5 bucket hashing, DECIMAL(38,0)
  * folds, MinHash) sits BEFORE its first exchange then runs serial —
  * measured on this repo's bench: the trained-scoring queries were
  * wall-flat between local[4] and local[32] because their scoring
  * stage never left the single scan partition.
  *
  * The fix must be scale-ADAPTIVE, not a tuned constant: at 100 TB a
  * corpus scan already yields hundreds of thousands of splits and a
  * blanket repartition would be a full-corpus shuffle for nothing. So
  * the guard consults the optimizer's size estimate: only when the
  * frame is estimated SMALLER than (defaultParallelism ×
  * maxPartitionBytes) — i.e. the scan cannot reach core-count
  * parallelism on its own, and equivalently the repartition is cheap
  * (bounded by cores × split bytes) — does it round-robin repartition
  * to the session's parallelism. Estimates err on the large side for
  * joins/aggregates (stats multiply up), which fails SAFE: no shuffle
  * is ever added to a frame the planner thinks is big.
  */
object Par {

  /** Upper bound (bytes) below which the guard may repartition: the
    * session's core count × files.maxPartitionBytes — the exact point
    * where a contiguous scan stops being able to feed every core. */
  private def smallBytes(df: DataFrame): BigInt = {
    val sess = df.sparkSession
    // Spark's own byte-string parser, so size-suffixed conf values
    // ("128m", "1g") resolve correctly — the previous digits-only parse
    // silently fell back to the default on any suffixed deployment
    // (ADVICE r17), moving the repartition gate's threshold
    val split = scala.util.Try(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        sess.conf.get("spark.sql.files.maxPartitionBytes", "134217728")))
      .getOrElse(134217728L)
    BigInt(sess.sparkContext.defaultParallelism) * BigInt(split)
  }

  /** `df`, round-robin repartitioned to the session's default
    * parallelism iff its optimizer size estimate says the scan cannot
    * parallelize on its own (see object doc). Row set and values are
    * untouched; callers are aggregation/join faces whose results are
    * order-independent. */
  def ensureMinPartitions(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want <= 1) df
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est < smallBytes(df)) df.repartition(want) else df
    }
  }
}

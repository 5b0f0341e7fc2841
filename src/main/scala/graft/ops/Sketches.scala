package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistics cardinality sketches.
  *
  * The streaming-state and heavy-hitter sketches live elsewhere
  * ([[graft.functions.HeavyHitters]] is the Misra-Gries UDAF); this file
  * holds the *distinct-count* side: K-minimum-values (KMV), the classic
  * "keep the k smallest hashes" estimator (Bar-Yossef et al. 2002). It is
  * chosen over HLL here because every intermediate is EXACT integer
  * arithmetic over md5 — so the whole sketch, including the estimate, is
  * bit-identical across engines and oracle-hash-checkable, which a
  * register-rounding HLL is not.
  *
  * Determinism: values are hashed to 48-bit integers via the repo-standard
  * `conv(substring(md5(x), 1, 12), 16, 10)` (DuckDB mirror:
  * `CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)`); the estimate is one
  * pinned IEEE chain over those integers.
  */
object Sketches {

  /** Per-group K-minimum-values distinct-count estimate.
    *
    * Output per group: `nb_distinct` (exact distinct hash count — with
    * 48-bit hashes, collision-free in practice and in any case computed
    * identically by the oracle), `k_used` = min(k, nb_distinct),
    * `kth_min` = the k-th smallest hash, and `est_distinct` — the KMV
    * estimator (k−1)·2⁴⁸ ∕ kth_min when the sketch is full, or the exact
    * count when the group has fewer than k distinct values (the sketch IS
    * the value set then).
    *
    * 100 TB posture: the `distinct` is a partial-aggregated shuffle that
    * collapses the corpus to its per-group VOCABULARY (bounded — token
    * vocabularies are millions, not corpus-sized), and the rank window
    * sorts only that collapsed set per group. The estimate itself needs
    * only the k smallest — a production variant could fold per-partition
    * top-k before the exchange, but the vocabulary collapse already does
    * the corpus-sized reduction map-side. */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536] (got $k)")
    val hashed = df
      .select(col(groupCol),
        conv(substring(md5(value.cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val rn = row_number().over(Window.partitionBy(groupCol).orderBy(col("h")))
    hashed.withColumn("rn", rn)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("nb_distinct"),
        sum(when(col("rn") <= k, lit(1L))).as("k_used"),
        max(when(col("rn") <= k, col("h"))).as("kth_min"))
      .withColumn("est_distinct",
        when(col("k_used") < k, col("nb_distinct").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
            col("kth_min").cast("double")))
  }

  /** The mergeable face of KMV: per group, the ascending k-minimum hash
    * ARRAY (`hs`, length min(k, nb_distinct)) plus the exact distinct
    * count. Two groups' sketches union by `kmvMerge` — k ints per group
    * travel, never the corpus — which is what makes an all-pairs overlap
    * matrix tractable at 100 TB: one corpus pass builds the sketches,
    * every pairwise union/Jaccard estimate after that is sketch-side
    * arithmetic. */
  def kmvMinHashes(df: DataFrame, groupCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536] (got $k)")
    val hashed = df
      .select(col(groupCol),
        conv(substring(md5(value.cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val rn = row_number().over(Window.partitionBy(groupCol).orderBy(col("h")))
    hashed.withColumn("rn", rn)
      .groupBy(groupCol)
      .agg(
        sort_array(collect_list(when(col("rn") <= k, col("h")))).as("hs"),
        count(lit(1)).as("nb_distinct"))
  }

  /** KMV estimate from a sketch array: exact length when the sketch never
    * filled (the array IS the value set then), else (k−1)·2⁴⁸ ∕ hs[k].
    * `nbDistinct` supplies the exact count for the not-full branch —
    * pass `size(hs)` for a MERGED sketch (where "not full" proves both
    * inputs were exhaustive, so the merged array is the exact union). */
  def kmvEstimate(hs: Column, nbDistinct: Column, k: Int): Column =
    when(size(hs) < k, nbDistinct.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
        element_at(hs, k).cast("double"))

  /** Union of two KMV sketches: the k smallest of the merged distinct
    * hash sets — associative, commutative, idempotent. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Persisted incremental face: fold a DELTA corpus's per-group sketches
    * into the sketch state at `path` (parquet `(group, hs)`), returning
    * the updated state. Daily cardinality monitoring then reads
    * yesterday's sketches plus ONE pass over the new rows — never the
    * historical corpus. Because [[kmvMerge]] is associative, commutative,
    * and idempotent, any fold order gives the state a full rebuild would,
    * and replaying a crashed day's delta changes nothing (at-least-once
    * safe with no dedup bookkeeping).
    *
    * 100 TB posture: the state is sketch-sized (groups × k longs — MBs
    * for thousands of groups; size `partitions` to that volume), so the
    * full-outer merge join is a broadcast-scale frame; the only
    * corpus-scale work is the delta's own vocabulary collapse. The write
    * rides [[BucketedTables.writePlainSnapshot]]'s temp-sibling →
    * atomic-swap discipline: a crash mid-write leaves the previous
    * snapshot recoverable, never a torn state (and the tmp dir means the
    * merged frame is never written over its own input). */
  def updateState(spark: org.apache.spark.sql.SparkSession, path: String,
                  delta: DataFrame, groupCol: String, value: Column,
                  k: Int, partitions: Int = 1): DataFrame = {
    val d = kmvMinHashes(delta, groupCol, value, k)
      .select(col(groupCol), col("hs"))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = BucketedTables.hadoopFs(spark, p)
    BucketedTables.recoverSwap(fs, p)
    val merged = if (fs.exists(p)) {
      val empty = array().cast("array<long>")
      spark.read.parquet(path)
        .select(col(groupCol), col("hs").as("__hs_state"))
        .join(d.select(col(groupCol), col("hs").as("__hs_delta")),
          Seq(groupCol), "full_outer")
        .select(col(groupCol),
          kmvMerge(coalesce(col("__hs_state"), empty),
            coalesce(col("__hs_delta"), empty), k).as("hs"))
    } else d
    BucketedTables.writePlainSnapshot(merged, path, partitions)
    spark.read.parquet(path)
  }
}

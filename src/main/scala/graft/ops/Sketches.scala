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
  def kmvUpdateState(spark: org.apache.spark.sql.SparkSession, path: String,
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

  // ---------------------------------------------------------------- Count-Min

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — the *frequency*
    * side of the sketch family (KMV above = cardinality,
    * [[graft.functions.HeavyHitters]] = top-k identity). d independent
    * hash rows × w buckets of ADDITIVE long counters; a point estimate is
    * the min over the d counters a value hashes to — never an
    * undercount, overcount bounded by ‖corpus‖∕w per row with
    * probability 1−(1∕2)^d under pairwise-independent hashing.
    *
    * Like KMV, every intermediate is exact integer arithmetic over md5
    * (bucket j of v = 48-bit md5("j:v") mod w), so the sketch AND its
    * estimates are bit-identical cross-engine and oracle-hash-checkable —
    * the property that puts the approximate path itself under the
    * correctness gate, not just the exact counts it approximates. */

  /** Bucket of `value` in hash row `j` (both columns): 48-bit md5 of
    * "j:v" mod w. DuckDB mirror:
    * `CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || v), 1, 12)) AS BIGINT) % w`. */
  def cmBucket(j: Column, value: Column, w: Int): Column =
    conv(substring(md5(concat_ws(":", j, value.cast("string"))), 1, 12), 16, 10)
      .cast("long") % w

  /** Build a Count-Min sketch of `value` occurrences (weighted by
    * `weight`, default 1 per row) as a frame `(j, bucket, cnt)` — only
    * NONZERO counters materialize (absent = 0 at estimate time), so the
    * frame is min(d·w, d·vocab) rows regardless of corpus size.
    *
    * 100 TB posture: this is where CM beats exact counting — the d
    * buckets are computed MAP-SIDE per row, and the single aggregation's
    * partial combine collapses every partition to ≤ d·w counter rows
    * before the exchange, so the shuffle carries at most
    * partitions × d × w (int, long, long) triples no matter how large
    * the corpus is. No value string ever rides an exchange (contrast
    * [[kmvDistinct]], whose vocabulary collapse is corpus-vocab-sized). */
  def cmBuild(df: DataFrame, value: Column, d: Int, w: Int,
              weight: Column = lit(1L)): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16] (got $d)")
    require(w >= 2 && w <= (1 << 26), s"w must be in [2, 2^26] (got $w)")
    df.select(value.cast("string").as("v"), weight.cast("long").as("c"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("j"), col("v"), col("c"))
      .groupBy(col("j"), cmBucket(col("j"), col("v"), w).as("bucket"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Point estimates for `probes` (any frame with a `v` string column,
    * deduplicated here) against a sketch frame: per probe value, the min
    * over the d rows of the counter it hashes to, absent counters = 0.
    * Output `(v, est)`; est ≥ the true count always (CM guarantee).
    *
    * The sketch is d·w bounded — broadcast it; probes then estimate
    * map-side with one dimension-sized join, no corpus access at all. */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, value: Column,
                 d: Int, w: Int): DataFrame = {
    val p = probes.select(value.cast("string").as("v")).distinct()
      .select(col("v"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("j"), col("v"), w))
    p.join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Union of two sketch frames built with the same (d, w): counters add
    * elementwise — associative and commutative, so per-day / per-source
    * sketches fold in any order. NOT idempotent (unlike [[kmvMerge]]):
    * replaying a delta double-counts, which is why the persisted face
    * [[cmUpdateState]] carries an applied-delta ledger. */
  def cmMergeFrames(a: DataFrame, b: DataFrame): DataFrame =
    a.select("j", "bucket", "cnt").union(b.select("j", "bucket", "cnt"))
      .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))

  private def cmLedgerPath(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "applied.json")

  /** Delta ids already folded into the CM state at `path`. */
  def cmAppliedDeltas(spark: org.apache.spark.sql.SparkSession,
                      path: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    BucketedTables.recoverSwap(BucketedTables.hadoopFs(spark, root), root)
    BucketedTables.readJsonSidecar(spark, cmLedgerPath(root))
      .map(body => """"([^"]+)"""".r.findAllMatchIn(
        body.dropWhile(_ != '[')).map(_.group(1)).toSet)
      .getOrElse(Set.empty)
  }

  /** Persisted incremental face: fold `delta`'s sketch into the state at
    * `path`, AT-MOST-ONCE per `deltaId`. Addition is not idempotent, so
    * exactly-once under crash-replay needs a ledger: applied delta ids
    * live in an `applied.json` sidecar INSIDE the snapshot directory,
    * written into the temp sibling BEFORE the atomic swap — counters and
    * ledger become visible in the same rename, so a crash anywhere
    * leaves them consistent (before the swap: neither; after: both) and
    * a replayed day is a no-op, never a double count.
    *
    * State layout: `<path>/counters` parquet `(j, bucket, cnt)` +
    * `<path>/applied.json`. Returns the updated counters frame. */
  def cmUpdateState(spark: org.apache.spark.sql.SparkSession, path: String,
                    delta: DataFrame, value: Column, d: Int, w: Int,
                    deltaId: String, weight: Column = lit(1L),
                    partitions: Int = 1): DataFrame =
    ledgeredAdditiveFold(spark, path, deltaId,
      cmBuild(delta, value, d, w, weight), cmMergeFrames, partitions)

  /** Shared exactly-once fold for ADDITIVE sketches (Count-Min counters,
    * quantile histograms): counters parquet + `applied.json` ledger land
    * in a temp sibling and become visible in the same atomic swap, so a
    * crash anywhere leaves them consistent and a replayed `deltaId` is a
    * no-op — the discipline [[cmUpdateState]] established, now the one
    * implementation both sketch states ride. */
  private def ledgeredAdditiveFold(
      spark: org.apache.spark.sql.SparkSession, path: String,
      deltaId: String, dSketch: DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      partitions: Int): DataFrame = {
    require(!deltaId.contains("\""), s"deltaId must not contain quotes: $deltaId")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = BucketedTables.hadoopFs(spark, root)
    BucketedTables.recoverSwap(fs, root)
    val counters = new org.apache.hadoop.fs.Path(root, "counters")
    val applied = cmAppliedDeltas(spark, path)
    if (applied.contains(deltaId)) return spark.read.parquet(counters.toString)
    val merged =
      if (fs.exists(counters))
        merge(spark.read.parquet(counters.toString), dSketch)
      else dSketch
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    merged.repartition(partitions).write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "counters").toString)
    BucketedTables.writeJsonSidecar(spark, cmLedgerPath(tmp),
      (applied + deltaId).toSeq.sorted
        .mkString("{\"applied\":[\"", "\",\"", "\"]}"))
    BucketedTables.swapInto(fs, tmp, root)
    spark.catalog.refreshByPath(counters.toString)
    spark.read.parquet(counters.toString)
  }

  // ------------------------------------------------------- Quantile sketch

  /** Log-histogram QUANTILE sketch — the order-statistics side of the
    * family (KMV = cardinality, Count-Min = frequency, HeavyHitters =
    * identity). Exact per-group percentiles (q32) sort the group's whole
    * value set; at 100 TB the scale path is a MERGEABLE fixed-resolution
    * histogram: non-negative longs bucket by their top 4 binary digits
    * (power-of-2 octave + 8 sub-buckets → every bucket spans ≤ 12.5% of
    * its lower bound), per-partition bucket counts combine map-side
    * (plain partial+final aggregation), and the whole sketch is ≤ 8·61
    * counters per group whatever the corpus size. A rank query returns
    * the bucket LOWER BOUND holding the ⌈q·N⌉-th value: a true value-
    * domain lower bound L with L ≤ exact-quantile < L·9∕8 + 1 (exact for
    * values ≤ 7, which bucket individually).
    *
    * Determinism: the octave is `length(bin(v)) − 1` — STRING length of
    * the binary form, identical in Spark and DuckDB — never float
    * `log2`, whose rounding flips `floor` at large power-of-two
    * boundaries (log2(2⁵⁰−1) rounds to 50.0 in IEEE); the truncation is
    * integer shifts. Every count and rank is a long, so the sketch AND
    * its answers hash-compare cross-engine. */

  /** Lower bound of `value`'s log-histogram bucket (`value` ≥ 0: the top
    * 4 binary digits, lower bits zeroed; 0–7 pass through). DuckDB
    * mirror: `CASE WHEN v <= 7 THEN v ELSE (v >> (length(bin(v)) - 4))
    * << (length(bin(v)) - 4) END`. */
  def logBucketLb(value: Column): Column = {
    val bits = length(bin(value)) - 4
    when(value <= 7, value).otherwise(
      call_function("shiftleft", call_function("shiftright", value, bits), bits))
  }

  /** Per-group log-histogram: (group, lb, cnt) — the persistable,
    * mergeable sketch rows (merge = sum counts per (group, lb)). */
  def logHistogram(df: DataFrame, groupCol: String, value: Column): DataFrame =
    df.select(col(groupCol), logBucketLb(value).as("lb"))
      .groupBy(groupCol, "lb").agg(count(lit(1)).as("cnt"))

  /** Merge two histogram-sketch frames: counts sum per (group, lb). */
  def lhMergeFrames(a: DataFrame, b: DataFrame): DataFrame = {
    val keys = a.columns.filterNot(_ == "cnt").map(col).toSeq
    a.unionByName(b).groupBy(keys: _*).agg(sum("cnt").as("cnt"))
  }

  /** Persisted incremental face of the quantile sketch: fold `delta`'s
    * per-group histogram into the state at `path`, AT-MOST-ONCE per
    * `deltaId` (the [[cmUpdateState]] ledger discipline — histogram
    * addition is not idempotent either). Daily length/latency
    * distribution monitoring then reads yesterday's ≤ 488-counters-per-
    * group state plus one pass over the new rows, never the history. */
  def lhUpdateState(spark: org.apache.spark.sql.SparkSession, path: String,
                    delta: DataFrame, groupCol: String, value: Column,
                    deltaId: String, partitions: Int = 1): DataFrame =
    ledgeredAdditiveFold(spark, path, deltaId,
      logHistogram(delta, groupCol, value), lhMergeFrames, partitions)

  /** Generic persisted ADDITIVE-COUNTER state: fold a delta's counter
    * frame (any key columns + a `cnt` long — a [[logHistogram]], a
    * [[graft.ops.Sampling.hashedNgramCounts]] DSIR profile, any
    * mergeable bag-of-counts) into the state at `path`, exactly-once
    * per `deltaId` through the same ledger/swap discipline as
    * [[cmUpdateState]]/[[lhUpdateState]]. Counters are bounded by the
    * key space, never the corpus — the state read and the merged write
    * stay sketch-sized however much data folded in. */
  def counterUpdateState(spark: org.apache.spark.sql.SparkSession,
                         path: String, delta: DataFrame, deltaId: String,
                         partitions: Int = 1): DataFrame =
    ledgeredAdditiveFold(spark, path, deltaId, delta, lhMergeFrames, partitions)

  /** Read a persisted additive-sketch state's counters WITHOUT folding a
    * delta — the monitoring face: two snapshots' persisted histograms
    * answer a quantile-drift question ([[Monitor.quantileDriftFromHists]])
    * from ≤ 488 counters per group, never a corpus rescan. */
  def readState(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    BucketedTables.recoverSwap(BucketedTables.hadoopFs(spark, root), root)
    spark.read.parquet(new org.apache.hadoop.fs.Path(root, "counters").toString)
  }

  /** Named quantile lower bounds per group from an already-built
    * histogram frame (fresh from [[logHistogram]] or read back from the
    * [[lhUpdateState]] state): for each (name, qNum, qDen) the bucket
    * lower bound holding rank ⌈qNum·N∕qDen⌉ (exact integer ceil). Two
    * group-keyed passes over the SKETCH rows (≤ 488 per group), never
    * the corpus. */
  def logQuantilesFromHist(hist: DataFrame, groupCol: String,
                           quantiles: Seq[(String, Long, Long)]): DataFrame = {
    require(quantiles.nonEmpty &&
      quantiles.forall { case (_, n, d) => n > 0 && n <= d },
      s"quantiles must be in (0, 1]: got $quantiles")
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy(groupCol).orderBy("lb")))
      .withColumn("total", sum("cnt").over(Window.partitionBy(groupCol)))
    cum.groupBy(groupCol).agg(
      quantiles.head match { case (name, qn, qd) =>
        min(when(col("cum") * qd >= col("total") * qn, col("lb"))).as(name)
      },
      quantiles.tail.map { case (name, qn, qd) =>
        min(when(col("cum") * qd >= col("total") * qn, col("lb"))).as(name)
      }: _*)
  }

  /** One-shot face: build the histogram and query it. */
  def logQuantiles(df: DataFrame, groupCol: String, value: Column,
                   quantiles: Seq[(String, Long, Long)]): DataFrame =
    logQuantilesFromHist(logHistogram(df, groupCol, value), groupCol, quantiles)
}

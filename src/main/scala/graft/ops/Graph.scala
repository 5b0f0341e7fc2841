package graft.ops

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation — the value-propagation complement of
  * `Dedup.componentsWithRounds` (label propagation): PageRank in EXACT
  * fixed-point integer arithmetic.
  *
  * Why integer: floating-point PR depends on summation order, which
  * depends on partitioning — it could never pass the repo's
  * DeterminismGate (bit-identity across local[4]/local[16]) or a DuckDB
  * hash-compare. Here every quantity is a BIGINT in units of
  * 1/`scale`: per-node mass starts at `scale div N` (sum-normalized, so
  * values are bounded by `scale` at ANY graph size — no overflow at
  * 10⁹ nodes where a per-node-scaled scheme wraps), contributions are
  * `pr div outdeg`, damping is `(dampNum · Σ) div dampDen`. Floor
  * division loses ≤ 1 unit per op — deterministic, identical on every
  * partitioning and replayable verbatim in DuckDB (`//`).
  *
  * Plan shape per iteration: one broadcast-or-shuffle join of the
  * (node, pr, outdeg) frame with the edge list on src, one partial+final
  * aggregation on dst, one left join back to the node set — exchanges
  * carry (long, long) only. Lineage is CUT every iteration (via
  * [[Lineage.cut]] — executor-local by default, reliable checkpoint-dir
  * backed under `spark.graft.checkpoint.reliable`, the
  * componentsWithRounds discipline) so k iterations cost k bounded
  * jobs, not a 2^k plan.
  *
  * Semantics: nodes = distinct edge endpoints; pass a symmetrized edge
  * list for undirected graphs. Dangling mass (nodes with no out-edges)
  * is DROPPED by default — totals shrink slightly, never grow,
  * preserving the overflow bound. `redistributeDangling = true` selects
  * the standard treatment instead: each iteration the dangling nodes'
  * total mass D is measured (one 1-row driver aggregate over the
  * semi-joined pr frame) and every node's incoming sum gets `D div N`
  * added before damping — still exact integers, still ≤ `scale` total
  * (the two floor divisions lose ≤ N + 1 units per iteration), and the
  * chain replays verbatim in DuckDB.
  *
  * `tol > 0` adds a convergence stop: after each iteration the total
  * L1 delta `Σ|pr − pr_prev|` (exact integers, one extra id-keyed join
  * per iteration over the already-cut frames) is compared against it,
  * and iteration ends early once `delta < tol` — so the iteration count
  * is a safety bound, not a blind knob. Early stop makes the ROUND
  * COUNT data-dependent, which a fixed-depth SQL oracle cannot replay —
  * oracle-checked queries pass `tol = 0` (default: never stop early)
  * and unit tests pin the stop against closed-form fixed points. */
object Graph {

  /** Per-node triangle counts over an UNDIRECTED graph (pass edges in
    * either or both directions; they are canonicalized to `lo < hi`).
    * Exact: triangles are enumerated as `(a<b) ⋈ (b<c) ⋈ (a<c)` — the
    * standard orientation trick, each triangle materializing exactly
    * once — then each corner credits its node. Shuffle joins on node
    * ids; exchanges carry longs only.
    *
    * Orientation is by (degree, id) RANK, not raw id — the compact-
    * forward discipline: every edge points from its lower-rank to its
    * higher-rank endpoint and wedges enumerate at the triangle's
    * LOWEST-rank corner, so the per-node fan-out is C(out-deg, 2) with
    * out-degrees bounded ~O(√m) on any graph. Raw-id orientation pays
    * Σ deg²∕4 at hub nodes — the difference between a bounded wedge
    * join and a quadratic one on a skewed 100 TB graph. The per-node
    * counts are orientation-invariant, so an oracle may replay the
    * simpler id-ordered triple join verbatim.
    *
    * Returns (node, triangles) for every distinct endpoint, zeros
    * included. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
      .filter(col("s") =!= col("d"))
    val e = Lineage.cut(raw.select(least(col("s"), col("d")).as("x"),
      greatest(col("s"), col("d")).as("y")).distinct())
    val nodes = e.select(col("x").as("node"))
      .unionAll(e.select(col("y").as("node"))).distinct()
    val deg = e.select(col("x").as("node"))
      .unionAll(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnsRenamed(Map("node" -> "x", "deg" -> "degx")), "x")
      .join(deg.withColumnsRenamed(Map("node" -> "y", "deg" -> "degy")), "y")
    val fwd = struct(col("degx"), col("x")) < struct(col("degy"), col("y"))
    val o = Lineage.cut(withDeg.select(
      when(fwd, col("x")).otherwise(col("y")).as("a"),
      when(fwd, col("y")).otherwise(col("x")).as("b"),
      when(fwd, col("degy")).otherwise(col("degx")).as("rb")))
    // wedges at the lowest-rank corner a: rank-ordered out-neighbour
    // pairs (b, c); the triangle closes iff the oriented edge (b, c)
    // exists (it is oriented b→c because rank(b) < rank(c))
    val e1 = o.select(col("a"), col("b"), col("rb"))
    val e2 = o.select(col("a"), col("b").as("c"), col("rb").as("rc"))
    val close = o.select(col("a").as("b"), col("b").as("c"))
    val tris = e1.join(e2, "a")
      .filter(struct(col("rb"), col("b")) < struct(col("rc"), col("c")))
      .join(close, Seq("b", "c"))
    val corners = tris.select(col("a").as("node"))
      .unionAll(tris.select(col("b").as("node")))
      .unionAll(tris.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    nodes.join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Exact integer PageRank. Returns (node, pr) for every distinct
    * endpoint of `edges`, pr in units of 1/`scale` of the total mass.
    * See the object doc for `redistributeDangling` and `tol`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int,
               scale: Long = 1000000000000000L,
               dampNum: Long = 85, dampDen: Long = 100,
               redistributeDangling: Boolean = false,
               tol: Long = 0L,
               assumeDistinctEdges: Boolean = false): DataFrame =
    pageRankWithRounds(edges, srcCol, dstCol, iterations, scale,
      dampNum, dampDen, redistributeDangling, tol, assumeDistinctEdges)._1

  /** [[pageRank]] plus the number of iterations actually run — the
    * observable behind the convergence stop (the componentsWithRounds
    * pattern). */
  def pageRankWithRounds(edges: DataFrame, srcCol: String, dstCol: String,
                         iterations: Int,
                         scale: Long = 1000000000000000L,
                         dampNum: Long = 85, dampDen: Long = 100,
                         redistributeDangling: Boolean = false,
                         tol: Long = 0L,
                         assumeDistinctEdges: Boolean = false): (DataFrame, Int) = {
    require(iterations >= 0, s"iterations must be >= 0 (got $iterations)")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, scale > 0")
    require(tol >= 0, s"tol must be >= 0 (got $tol)")
    val spark = edges.sparkSession
    // snapshot the reliable-checkpoint flag ONCE for the whole loop
    // (ADVICE r13): a mid-loop conf flip must not mix cut mechanisms
    // within one invocation — recoverability is all-or-nothing per job
    val rel = Lineage.reliable(spark)
    val eRaw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // assumeDistinctEdges skips the full-edge de-dup exchange when the
    // caller provably passes a distinct edge list (q125/q132 both
    // build one); semantics are unchanged for default callers
    val e = Lineage.cut(if (assumeDistinctEdges) eRaw else eRaw.distinct(), rel)
    val m = e.count()
    // r17-opt (guide §2.4), SCALE-ADAPTIVE loop layout. Two regimes,
    // bit-identical results (same integer arithmetic; GraphSpec + the
    // q125/q132 oracles pin it):
    //
    //  - PARTITIONED (m >= spark.graft.pagerank.partitionedMinEdges,
    //    default 1M): the loop-invariant frames — per-src adjacency
    //    with out-degree attached, and the node set — are partitioned/
    //    sorted by their join key ONCE and cut; every iteration's joins
    //    reuse that layout, so the only per-round exchange is the
    //    partially-aggregated (dst, Σ contribution) frame (longs,
    //    node-count-bounded). The naive shape re-shuffles the FULL edge
    //    list by src every iteration — measured 133.7 MB of q125's
    //    134 MB bench shuffle-read; the probe (tools/PageRankProbe)
    //    shows bytes now grow ~0.03 MB/round instead of an edge-list
    //    per round. AQE is snapshotted OFF for this regime: an eager
    //    localCheckpoint under AQE reports UnknownPartitioning (the
    //    adaptive plan cannot promise a layout at plan time — measured
    //    with tools/PartitionProbe), which would silently re-shuffle
    //    every reuse; the loop's plans are fixed-shape anyway. Restored
    //    in the finally.
    //
    //  - SMALL (below the threshold): the simple shape under whatever
    //    AQE the session has — for small graphs AQE's runtime
    //    broadcasts and partition coalescing beat the reorganization
    //    (measured on q132's ~0.5M-edge graph: forcing the partitioned
    //    regime cost +1.5 s and +12 MB over the simple shape).
    val partitioned = m >= Try(spark.conf.get(
        "spark.graft.pagerank.partitionedMinEdges", "1000000").toLong)
      .getOrElse(1000000L)
    // The partitioned regime flips the SESSION's AQE off for the loop
    // (layout reuse needs non-adaptive plans — see above). That flip is
    // session-global state (ADVICE r17): the JVM-wide lock below makes
    // overlapping pageRank calls serialize instead of interleaving
    // set/restore (two interleaved calls could otherwise write back the
    // other's 'false' and leave AQE off for the rest of the session).
    // CONSTRAINT, documented: other queries submitted CONCURRENTLY on
    // the same session while a big pageRank runs plan without AQE —
    // callers that need concurrent submission should run pageRank on a
    // dedicated session (SparkSession.newSession inherits the context).
    // Scoping the flip to a child session here was evaluated and
    // rejected: the input frames are bound to the caller's session, and
    // re-binding the edge list costs a full Row-deserialization pass
    // over it (or a private-API InternalRow bridge) — an O(edges) tax
    // on every call to protect a caller pattern the engine's own
    // pipelines never use (Pipeline/CurateIncremental submit
    // sequentially).
    val aqeKey = "spark.sql.adaptive.enabled"
    if (!partitioned) return loopBody(spark, e, m, iterations, scale,
      dampNum, dampDen, redistributeDangling, tol, rel, partitioned = false)
    Graph.AqeFlipLock.synchronized {
      val aqePrev = spark.conf.get(aqeKey, "true")
      spark.conf.set(aqeKey, "false")
      try loopBody(spark, e, m, iterations, scale, dampNum, dampDen,
        redistributeDangling, tol, rel, partitioned = true)
      finally spark.conf.set(aqeKey, aqePrev)
    }
  }

  /** JVM-global monitor serializing the partitioned regime's AQE flip —
    * overlapping calls must not interleave set/restore. */
  private object AqeFlipLock

  private def loopBody(spark: SparkSession, e: DataFrame, m: Long,
                       iterations: Int, scale: Long,
                       dampNum: Long, dampDen: Long,
                       redistributeDangling: Boolean, tol: Long,
                       rel: Boolean, partitioned: Boolean): (DataFrame, Int) = {
    {
      def keySorted(df: DataFrame, k: String): DataFrame =
        if (partitioned) df.sortWithinPartitions(k) else df
      val nodes = Lineage.cut(keySorted(e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node")))
        .distinct(), "node"), rel)
      val n = nodes.count()
      if (n == 0) return (nodes.withColumn("pr", lit(0L)), 0)
      val init = scale / n
      val base = (init * (dampDen - dampNum)) / dampDen
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      // partitioned regime: adjacency with degree attached,
      // hash(src)-partitioned + sorted, cut once. Small regime: the
      // degree frame alone, cut (the loop joins e per round).
      val eDeg =
        if (partitioned)
          Lineage.cut(e.join(outdeg, "src")
            .select(col("src"), col("dst"), col("deg"))
            .sortWithinPartitions("src"), rel)
        else Lineage.cut(outdeg, rel)
      // the dangling node SET is static (no out-edges ever); only its mass
      // changes per iteration — compute the set once, cut it, and each
      // round pays one bounded semi-join + 1-row aggregate. Anti-join
      // against the DEDUPED src set, source-count-bounded.
      val srcSet =
        if (partitioned) outdeg.select(col("src").as("node"))
        else eDeg.select(col("src").as("node"))
      val dangling =
        if (redistributeDangling)
          Some(Lineage.cut(keySorted(
            nodes.join(srcSet, Seq("node"), "left_anti"), "node"), rel))
        else None
      // per-round contribution sums keyed (node = dst). Partitioned:
      // pr rides in hash(node)-partitioned; the rename keeps the
      // attribute, so the join against the src-partitioned adjacency
      // plans no exchange on either side. Small: the classic
      // pr ⋈ outdeg ⋈ e chain (same values).
      def mkSums(pr: DataFrame): DataFrame =
        (if (partitioned)
          eDeg.join(pr.withColumnRenamed("node", "src"), "src")
            // integral div, NOT `/`: long / long is a DOUBLE divide in
            // Spark, which rounds and would break both exactness and
            // the oracle
            .select(col("dst"), expr("pr div deg").as("c"))
        else
          pr.join(eDeg, pr("node") === eDeg("src"))
            .select(col("src"), expr("pr div deg").as("c"))
            .join(e, "src")
            .select(col("dst"), col("c")))
          .groupBy(col("dst").as("node"))
          .agg(sum("c").as("s"))
      var pr = nodes.withColumn("pr", lit(init))
      var iter = 0
      var converged = false
      while (iter < iterations && !converged) {
        val share = dangling.map { d =>
          val mass = pr.join(d, Seq("node"), "left_semi")
            .agg(coalesce(sum("pr"), lit(0L))).head.getLong(0)
          mass / n // floor: both non-negative
        }.getOrElse(0L)
        val sums = mkSums(pr)
        val next = Lineage.cut(keySorted(nodes.join(sums, Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr(s"($dampNum * (coalesce(s, 0L) + $share)) div $dampDen"))
              .as("pr")), "node"), rel)
        if (tol > 0) {
          // exact-integer L1 delta over the two cut frames (both sides are
          // materialized blocks, the join is node-keyed longs only)
          val delta = next.withColumnRenamed("pr", "pn")
            .join(pr.withColumnRenamed("pr", "po"), "node")
            .agg(coalesce(sum(abs(col("pn") - col("po"))), lit(0L)))
            .head.getLong(0)
          converged = delta < tol
        }
        pr = next
        iter += 1
      }
      (pr, iter)
    }
  }
}

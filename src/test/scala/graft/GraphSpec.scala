package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000000L

  test("two-node symmetric graph: exact hand-computed fixed point") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val init = Scale / 2
    val base = (init * 15) / 100
    // outdeg 1 each: every iteration pr = base + (85 * prev) / 100
    var expected = init
    for (_ <- 0 until 3) expected = base + (85L * expected) / 100
    val got = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> expected, 2L -> expected),
      s"symmetric pair must hold the hand-computed value (got $got)")
  }

  test("convergence stop: the 2-cycle is a fixed point, one round suffices") {
    // 1↔2 at a small scale: init = 500, base = 75, every iteration maps
    // 500 → 75 + (85·500)/100 = 500 exactly — the L1 delta is 0 after
    // round 1, so tol = 1 must stop there no matter the bound
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (pr, rounds) = Graph.pageRankWithRounds(edges, "src", "dst",
      iterations = 50, scale = 1000L, tol = 1L)
    assert(rounds == 1, s"fixed point must stop after one round (ran $rounds)")
    assert(pr.as[(Long, Long)].collect().toMap == Map(1L -> 500L, 2L -> 500L))
    // and the stop is genuinely data-driven: a graph NOT at its fixed
    // point runs more rounds under the same tol
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    // tol sized to the damping contraction (delta ~ 0.85^k · scale):
    // 1% of the mass is reached after ~20 rounds, safely inside the bound
    val (_, r2) = Graph.pageRankWithRounds(chain, "src", "dst",
      iterations = 50, scale = 1000000L, tol = 10000L)
    assert(r2 > 1 && r2 < 50, s"asymmetric graph must iterate to converge (ran $r2)")
  }

  test("dangling redistribution: hand-computed 2-node chain, mass conserved") {
    // 1 → 2 only; node 2 is dangling. scale 1000, N = 2: init 500, base 75.
    // round 1: D = 500, share = 250;
    //   pr(1) = 75 + 85·250 div 100        = 75 + 212 = 287
    //   pr(2) = 75 + 85·(500+250) div 100  = 75 + 637 = 712
    // round 2: D = 712, share = 356;
    //   pr(1) = 75 + 85·356 div 100        = 75 + 302 = 377
    //   pr(2) = 75 + 85·(287+356) div 100  = 75 + 546 = 621
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    def run(iters: Int) = Graph.pageRank(edges, "src", "dst", iters,
      scale = 1000L, redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(run(1) == Map(1L -> 287L, 2L -> 712L))
    assert(run(2) == Map(1L -> 377L, 2L -> 621L))
    // without redistribution the dangling mass vanishes instead
    val dropped = Graph.pageRank(edges, "src", "dst", 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(dropped == Map(1L -> 75L, 2L -> 500L))
    // redistribution keeps totals ≤ scale (floors only lose mass)
    assert(run(2).values.sum <= 1000L)
  }

  test("star graph: the hub out-ranks every leaf; totals never grow") {
    val leaves = (2L to 9L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L))).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(leaves.forall(l => pr(1L) > pr(l)), s"hub must dominate (got $pr)")
    assert(pr.values.sum <= Scale, "floor arithmetic must never create mass")
    assert(leaves.map(pr).toSet.size == 1, "leaves are symmetric")
  }

  test("result is partition-count independent (exact integer arithmetic)") {
    val edges = (0L until 400L).map(i => (i % 37, (i * 7) % 37))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val sym = edges.unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    def run(parts: Int) =
      Graph.pageRank(sym.repartition(parts), "src", "dst", iterations = 4)
        .as[(Long, Long)].collect().sorted.toSeq
    assert(run(1) == run(13), "pagerank must be bit-identical on any partitioning")
  }

  test("partitioned regime == small regime, bit for bit (incl. dangling + distinct-skip)") {
    // r17-opt: above spark.graft.pagerank.partitionedMinEdges the loop
    // pre-partitions its invariant frames under AQE-off; results must be
    // BIT-IDENTICAL to the simple shape on the same graph. Force each
    // regime via the conf and compare, on a graph with dangling nodes
    // and duplicate edges (so distinct vs assumeDistinctEdges is
    // exercised too).
    val edges = ((0L until 600L).map(i => (i % 41, (i * 13) % 53)) ++
      (0L until 600L).map(i => (i % 41, (i * 13) % 53)))  // dups
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val key = "spark.graft.pagerank.partitionedMinEdges"
    def run(threshold: String, dang: Boolean) = {
      spark.conf.set(key, threshold)
      try Graph.pageRank(edges, "src", "dst", iterations = 4,
          redistributeDangling = dang)
        .as[(Long, Long)].collect().sorted.toSeq
      finally spark.conf.unset(key)
    }
    for (dang <- Seq(false, true)) {
      val small = run("1000000000", dang)
      val part = run("1", dang)
      assert(small == part,
        s"regimes diverge (dangling=$dang):\nsmall=$small\npart =$part")
    }
    // distinct-skip face: the same distinct edge list through both
    // assumeDistinctEdges settings, partitioned regime
    val distinctE = edges.distinct()
    spark.conf.set(key, "1")
    try {
      val a = Graph.pageRank(distinctE, "src", "dst", 4)
        .as[(Long, Long)].collect().sorted.toSeq
      val b = Graph.pageRank(distinctE, "src", "dst", 4,
          assumeDistinctEdges = true)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(a == b, "assumeDistinctEdges must not change results")
    } finally spark.conf.unset(key)
    // and AQE must come back exactly as it was
    assert(spark.conf.get("spark.sql.adaptive.enabled") != null)
  }

  test("overlapping partitioned pageRanks serialize the AQE flip and restore it (ADVICE r17)") {
    // two concurrent partitioned-regime calls must not interleave
    // set/restore (an interleaving could write back the other call's
    // 'false' and leave session AQE off permanently); the JVM-global
    // lock serializes the flip, results stay correct, and the session
    // conf comes back exactly as it was
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val edges = (0L until 400L).map(i => (i % 37, (i * 11) % 43))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val expected = Graph.pageRank(edges, "src", "dst", 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.graft.pagerank.partitionedMinEdges", "1")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val runs = Future.sequence((1 to 2).map(_ => Future(
        Graph.pageRank(edges, "src", "dst", 3)
          .as[(Long, Long)].collect().sorted.toSeq)))
      Await.result(runs, Duration.Inf).foreach(r => assert(r == expected))
    } finally {
      pool.shutdown()
      spark.conf.unset("spark.graft.pagerank.partitionedMinEdges")
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore,
      "AQE not restored after overlapping partitioned pageRank calls")
  }

  test("triangles: K4 has 3 per node; a path has none; direction/dups collapse") {
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b))
      .toDF("src", "dst") // both directions + no dedup: must canonicalize
    val got = Graph.triangles(k4, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Graph.triangles(path, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(p == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      "a path has no triangles but every node must still report 0")
  }

  test("triangles: two glued triangles credit the shared edge's nodes twice") {
    // 1-2-3 and 2-3-4 share edge (2,3)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangles(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("node with in-edges only still accumulates; source-only node gets base") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // directed
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 1)
      .as[(Long, Long)].collect().toMap
    val init = Scale / 3
    val base = (init * 15) / 100
    assert(pr(2L) == base + (85L * (init / 1 + init / 1)) / 100)
    // 1 and 3 have no in-edges: base only (their own mass dangles out)
    assert(pr(1L) == base && pr(3L) == base)
  }
}

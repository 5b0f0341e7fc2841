package graft

import org.apache.spark.sql.functions._

/** Plan-SHAPE regression guards: the optimized physical shapes PERF.md
  * claims (scan pushdown, broadcast joins, window-group-limit pruning,
  * partial aggregation, no unbounded cartesian anywhere) asserted against
  * the actual planned query, so a refactor that silently loses one of
  * them fails CI instead of surfacing as a 100 TB surprise. Planning only
  * — `queryExecution.executedPlan` never runs the job (queries whose
  * CONSTRUCTION runs bounded actions — dim probes, curation counts — stay
  * cheap at sf0.001). */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    graft.plans.GraftExtensions.install(spark)
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("parquet scans push filters and prune columns (loader contract)") {
    val df = graft.sources.Testdata.table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,"),
      s"filter not pushed to parquet:\n$scan")
    // projection pruned to the two selected columns at the scan
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projection:\n$scan")
  }

  test("top-k plans prune: global TakeOrderedAndProject, per-group WindowGroupLimit") {
    // global top-k never sorts the full table
    assert(plan("q02_topk_orders").contains("TakeOrderedAndProject"),
      "q02 lost its TakeOrderedAndProject (full sort planned instead)")
    // per-group rank(<=k) prunes inside each partition before the window
    for (q <- Seq("q09_window_topn", "q58_source_cap"))
      assert(plan(q).contains("WindowGroupLimit"),
        s"$q lost its WindowGroupLimit pruning")
  }

  test("dimension enrich joins broadcast the small side") {
    for (q <- Seq("q05_left_join_missing", "q06_enriched_flags"))
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q does not broadcast its dimension side")
  }

  test("aggregates are partial+final (map-side combine before the exchange)") {
    // q65's grouping sets must also pre-combine map-side after the Expand;
    // q136's histogram build is the quantile sketch's merge property —
    // per-partition bucket counts must combine before the exchange
    for (q <- Seq("q07_kpi_daily", "q01_agg_pricing", "q65_corpus_report",
        "q136_quantile_sketch"))
      assert(plan(q).contains("partial_"),
        s"$q lost map-side partial aggregation")
  }

  test("similarity candidate exchanges are id-only (no vector payloads ride the shuffles)") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    // the r5 invariant, now enforced: candidate generation exchanges bare
    // ids/buckets; a vector moves only through the single id-keyed confirm
    // join (one array column per exchange, never a (va, vb) pair) and the
    // pair-dedup exchange — hash-partitioned on BOTH pair ids — carries no
    // array at all. A refactor back to the r4 carry-vectors shape (2×0.5 KiB
    // arrays per candidate row through distinct(), measured 2× slower at 30×
    // in PERF.md §scale-stress) fails here instead of in a 100 TB run.
    graft.plans.GraftExtensions.install(spark)
    // at sf0.001 every input is one partition and every join broadcasts —
    // no shuffle plans at all, and the invariant under test is vacuous.
    // Plan the AT-SCALE shape instead: no auto-broadcast, split the scans
    // (planning only; nothing executes at these settings)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    // exchanges are inserted by EnsureRequirements, which only runs in the
    // prepared (executed) plan — AQE wraps that in an opaque adaptive node,
    // so plan without it for the inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pairIdSets = Seq(Set("id_a", "id_b"), Set("q_id", "c_id"))
      for (q <- Seq("q41_ann_bucketed", "q42_ivf_ann", "q43_embed_neardup",
                    "q52_pq_adc", "q53_ivf_pq")) {
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.nonEmpty, s"$q planned no shuffle exchange at all?")
        shuffles.foreach { e =>
          val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
          assert(arrays.size <= 1,
            s"$q exchange carries ${arrays.map(_.name).mkString(",")} — vectors ride a candidate shuffle")
          val partCols = e.outputPartitioning match {
            case h: HashPartitioning =>
              h.expressions.flatMap(_.references.map(_.name)).toSet
            case _ => Set.empty[String]
          }
          if (pairIdSets.exists(_.subsetOf(partCols)))
            assert(arrays.isEmpty,
              s"$q pair-dedup exchange on $partCols carries ${arrays.map(_.name).mkString(",")}")
        }
      }
      // positive control: the r4 carry-vectors shape IS caught by this
      // detector — quantized vectors riding the pair distinct()
      import spark.implicits._
      val base = Seq((1L, Seq(1L, 2L)), (2L, Seq(1L, 2L))).toDF("id", "v")
        .select(col("id"), col("v"), pmod(col("id"), lit(2)).as("bucket"))
      val carry = base.as("a").join(base.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.v").as("va"), col("b.v").as("vb"))
        .distinct()
      val caught = carry.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }
        .exists(_.output.count(_.dataType.isInstanceOf[ArrayType]) >= 2)
      assert(caught, "detector failed to flag the carry-vectors shape")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("semantic decontamination broadcasts the benchmark side; corpus vectors never shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    graft.plans.GraftExtensions.install(spark)
    // same at-scale planning settings as the id-only test: without them
    // everything fits one partition and the invariant is vacuous. The
    // benchmark side must broadcast BY HINT (threshold −1 disables the
    // automatic pick), and no exchange may carry a vector payload — the
    // aggregate exchange moves (id, partial count/max) rows only.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q74_semantic_decon")(spark, sf)
        .queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastNestedLoopJoin"),
        s"q74 lost its broadcast cross join:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "q74 planned no aggregate exchange at all?")
      shuffles.foreach { e =>
        assert(!e.output.exists(_.dataType.isInstanceOf[ArrayType]),
          s"q74 exchange carries a vector payload: ${e.output.map(_.name).mkString(",")}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** A state persisted by saveState (fingerprints bucketed by content_key,
    * band keys by (band, key), SRP sketches by (seed, bucket)) plus a
    * day-1 delta, wired into the three daily probes — the fixture behind
    * both the AQE-off (planned shape) and AQE-on (executed shape) tests.
    * Returns the state dir (for scan attribution) and the named probes. */
  private def probeFixture(): (String, Seq[(String, org.apache.spark.sql.DataFrame)]) = {
    import graft.ops.{Curate, CurateIncremental, Dedup}
    import spark.implicits._
    val docs = (1L to 30L)
      .map(i => (i, (0 until 12).map(j => s"doc$i tok$j word${j % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    val embs = (1L to 30L)
      .map(i => (i, (0 until 16).map(j => (((i * 31 + j * 17) % 19) - 9).toDouble)))
      .toDF("doc_id", "v")
    val ecfg = CurateIncremental.EmbedConfig(dim = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-planshape-").toString
    // winnowFilter on: the state then carries the winnow-fingerprint
    // table, so the span probe below has a bucketed state side to hit
    val wnCfg = Curate.Config(winnowFilter = Some(Curate.Winnow()))
    CurateIncremental.saveState(
      CurateIncremental.withEmbeddings(
        CurateIncremental.buildState(docs, "doc_id", "text", wnCfg),
        embs, "doc_id", "v", ecfg),
      root, buckets = 4)
    val st = CurateIncremental.loadState(spark, root)

    // the delta mixes fresh docs with re-crawls of state docs 1..6 under
    // new ids: every probe then produces BOTH matches and non-matches, so
    // AQE's empty-relation propagation cannot collapse the join away (the
    // AQE-on test below inspects the executed plan, which only retains
    // stages that did real work)
    val delta = ((100L to 120L)
      .map(i => (i, (0 until 12).map(j => s"new$i tok$j word${j % 5}").mkString(" "))) ++
      (1L to 6L)
        .map(i => (200L + i, (0 until 12).map(j => s"doc$i tok$j word${j % 5}").mkString(" "))))
      .toDF("doc_id", "text")
    val deltaEmbs = ((100L to 120L)
      .map(i => (i, (0 until 16).map(j => (((i * 29 + j * 13) % 19) - 9).toDouble))) ++
      (1L to 6L)
        .map(i => (200L + i, (0 until 16).map(j => (((i * 31 + j * 17) % 19) - 9).toDouble))))
      .toDF("doc_id", "v")
    (s"$root/curate_state", Seq(
      "fingerprintProbe" ->
        CurateIncremental.fingerprintProbe(delta, "doc_id", "text", st),
      // delta band keys use the SAME LSH params buildState's default
      // Curate.Config used (shingleN=3) — mismatched params join to empty,
      // and AQE's empty-relation propagation would erase the join under test
      "bandKeyProbe" -> CurateIncremental.bandKeyProbe(
        Dedup.lshBandKeys(delta, "doc_id", "text", 3, 12, 3, 4), st),
      "embeddingProbe" -> CurateIncremental.embeddingProbe(
        CurateIncremental.srpSketchTable(deltaEmbs, "doc_id", "v", ecfg), st),
      // both state references (the per-fp df aggregate and the pair join)
      // must ride the table's fp bucketing — no state-side exchange
      "winnowDropIds" -> CurateIncremental.winnowDropIds(
        delta, "doc_id", "text", st, Curate.Winnow()),
      // r14: the exact-join entity probe — the tok-bucketed prefix index
      // and the id-bucketed token table are both corpus-scale; only the
      // delta side may shuffle into them
      "exactJoinProbe" -> {
        val sh2: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          t => split(t, " ")
        graft.ops.ExactJoinState.build(docs, "doc_id", sh2(col("text")),
          1L, 2L, s"$root/curate_state", buckets = 4)
        graft.ops.ExactJoinState.probe(delta, "doc_id", sh2(col("text")),
          s"$root/curate_state")
      }))
  }

  test("r10 ops: shard exchange is reused, mixtures broadcast, no text rides a shuffle") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    graft.plans.GraftExtensions.install(spark)
    // at-scale planning settings (see the id-only test above): no
    // auto-broadcast — surviving broadcasts are BY HINT — split scans,
    // AQE off so EnsureRequirements' exchanges are inspectable
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def hashShuffles(name: String) = {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
      (plan, plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning]))
    }
    try {
      // q76: ONE hash exchange total — the shard shuffle. The per-shard
      // window and the groupBy(shard) aggregate must share it (the window's
      // output partitioning satisfies the aggregate's requirement); a
      // second hash exchange means the terminal write started paying the
      // corpus twice.
      val (p76, s76) = hashShuffles("q76_shuffle_shard")
      assert(s76.size == 1, s"q76 planned ${s76.size} hash exchanges, want 1:\n$p76")
      // q77: the per-source cut reaches the corpus through a BY-HINT
      // broadcast (threshold is -1 here), so the corpus-scale keep filter
      // is map-side; only dimension-sized aggregates shuffle.
      val (p77, _) = hashShuffles("q77_temperature_mix")
      assert(p77.toString.contains("BroadcastHashJoin"),
        s"q77 lost its broadcast cut join:\n$p77")
      // q78: the bounded query side broadcasts (nested-loop by hint);
      // corpus vectors must not ride a hash exchange — only the per-q_id
      // ranking window shuffles candidate rows.
      val (p78, s78) = hashShuffles("q78_hard_negatives")
      assert(p78.toString.contains("BroadcastNestedLoopJoin"),
        s"q78 lost its broadcast query side:\n$p78")
      assert(s78.forall(e => !e.output.exists(_.name == "cv")),
        s"q78 shuffles corpus vectors:\n$p78")
      // winnowedPairs (q79's operator, planned on the raw corpus — the
      // q79 QUERY also shuffles its planted-frankendoc construction,
      // which is fixture, not operator): fingerprints and ids only — no
      // exchange output may carry the text column or a token array.
      val wp = graft.ops.Dedup.winnowedPairs(
        graft.sources.Testdata.table(spark, sf, "documents")
          .select("doc_id", "text"),
        "doc_id", "text", k = 5, w = 4, minShared = 2, maxDf = 10)
      val p79 = wp.queryExecution.executedPlan
      val s79 = p79.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
      assert(s79.nonEmpty, s"winnowedPairs planned no hash exchange at all?\n$p79")
      s79.foreach { e =>
        val bad = e.output.filter(a => a.name == "text" ||
          a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        assert(bad.isEmpty,
          s"winnowedPairs exchange carries ${bad.map(_.name).mkString(",")}:\n$p79")
        e.output.filter(_.dataType == StringType).foreach(a =>
          assert(a.name == "fp" || a.name.startsWith("__"),
            s"winnowedPairs exchange carries string column ${a.name} (text leak?):\n$p79"))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("incremental-curation probes plan ZERO exchange on the bucketed state side") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // a state persisted by saveState: fingerprints bucketed by content_key,
    // band keys by (band, key) — the corpus-scale tables a daily delta
    // probes. At 100 TB the probe must NOT re-shuffle them: the bucket
    // hash IS the join distribution, so only the (small) delta shuffles.
    val (stateDir, probes) = probeFixture()

    // plan the at-scale shape: no auto-broadcast (a 100 TB delta side is
    // not broadcastable), AQE off so EnsureRequirements' exchanges are
    // inspectable (see the similarity test above)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // an exchange "re-shuffles the state" only if the state scan feeds
      // it WITHOUT an intervening join: post-join exchanges (candidate-
      // pair distinct) carry pair-sized data, not the corpus-scale table
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def isStateScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(stateDir))
        case _ => false
      }
      def stateFeedsDirectly(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isStateScan(f)
        case _: BaseJoinExec => false
        case other => other.children.exists(stateFeedsDirectly)
      }
      for ((name, probe) <- probes) {
        val plan = probe.queryExecution.executedPlan
        val stateScans = plan.collect {
          case f: FileSourceScanExec if isStateScan(f) => f
        }
        assert(stateScans.nonEmpty && stateScans.forall(_.relation.bucketSpec.isDefined),
          s"$name does not scan the state through its bucketed table:\n$plan")
        val stateShuffles = plan.collect { case e: ShuffleExchangeExec => e }
          .filter(e => e.children.exists(stateFeedsDirectly))
        assert(stateShuffles.isEmpty,
          s"$name re-shuffles the corpus-scale state side:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed probe shape survives AQE ON: executed adaptive plan keeps zero state-side exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // the AQE-off test above inspects EnsureRequirements' static output;
    // production runs AQE ON, where the plan is re-planned stage by stage
    // at runtime. Bucketed scans carry their distribution into the adaptive
    // re-plan too — assert that by EXECUTING the probes (AQE finalizes its
    // stages only on run) and walking the final adaptive plan, descending
    // through query-stage and reused-exchange wrappers that hide exchanges
    // from a naive collect.
    val (stateDir, probes) = probeFixture()
    def isStateScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(stateDir))
      case _ => false
    }
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: kids.flatMap(expand)
    }
    def stateFeedsDirectly(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => isStateScan(f)
      case _: BaseJoinExec => false
      case a: AdaptiveSparkPlanExec => stateFeedsDirectly(a.executedPlan)
      case q: QueryStageExec => stateFeedsDirectly(q.plan)
      case r: ReusedExchangeExec => stateFeedsDirectly(r.child)
      case other => other.children.exists(stateFeedsDirectly)
    }
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      for ((name, probe) <- probes) {
        probe.collect() // run it — only then is every adaptive stage final
        val plan = probe.queryExecution.executedPlan
        assert(plan.isInstanceOf[AdaptiveSparkPlanExec],
          s"$name did not plan adaptively with AQE on:\n$plan")
        val nodes = expand(plan)
        val stateScans = nodes.collect { case f: FileSourceScanExec if isStateScan(f) => f }
        assert(stateScans.nonEmpty && stateScans.forall(_.relation.bucketSpec.isDefined),
          s"$name lost its bucketed state scan under AQE:\n$plan")
        val bad = nodes.collect { case e: ShuffleExchangeExec => e }
          .filter(_.children.exists(stateFeedsDirectly))
        assert(bad.isEmpty,
          s"$name re-shuffles the corpus-scale state side under AQE:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("fuzzy-join probe: gram and confirm lanes plan zero state-side exchange; only the bounded short lane shuffles state") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-fzps-").toString
    val state = (1L to 40L).map(i => (i, f"Entity#$i%08d")).toDF("id", "s")
    graft.ops.FuzzyJoinState.build(state, "id", "s", maxDist = 1, q = 2,
      root, buckets = 4)
    val delta = (1L to 10L).map(i => (100L + i, f"Entity#$i%08dX"))
      .toDF("id", "s")
    val probe = graft.ops.FuzzyJoinState.probe(delta, "id", "s", root)
    def isStateScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(root))
      case _ => false
    }
    def stateFeedsDirectly(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => isStateScan(f)
      case _: BaseJoinExec => false
      case other => other.children.exists(stateFeedsDirectly)
    }
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = probe.queryExecution.executedPlan
      val stateScans = plan.collect {
        case f: FileSourceScanExec if isStateScan(f) => f
      }
      assert(stateScans.nonEmpty &&
        stateScans.forall(_.relation.bucketSpec.isDefined),
        s"fuzzy probe lost its bucketed state scans:\n$plan")
      // the gram-prefix join and the string confirm must ride the
      // bucket hashes; the ONLY state-fed exchanges allowed are the
      // salted length-window joins of the SHORT slice (strings of
      // ≤ shortLen + k chars — bounded by construction), recognizable
      // by the __salt key in their partitioning
      val bad = plan.collect { case e: ShuffleExchangeExec => e }
        .filter(_.children.exists(stateFeedsDirectly))
        .filterNot(_.outputPartitioning.toString.contains("__salt"))
      assert(bad.isEmpty,
        s"fuzzy probe re-shuffles the corpus-scale state outside the short lane:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("scd2 fold joins the current table on its bucket keys — zero state-side exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-scd2ps-").toString
    val day0 = (1L to 40L).map(k => (k, java.sql.Date.valueOf("2024-01-01"),
      s"attr${k % 3}")).toDF("k", "d", "attr")
    graft.ops.Scd2State.bootstrap(day0, Seq("k"), Seq("attr"), "d", root,
      buckets = 4)
    val delta = ((1L to 20L) ++ (50L to 60L))
      .map(k => (k, s"attr${(k + 1) % 3}")).toDF("k", "attr")
    val cur = graft.ops.Scd2State.genRows(spark, root)
    val (retired, nextCur) = graft.ops.Scd2State.foldFrames(
      cur, delta, Seq("k"), Seq("attr"), "2024-01-01", "2024-01-02")
    def isStateScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(root))
      case _ => false
    }
    def stateFeedsDirectly(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => isStateScan(f)
      case _: BaseJoinExec => false
      case other => other.children.exists(stateFeedsDirectly)
    }
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((name, frame) <- Seq("retired" -> retired, "nextCur" -> nextCur)) {
        val plan = frame.queryExecution.executedPlan
        val stateScans = plan.collect {
          case f: FileSourceScanExec if isStateScan(f) => f
        }
        assert(stateScans.nonEmpty &&
          stateScans.forall(_.relation.bucketSpec.isDefined),
          s"scd2 fold $name lost the bucketed current scan:\n$plan")
        val bad = plan.collect { case e: ShuffleExchangeExec => e }
          .filter(_.children.exists(stateFeedsDirectly))
        assert(bad.isEmpty,
          s"scd2 fold $name re-shuffles the corpus-scale current table:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("r15 scoring lanes: NB predict broadcasts the profile, DSIR scoring plans no per-doc join") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    graft.plans.GraftExtensions.install(spark)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q145 (nbPredictById): the (gram, label, count) profile reaches
      // the exploded gram rows through a BY-HINT broadcast (threshold
      // -1 here), and the dot products hash-shuffle (id, k longs) only —
      // no gram or text column rides a hash exchange
      val p145 = SparkEntry.queries("q145_langid_trained")(spark, sf)
        .queryExecution.executedPlan
      assert(p145.toString.contains("BroadcastHashJoin"),
        s"q145 lost the broadcast profile join:\n$p145")
      val textShuffles = p145.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
        .filter(_.child.output.exists(a =>
          a.name == "__nb_g" || a.name == "text"))
      assert(textShuffles.isEmpty,
        s"q145 shuffles gram/text columns:\n$p145")
      // q147 (dsirScores): profiles are literals — scoring plans NO
      // join at all; the only operators over the raw docs are scan,
      // project/filter and the output sort
      val p147 = SparkEntry.queries("q147_dsir_selection")(spark, sf)
        .queryExecution.executedPlan
      assert(!p147.toString.contains("Join"),
        s"q147 should score joinlessly (profiles are literals):\n$p147")
      // r16 (VERDICT r15 #1): the IN-RECIPE DSIR stage — both keep
      // rules, the exact code Curate stage 5¼ and curateDelta run —
      // plans ZERO exchange and zero join over the scored frame: the
      // persisted profile states collapse to bucket-space-bounded
      // literals at plan time, so only the recipe's own shuffles ever
      // touch the corpus (the "no state-side exchange" contract)
      locally {
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        import graft.ops.{Curate, Sampling}
        val docs = spark.read.parquet(s"$sf/documents.parquet")
          .select("doc_id", "text", "source")
        val isT = col("source").isin("src1", "src2")
        val t = Sampling.hashedNgramCounts(docs.filter(isT), "text")
        val r = Sampling.hashedNgramCounts(docs.filter(!isT), "text")
        for (resample <- Seq(false, true)) {
          val p = Curate.dsirSelect(docs, "doc_id", "text",
              Curate.Dsir(t, r, resample = resample))
            .queryExecution.executedPlan
          assert(!p.toString.contains("Join"),
            s"dsirSelect(resample=$resample) plans a join:\n$p")
          assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty,
            s"dsirSelect(resample=$resample) plans an exchange:\n$p")
        }
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("IVF centroid folds stay at the accepted 2x filter-copy (no 4x regression)") {
    // isnotnull pushdown copies the corpus-side cell-argmax expression
    // into the scan filter — accepted at 16 centroids (PERF.md r9 note:
    // cheap folds, and the alternative localCheckpoint costs a corpus-
    // wide id join). Nothing else pinned that acceptance: this counts
    // the higher-order `aggregate(` folds in the executed plan so a
    // refactor can't silently regress to the 4x shape q73 had pre-fix.
    // Budget: q42 = 16 query-side + 2x16 corpus-side + 2 rerank = 50;
    // q53 adds the 8-block x 8-code PQ assignment + 8 ADC folds = 121.
    def folds(q: String): Int = "aggregate\\(".r.findAllMatchIn(plan(q)).size
    val q42 = folds("q42_ivf_ann")
    assert(q42 <= 52 && q42 >= 30,
      s"q42 centroid-fold count moved: $q42 (accepted 2x shape plans 50)")
    val q53 = folds("q53_ivf_pq")
    assert(q53 <= 125 && q53 >= 70,
      s"q53 centroid-fold count moved: $q53 (accepted 2x shape plans 121)")
  }

  test("q81 salted join keys its exchanges on (k, salt) — the hot key spreads") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    graft.plans.GraftExtensions.install(spark)
    // salting earns its keep exactly when the dim is NOT broadcastable
    // (a broadcast join has no reducer skew to spread) — force the
    // shuffle join the operator exists for
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exec =
      try SparkEntry.queries("q81_salted_join")(spark, sf)
        .queryExecution.executedPlan
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    // at least one shuffle partitions on BOTH the join key and the salt:
    // the hot key's rows land on `buckets` reducers instead of one
    val spread = exec.collect { case e: ShuffleExchangeExec => e }.exists {
      _.outputPartitioning match {
        case h: HashPartitioning =>
          val names = h.expressions.flatMap(_.references.map(_.name))
          names.contains("k") && names.contains("__salt")
        case _ => false
      }
    }
    assert(spread,
      s"no exchange hashes on (k, __salt) — the salted join lost its spread:\n$exec")
  }

  test("r11 ops: epoch plan broadcasts, mixture/window exchanges never carry text") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, StringType}
    graft.plans.GraftExtensions.install(spark)
    // same at-scale planning settings as the r10 test: broadcasts only by
    // hint, split scans, AQE off so exchanges are inspectable
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def exec(name: String) =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    def hashShuffles(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    try {
      // q83: the per-source epoch plan reaches the corpus via BY-HINT
      // broadcast (threshold -1); the replication is map-side, so the
      // only corpus-scale hash exchange is the (source, epoch) aggregate
      // — pre-combined map-side, carrying no text.
      val p83 = exec("q83_epoch_mixture")
      assert(p83.toString.contains("BroadcastHashJoin"),
        s"q83 lost its broadcast epoch-plan join:\n$p83")
      assert(p83.toString.contains("partial_"),
        s"q83 lost map-side partial aggregation:\n$p83")
      assert(hashShuffles(p83).forall(e => !e.output.exists(_.name == "text")),
        s"q83 shuffles document text:\n$p83")
      // q84: the quality score folds into a Project BELOW the window
      // exchange — the lang-keyed shuffle carries (doc_id, lang, quality),
      // never the text it was computed from.
      val p84 = exec("q84_quantile_filter")
      hashShuffles(p84).foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"q84 window exchange carries text (score not folded below):\n$p84")
      }
      // q85: every exchange carries (src, gram-hash) or partial counts —
      // no text, no token arrays.
      val p85 = exec("q85_source_overlap")
      hashShuffles(p85).foreach { e =>
        val bad = e.output.filter(a => a.name == "text" ||
          a.dataType.isInstanceOf[ArrayType])
        assert(bad.isEmpty,
          s"q85 exchange carries ${bad.map(_.name).mkString(",")}:\n$p85")
        e.output.filter(_.dataType == StringType).foreach(a =>
          assert(a.name == "gh" || a.name.startsWith("src") || a.name.startsWith("__"),
            s"q85 exchange carries string column ${a.name} (text leak?):\n$p85"))
      }
      // writeTrainingShards' pre-write frame: the per-shard window
      // hash-partitions on shard and the in-task (shard, pos) sort rides
      // that SAME exchange — one shuffle end-to-end, as the scaladoc
      // promises (a second exchange would mean the terminal write pays
      // the corpus twice).
      val sortedShards = graft.ops.Sampling.shuffleShard(
        graft.sources.Testdata.table(spark, sf, "documents")
          .select("doc_id"), "doc_id", 8)
        .sortWithinPartitions(col("shard"), col("pos"))
      val sWrite = hashShuffles(sortedShards.queryExecution.executedPlan)
      assert(sWrite.size == 1,
        s"shard-writer frame planned ${sWrite.size} hash exchanges, want 1:\n" +
          sortedShards.queryExecution.executedPlan)
      // q86: the weighted keep test is pure map-side — the ONLY hash
      // exchange is the dimension-sized lang aggregate, pre-combined.
      val p86 = exec("q86_weighted_sample")
      val s86 = hashShuffles(p86)
      assert(s86.size == 1, s"q86 planned ${s86.size} hash exchanges, want 1:\n$p86")
      assert(p86.toString.contains("partial_"),
        s"q86 lost map-side partial aggregation:\n$p86")
      assert(s86.forall(e => !e.output.exists(_.name == "text")),
        s"q86 shuffles document text:\n$p86")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("r11b ops: zorder broadcasts its stats row, bloom plans one join, drift/split exchanges stay lean") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    graft.plans.GraftExtensions.install(spark)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def exec(name: String) =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    def hashShuffles(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    try {
      // q89: the 1-row min/max stats frame reaches the corpus via an
      // explicitly-broadcast nested-loop join (threshold -1 proves the
      // hint, not size estimation, carries it); the key itself is
      // map-side, so no hash exchange carries text.
      val p89 = exec("q89_zorder_key")
      assert(p89.toString.contains("BroadcastNestedLoopJoin"),
        s"q89 lost its broadcast stats join:\n$p89")
      assert(hashShuffles(p89).forall(e => !e.output.exists(_.name == "text")),
        s"q89 shuffles document text:\n$p89")
      // q90: the Bloom probe shows in the plan and exactly ONE join
      // (the candidate anti-join) survives — the clean branch unions in
      // join-free.
      val p90 = exec("q90_bloom_blocklist")
      assert(p90.toString.contains("graft_bloom_might_contain"),
        s"q90 lost its Bloom prefilter:\n$p90")
      assert(p90.toString.contains("LeftAnti"), s"q90 lost its anti-join:\n$p90")
      val joins90 = p90.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
      assert(joins90.size == 1,
        s"q90 planned ${joins90.size} joins, want 1 (clean branch must not join):\n$p90")
      // q94: drift exchanges carry only (bucket, count) longs — never
      // text — and the histogram aggregates pre-combine map-side.
      val p94 = exec("q94_histogram_drift")
      assert(p94.toString.contains("partial_"),
        s"q94 lost map-side partial aggregation:\n$p94")
      hashShuffles(p94).foreach { e =>
        assert(!e.output.exists(a => a.name == "text" ||
            a.dataType == org.apache.spark.sql.types.StringType),
          s"q94 exchange carries text/strings:\n$p94")
      }
      // q95: ONE group-keyed hash exchange feeds both window functions
      // (rank and group count must share it, not plan two shuffles).
      val p95 = exec("q95_stratified_split")
      val s95 = hashShuffles(p95)
      assert(s95.size == 1,
        s"q95 planned ${s95.size} hash exchanges, want 1:\n$p95")
      // q92: the residual range predicate reaches the parquet scan of
      // the pruned files (stats-manifest pruning composes with footer
      // pushdown, it does not replace it).
      val p92 = exec("q92_stats_pruned_read").toString
      assert(p92.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,200)"),
        s"q92 range predicate not pushed to the pruned scan:\n$p92")
      // q99: the stratified drift's exchanges carry only (source, bucket,
      // count) — never text — and histograms pre-combine map-side.
      val p99 = exec("q99_drift_by_source")
      assert(p99.toString.contains("partial_"),
        s"q99 lost map-side partial aggregation:\n$p99")
      hashShuffles(p99).foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"q99 exchange carries document text:\n$p99")
      }
      // q103: the typed Aggregator runs as a partial+final
      // ObjectHashAggregate; its lang-keyed exchange moves the (Σwx, Σw)
      // buffer, never the text the scores came from.
      val p103 = exec("q103_weighted_mean")
      assert(p103.toString.contains("ObjectHashAggregate"),
        s"q103 did not plan ObjectHashAggregate:\n$p103")
      hashShuffles(p103).foreach { e =>
        assert(!e.output.exists(_.name == "text"),
          s"q103 exchange carries document text:\n$p103")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("r12 ops: 3-dim zorder broadcasts its stats row, phash pairing exchanges are longs-only, 3-dim pruned read pushes its predicate") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    graft.plans.GraftExtensions.install(spark)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def exec(name: String) =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    def hashShuffles(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collect { case e: ShuffleExchangeExec => e }
        .filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
    try {
      // q106: the N-dim key keeps q89's shape — a 1-row stats frame
      // rides an explicitly-broadcast nested-loop join, the 23-bit
      // spread is map-side arithmetic, no hash exchange carries text.
      val p106 = exec("q106_zorder3_key")
      assert(p106.toString.contains("BroadcastNestedLoopJoin"),
        s"q106 lost its broadcast stats join:\n$p106")
      assert(hashShuffles(p106).forall(e => !e.output.exists(_.name == "text")),
        s"q106 shuffles document text:\n$p106")
      // q107: the perceptual-pairing exchanges carry only ids and
      // 64-bit hashes — no strings anywhere on a shuffle (the posture
      // that keeps banded dedup viable when media_id counts are 10⁹).
      val p107 = exec("q107_phash_pairs")
      hashShuffles(p107).foreach { e =>
        assert(!e.output.exists(_.dataType ==
            org.apache.spark.sql.types.StringType),
          s"q107 exchange carries strings:\n$p107")
      }
      // q108: the residual range predicate on the THIRD dimension
      // reaches the parquet scan of the pruned files.
      val p108 = exec("q108_zorder3_pruned_read").toString
      assert(p108.contains("PushedFilters: [IsNotNull(d3), GreaterThanOrEqual(d3,100)"),
        s"q108 range predicate not pushed to the pruned scan:\n$p108")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("r12b ops: moments aggregate partial+final; the exchange is cell-bounded scalars, never the vectors") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // q110–q113: the d² (feature-pair) explode must collapse map-side —
    // partial_sum before the exchange — and the shuffle rows are the
    // (i, j) cells with long sums: no array column may ride the exchange,
    // or the Gram pass would shuffle the corpus's vectors instead of
    // d(d+1)/2 cells. AQE must be OFF while collecting: the adaptive
    // wrapper is a leaf that hides ShuffleExchangeExec and would make
    // the array assertion vacuously pass (review r12c).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q110_embed_moments", "q111_feature_corr",
                    "q112_embed_outliers", "q113_embed_drift")) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val s = p.toString
        assert(s.contains("partial_sum") || s.contains("partial_count"),
          s"$q lost its map-side partial aggregation:\n$s")
        val shuffles = p.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.nonEmpty,
          s"$q: no ShuffleExchangeExec found — the assertion below would be vacuous:\n$s")
        shuffles.foreach { e =>
          assert(!e.output.exists(_.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType]),
            s"$q shuffles an array payload:\n$s")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("r12c ops: HRW routing is window-free map-side; sketch exchanges carry hashes, never tokens") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q115: the per-key HRW argmax is an array expression inside the
      // projection — no Window, no per-key sort; the only exchanges are
      // the 8-row report aggregates, map-side combined
      val s115 = SparkEntry.queries("q115_rendezvous_shard")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!s115.contains("Window"),
        s"q115 planned a window for the HRW argmax (map-side contract broken):\n$s115")
      assert(s115.contains("partial_count"),
        s"q115 report aggregates lost map-side combine:\n$s115")
      // q116/q118: the vocabulary collapse pre-combines map-side and the
      // raw token string never rides an exchange — only the 48-bit hash
      // and the group key survive the projection below the distinct
      for (q <- Seq("q116_kmv_distinct", "q118_kmv_overlap")) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        val s = p.toString
        assert(s.contains("partial_"),
          s"$q lost map-side partial aggregation:\n$s")
        val shuffles = p.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.nonEmpty, s"$q: no exchange found — assertion vacuous:\n$s")
        shuffles.foreach { e =>
          assert(!e.output.exists(_.name == "t"),
            s"$q shuffles the raw token column:\n$s")
        }
      }
      // q120: the CM sketch build is ONE aggregation whose partial
      // combine bounds the exchange at partitions × d × w counter rows —
      // no value string on any exchange, and the probe side joins the
      // d·w-bounded sketch by broadcast, never a shuffled join
      locally {
        val docs = graft.sources.Testdata.table(spark, sf, "documents")
          .select(explode(graft.ops.TextAnalysis.tokens(
            lower(col("text")))).as("t"))
        val sk = graft.ops.Sketches.cmBuild(docs, col("t"), 3, 256)
        val sp = sk.queryExecution.executedPlan
        assert(sp.toString.contains("partial_sum"),
          s"cmBuild lost map-side combine:\n$sp")
        sp.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
          assert(!e.output.exists(a => a.name == "t" || a.name == "v"),
            s"cmBuild shuffles the raw value column:\n$sp")
        }
        val est = graft.ops.Sketches.cmEstimate(sk, docs.limit(50), col("t"), 3, 256)
        val ep = est.queryExecution.executedPlan.toString
        assert(ep.contains("BroadcastHashJoin") && !ep.contains("SortMergeJoin"),
          s"cmEstimate must broadcast the d·w-bounded sketch:\n$ep")
      }
      // q117's trainer objective: pair counts over the word table combine
      // map-side before the exchange (the loop's only per-round shuffle)
      val words = graft.ops.Vocab.wordTable(
        graft.sources.Testdata.table(spark, sf, "documents"), "text")
      val pp = graft.ops.Vocab.pairCounts(words)
        .queryExecution.executedPlan.toString
      assert(pp.contains("partial_sum"),
        s"Vocab.pairCounts lost map-side combine:\n$pp")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("exact set-similarity lane pins no corpus-sized state (q129/q130)") {
    // VERDICT r12 #1: q129 used to eagerly localCheckpoint the whole
    // token-array corpus — a corpus-sized, non-recomputable executor-
    // storage pin. The invariant is NO CORPUS-SIZED pin: no
    // InMemoryTableScan anywhere, and any checkpoint-RDD scan must be
    // CANDIDATE-BOUNDED — the pair frame (four long columns,
    // candidate-count rows) and, since r18-opt, the candidate docs'
    // PACKED token arrays (`ts`), which are semi-joined to the
    // candidate ids before the cut so their mass is pair-bounded, a
    // few % of a deduped corpus (uncut, each of the two verify joins
    // re-ran the whole corpus tokenize/shingle pass — the r17 #4
    // finding). The r12 regression this spec guards against is a pin
    // of the RAW corpus: `text` or the EXPLODED `tok` rows, whose mass
    // is the corpus however few candidates exist.
    val p129 = plan("q129_exact_jaccard")
    assert(!p129.contains("InMemoryTableScan"),
      s"q129 pins a frame in executor storage:\n$p129")
    val rddScans = "Scan ExistingRDD\\[([^\\]]*)\\]".r
      .findAllMatchIn(p129).map(_.group(1)).toSeq
    rddScans.foreach { cols =>
      assert(!cols.contains("text") && !cols.contains("tok"),
        s"q129 pins a corpus-sized frame (columns: $cols):\n$p129")
    }
    // q130 consumes the SHARED pair fixture (a lake-side parquet read,
    // VERDICT r12 #2) — its only ExistingRDD scan is the transitive-
    // closure label frame, which is pair-endpoint-sized, never the
    // corpus; the corpus itself must not be cached.
    val p130 = plan("q130_entity_ids")
    assert(!p130.contains("InMemoryTableScan"),
      s"q130 pins a frame in executor storage:\n$p130")
    assert(p130.contains("Scan parquet"),
      s"q130 no longer reads the shared pair fixture from the lake:\n$p130")
  }

  test("no query plans an unbounded CartesianProduct") {
    // documented bounded cross joins (1-row agg combines, fixed-cardinality
    // broadcasts) plan as BroadcastNestedLoopJoin, never CartesianProduct.
    // q82 is excluded: its CONSTRUCTION runs the whole multi-day backfill
    // (~1 min, violating this spec's planning-only contract) and its
    // returned frame is a bare partitioned-parquet read + sort with no
    // join to audit — the backfill's own plans are covered by
    // PipelineSpec/PipelineScaleSpec.
    val offenders = (SparkEntry.queries.keys.toSet - "q82_backfill_days")
      .toSeq.sorted.flatMap { name =>
        val p = plan(name)
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"CartesianProduct planned in: ${offenders.mkString(", ")}")
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{Curate, Dedup, TextAnalysis}

/** Constrained-memory stress (VERDICT r11 #2): every published number ran
  * in a 128 GiB sandbox, which proves nothing about the 100 TB failure
  * mode that actually kills jobs — executor memory pressure. This harness
  * re-runs the shuffle-heavy operator shapes (q20 LSH, q40 transitive
  * collapse, q55 containment, q85 source-overlap, q64 curate) at 10× the
  * sf corpus under a deliberately starved unified memory pool
  * (`spark.memory.fraction` cut ~12× from the 0.6 default) and asserts
  * the SPILL-NOT-OOM contract:
  *
  *  1. every phase COMPLETES (no OOM, no task failure surfacing as an
  *     exception);
  *  2. every phase's output is BIT-IDENTICAL to the roomy-memory run
  *     (order-independent xxhash64 digest over the full result), i.e.
  *     spilling is invisible in the answer;
  *  3. the starved run actually SPILLS (nonzero memory/disk spill bytes
  *     per phase — otherwise the test proved nothing).
  *
  * Both sessions run in one JVM (same heap): the lever is the unified
  * execution+storage pool, which is what Spark's sort/aggregate/join
  * operators spill against — `UnifiedMemoryManager` sizes it from
  * `spark.memory.fraction` at SparkContext creation, so the harness
  * tears the context down between runs.
  *
  * Usage: `runMain graft.tools.SpillStress [sfDir] [mult]`
  * (defaults /root/testdata/sf0.1, 10). Results → PERF.md §spill.
  */
object SpillStress {

  private class SpillMetrics extends SparkListener {
    @volatile var mem = 0L
    @volatile var disk = 0L
    @volatile var shuffleRead = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        mem += m.memoryBytesSpilled
        disk += m.diskBytesSpilled
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
      }
    }
  }

  /** Order-independent digest of a frame: Σ xxhash64 over the row's
    * canonical string form — partitioning- and ordering-invariant, so
    * the constrained and roomy runs compare without a sort. */
  private def digest(df: DataFrame): (Long, Long) = {
    val cols = df.columns.map(c => col(c).cast("string"))
    val r = df.select(
        xxhash64(concat_ws("|", cols.toSeq: _*)).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("d"))
      .head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def corpus(spark: SparkSession, sfDir: String, m: Int): DataFrame = {
    val d = graft.sources.Testdata.table(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    (0 until m).map { k =>
      if (k == 0) d
      else d.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" copymark$k tag$k")).as("text"),
        col("source"))
    }.reduce(_ unionByName _)
  }

  /** Run every phase in one session; returns name → (rows, digest,
    * memSpilled, diskSpilled, seconds). */
  private def runPhases(spark: SparkSession, sfDir: String, m: Int)
      : Seq[(String, (Long, Long, Long, Long, Double))] = {
    val metrics = new SpillMetrics
    spark.sparkContext.addSparkListener(metrics)
    val d = corpus(spark, sfDir, m).persist(StorageLevel.MEMORY_AND_DISK)
    d.count()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, (Long, Long, Long, Long, Double))]
    def phase(name: String)(f: => DataFrame): Unit = {
      Thread.sleep(300)
      val (m0, d0) = (metrics.mem, metrics.disk)
      val t0 = System.nanoTime()
      val (n, dg) = digest(f)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      out += name -> (n, dg, metrics.mem - m0, metrics.disk - d0, sec)
      println(f"PHASE $name rows=$n digest=$dg " +
        f"spillMemMiB=${(metrics.mem - m0) / 1048576.0}%.1f " +
        f"spillDiskMiB=${(metrics.disk - d0) / 1048576.0}%.1f sec=$sec%.1f")
    }

    phase("q20_minhash_lsh") {
      Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
    }
    phase("q40_transitive_collapse") {
      val pairs = Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
      Dedup.componentsWithRounds(pairs)._1
    }
    phase("q55_containment") {
      val cand = Dedup.lshCandidates(d, "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, rows = 2)
      Dedup.containmentOnPairs(cand, d, "doc_id", "text", 3)
        .filter(greatest(col("containment_a"), col("containment_b")) >= 0.9)
    }
    phase("q85_source_overlap") {
      TextAnalysis.sourceOverlap(d, "doc_id", "text", "source", 3)
    }
    phase("q64_curate") {
      val bench = {
        import spark.implicits._
        Seq((1L, "holdout xyzzy plugh")).toDF("doc_id", "text")
      }
      val r = Curate.curate(d.select("doc_id", "text"), bench,
        "doc_id", "text")
      r.corpus.select(col("doc_id"), col("split"),
        length(col("text")).cast("long").as("n"))
    }
    // the count-filter fuzzy plan is the newest shuffle-heavy operator
    // (~300 MiB gram-join exchange at 8x — see PERF §fuzzy-join); its
    // whole exchange must spill, not OOM, under the starved pool
    def fuzzyNames: DataFrame = {
      val base = graft.sources.Testdata.table(spark, sfDir, "supplier")
        .select("s_suppkey", "s_name")
      (0 until 8).map { k =>
        if (k == 0) base
        else {
          val c = ('a' + (k % 26)).toChar
          base.select((col("s_suppkey") + lit(k * 1000000L)).as("s_suppkey"),
            concat(col("s_name"), lit(s"~$c$c")).as("s_name"))
        }
      }.reduce(_ unionByName _)
    }
    phase("q124_fuzzy_countfilter_8x") {
      graft.ops.FuzzyJoin.editSelfJoin(fuzzyNames, "s_suppkey", "s_name",
        maxDist = 1, prefixFilter = false)
    }
    // VERDICT r12 #8: the exact-join lanes under the same starvation.
    // The bench-default prefix-filtered fuzzy plan…
    phase("q124_fuzzy_prefix_8x") {
      graft.ops.FuzzyJoin.editSelfJoin(fuzzyNames, "s_suppkey", "s_name",
        maxDist = 1, prefixFilter = true)
    }
    // …and the exact set-similarity join at 4× (copies append 2 trailing
    // tokens, so every copy family fully pairs at J ≥ 1/2 — the verify
    // token-count exchange, the lane's biggest, is what gets starved)
    def shingled4x: DataFrame = corpus(spark, sfDir, math.min(4, m))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 3)
      .withColumn("toks", expr(
        "zip_with(zip_with(slice(ws, 1, greatest(size(ws)-2, 0)), " +
          "slice(ws, 2, greatest(size(ws)-2, 0)), (a, b) -> concat(a, ' ', b)), " +
          "slice(ws, 3, greatest(size(ws)-2, 0)), (ab, c) -> concat(ab, ' ', c))"))
    phase("q129_exact_jaccard_4x") {
      Dedup.exactJaccardPairs(shingled4x, "doc_id", col("toks"), 1L, 2L)
    }
    // …and the incremental face's PROBE (r14: the verify ships each
    // candidate pair's delta token ARRAY into the state doc's bucket —
    // the lane's widest shuffle rows; they must spill, not OOM)
    phase("q134_state_probe_4x") {
      val sh = shingled4x
      val root = java.nio.file.Files
        .createTempDirectory("graft-spill-xjs-").toString
      graft.ops.ExactJoinState.build(sh.filter(col("doc_id") % 2 === 0),
        "doc_id", col("toks"), 1L, 2L, root)
      graft.ops.ExactJoinState.probe(sh.filter(col("doc_id") % 2 === 1),
        "doc_id", col("toks"), root)
    }
    // …and the fuzzy state's PROBE (r15, the q143 lane): the adversarial
    // gram-df corpus makes the candidate exchange the lane's widest —
    // it must spill, not OOM, and stay bit-identical
    phase("q143_fuzzy_state_probe_8x") {
      val root = java.nio.file.Files
        .createTempDirectory("graft-spill-fzs-").toString
      graft.ops.FuzzyJoinState.build(
        fuzzyNames.filter(col("s_suppkey") % 2 === 0),
        "s_suppkey", "s_name", maxDist = 1, root = root)
      graft.ops.FuzzyJoinState.probe(
        fuzzyNames.filter(col("s_suppkey") % 2 === 1),
        "s_suppkey", "s_name", root)
    }
    d.unpersist()
    spark.sparkContext.removeSparkListener(metrics)
    out.toSeq
  }

  private def session(constrained: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // 0.05 of the heap instead of 0.6 — a ~12× starvation of the pool
    // every sort/hash-aggregate/join build side lives in. storageFraction
    // stays default: the cached corpus must ALSO fight for the pool.
    (if (constrained) b.config("spark.memory.fraction", "0.05") else b)
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    println(s"=== roomy run (spark.memory.fraction default) ===")
    val roomySpark = session(constrained = false)
    roomySpark.sparkContext.setLogLevel("ERROR")
    val roomy = runPhases(roomySpark, sfDir, m)
    roomySpark.stop()
    // a fresh context picks up the new static memory config
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    println(s"=== constrained run (spark.memory.fraction=0.05) ===")
    val tightSpark = session(constrained = true)
    tightSpark.sparkContext.setLogLevel("ERROR")
    val tight = runPhases(tightSpark, sfDir, m)
    tightSpark.stop()

    var ok = true
    roomy.zip(tight).foreach {
      case ((name, (nR, dR, _, _, sR)), (_, (nT, dT, memT, diskT, sT))) =>
        val same = nR == nT && dR == dT
        val spilled = memT + diskT > 0
        if (!same) ok = false
        println(f"RESULT $name rows=$nT match=$same " +
          f"spillMemMiB=${memT / 1048576.0}%.1f " +
          f"spillDiskMiB=${diskT / 1048576.0}%.1f " +
          f"roomySec=$sR%.1f tightSec=$sT%.1f " +
          (if (!spilled) "NOTE=no-spill (phase fits even the starved pool)"
           else ""))
    }
    require(ok, "constrained-memory outputs diverged from the roomy run")
    println("SPILL-STRESS OK: all phases completed under the starved pool " +
      "with outputs identical to the roomy run")
  }
}

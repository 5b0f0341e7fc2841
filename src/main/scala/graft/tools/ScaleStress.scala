package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Dedup

/** Scale-stress harness for the dedup/near-dup family (the evidence behind
  * the "amortizes at 100×" claims in PERF.md): builds a multiplied
  * documents corpus — deterministic noised copies, so near-dup FAMILIES
  * scale with the data instead of dissolving — then runs the q20/q40/q50/
  * q55 pipeline shapes at 1× and N× and prints, per phase: wall seconds,
  * shuffle read/write bytes (stage-metrics listener), stage count, and for
  * the transitive collapse the rounds-to-convergence (the observable the
  * O(log diameter) claim rests on).
  *
  * Usage: `runMain graft.tools.ScaleStress [sfDir] [multiplier]`
  * (defaults: /root/testdata/sf0.1, 10×). Results are recorded in
  * PERF.md §scale-stress.
  */
object ScaleStress {

  private class ShuffleMetrics extends SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    @volatile var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
        stages += 1
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new ShuffleMetrics
    spark.sparkContext.addSparkListener(metrics)

    // copy k appends two marker tokens: each copy is a NEAR-dup of its
    // base (high Jaccard, not exact), so candidate volume, component
    // sizes and chain diameter all grow with the multiplier
    def corpus(m: Int): DataFrame = {
      val d = graft.sources.Testdata.table(spark, sfDir, "documents")
        .select("doc_id", "text")
      (0 until m).map { k =>
        if (k == 0) d
        else d.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copymark$k tag$k")).as("text"))
      }.reduce(_ unionByName _)
    }

    def phase(name: String)(f: => Long): Unit = {
      Thread.sleep(300) // drain async listener events from prior work
      val (r0, w0, s0) = (metrics.read, metrics.written, metrics.stages)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PHASE $name rows=$rows sec=$sec%.1f " +
        f"shuffleReadMiB=${(metrics.read - r0) / 1048576.0}%.1f " +
        f"shuffleWriteMiB=${(metrics.written - w0) / 1048576.0}%.1f " +
        s"stages=${metrics.stages - s0}")
    }

    Seq(1, mult).foreach { m =>
      val d = corpus(m).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"=== corpus ${m}x: ${d.count()} docs ===")

      phase(s"${m}x_q20_minhash_lsh") {
        Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5).count()
      }

      phase(s"${m}x_q40_transitive_collapse") {
        val pairs = Dedup.nearDupPairs(d, "doc_id", "text", threshold = 0.5)
        val (labels, rounds) = Dedup.componentsWithRounds(pairs)
        val n = labels.count()
        println(s"ROUNDS ${m}x_q40 rounds=$rounds")
        n
      }

      phase(s"${m}x_q50_simhash64_neardup") {
        // the documented scale config: 64-bit hash, 4 × 16-bit bands
        val sh = d.selectExpr("doc_id",
          "graft_simhash64(filter(split(text, ' '), t -> t != '')) AS h")
        Dedup.simhashNearDups(sh, "doc_id", "h",
          bands = 4, width = 16, maxHamming = 3).count()
      }

      phase(s"${m}x_q55_containment") {
        val cand = Dedup.lshCandidates(d, "doc_id", "text",
          shingleN = 3, k = 12, bands = 6, rows = 2)
        Dedup.containmentOnPairs(cand, d, "doc_id", "text", 3)
          .filter(greatest(col("containment_a"), col("containment_b")) >= 0.9)
          .count()
      }

      d.unpersist()
    }
    spark.stop()
  }
}

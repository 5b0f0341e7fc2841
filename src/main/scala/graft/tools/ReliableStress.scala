package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curate, CurateIncremental, Dedup, Graph, Lineage}

/** Measures the RELIABLE-checkpoint seam's cost (VERDICT r13 #5):
  * LineageSpec proves both cut mechanisms bit-identical; this harness
  * prices them. Each iterative operator — PageRank, connected
  * components, and the incremental-curation daily (whose survivor pins
  * route through [[Lineage.mark]]) — runs at a multiplied scale twice:
  * once on the default executor-local cut (`localCheckpoint`) and once
  * under `spark.graft.checkpoint.reliable=true` with a checkpoint dir,
  * which writes every cut frame through the (here: local-FS) reliable
  * checkpoint store. The printed ×-factor is the restartability price a
  * cluster operator pays per op; results land in PERF.md §100TB.
  *
  * Usage: `runMain graft.tools.ReliableStress [sfDir] [multiplier]`
  * (defaults: /root/testdata/sf0.1, 10).
  */
object ReliableStress {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-relckpt-").toString
    spark.sparkContext.setCheckpointDir(ckptDir)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    /** Run `op` under both cut mechanisms; `digest` must be a
      * deterministic driver-side summary small enough to compare. */
    def compare[A](name: String)(op: => DataFrame)(digest: DataFrame => A): Unit = {
      spark.conf.set(Lineage.ReliableConf, "false")
      digest(op) // warm-up: JVM/codegen/page cache — else mode 1 pays it
      val (roomy, tRoomy) = timed(digest(op))
      spark.conf.set(Lineage.ReliableConf, "true")
      val (reliable, tReliable) = timed(digest(op))
      spark.conf.set(Lineage.ReliableConf, "false")
      val factor = tReliable / tRoomy
      println(f"[reliable-stress] $name%-22s local=$tRoomy%7.1fs reliable=$tReliable%7.1fs x$factor%.2f identical=${roomy == reliable}")
    }

    // --- PageRank: synthetic scale-m graph (deterministic modular edges)
    val nNodes = 120000L * m
    val edges = spark.range(nNodes * 6).select(
      (col("id") * 31 % nNodes).as("src"),
      ((col("id") * 17 + 7) % nNodes).as("dst"))
    compare(s"pagerank(n=${nNodes}, 5it)") {
      Graph.pageRank(edges, "src", "dst", iterations = 5,
        redistributeDangling = true)
    }(_.orderBy("node").agg(
      sum(col("pr")).as("s"), sum(col("node") * col("pr")).as("w"))
      .head().toSeq)

    // --- Connected components: m×100k chain segments of length 100
    // (log-diameter rounds, every round cut)
    val nPairs = 100000L * m
    val pairs = spark.range(nPairs).filter(col("id") % 100 =!= 99)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    compare(s"components(${nPairs} pairs)") {
      Dedup.components(pairs)
    }(_.agg(sum(col("lbl")).as("s"), count(lit(1)).as("n")).head().toSeq)

    // --- Incremental-curation daily: the survivor pins route through
    // Lineage.mark — the curate lineage-cut seam. State = m× noised
    // corpus; delta = a fresh m× slice with planted re-crawls.
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def mult(df: DataFrame, copies: Int, idOff: Long): DataFrame =
      (0 until copies).map { k =>
        df.select((col("doc_id") * copies + k + idOff).as("doc_id"),
          concat(col("text"), lit(s" v$k")).as("text"))
      }.reduce(_ unionByName _)
    val bench = spark.range(1).select(lit(900000000L).as("doc_id"),
      lit("benchmark holdout phrase matching nothing here").as("text"))
    val corpus = mult(base, m, 0L)
    val delta = mult(base, m, 100000000L) // re-crawl-heavy delta
    def freshRoot(mode: String): String = {
      val r = java.nio.file.Files.createTempDirectory(s"graft-relstr-$mode-").toString
      spark.conf.set(Lineage.ReliableConf, "false") // bootstrap outside the timing
      CurateIncremental.bootstrap(corpus, bench, "doc_id", "text", r,
        Curate.Config()).release()
      r
    }
    val rootW = freshRoot("warm")
    val rootA = freshRoot("local")
    val rootB = freshRoot("rel")
    def dailyDigest(root: String): Seq[Any] = {
      val r = CurateIncremental.daily(delta, bench, "doc_id", "text", root,
        Curate.Config())
      val d = r.corpus.agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s"))
        .head().toSeq
      r.release()
      d
    }
    spark.conf.set(Lineage.ReliableConf, "false")
    dailyDigest(rootW) // warm-up
    val (roomyD, tRoomyD) = timed(dailyDigest(rootA))
    spark.conf.set(Lineage.ReliableConf, "true")
    val (relD, tRelD) = timed(dailyDigest(rootB))
    spark.conf.set(Lineage.ReliableConf, "false")
    println(f"[reliable-stress] curate-daily(${m}x)      local=$tRoomyD%7.1fs reliable=$tRelD%7.1fs x${tRelD / tRoomyD}%.2f identical=${roomyD == relD}")

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r17-opt): shuffle bytes of Graph.pageRank as a
  * function of iteration count — if the loop-invariant layout reuse
  * works, bytes grow only by the per-round aggregated-contribution
  * exchange, never by the edge list. Usage: [iters ...] */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 6)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    @volatile var read = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) read += m.shuffleReadMetrics.totalBytesRead
        }
      })
    // ~200k-edge synthetic graph
    val edges = spark.range(200000L).select(
      (col("id") % 5000L).as("src"), ((col("id") * 7919L) % 5000L).as("dst"))
      .distinct()
    edges.localCheckpoint(true).count()
    iters.foreach { k =>
      Thread.sleep(500); read = 0L
      val t0 = System.nanoTime()
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = k,
        assumeDistinctEdges = true)
        .agg(sum("pr")).collect()
      Thread.sleep(500)
      println(f"iters=$k%2d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"shuffleRead=${read / 1e6}%8.2f MB")
    }
    spark.stop()
  }
}

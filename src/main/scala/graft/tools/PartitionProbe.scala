package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r17-opt): does an eager localCheckpoint preserve hash
  * output partitioning, with AQE on and off? Decides whether iterative
  * operators can pre-partition their loop-invariant frames once. */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val e = (1L to 1000L).map(i => (i % 97, i)).toDF("src", "dst")
      val cut = e.repartition(col("src")).localCheckpoint(true)
      println(s"AQE=$aqe cut partitioning: " +
        cut.queryExecution.executedPlan.outputPartitioning)
      val probe = (1L to 97L).map(i => (i, i * 10)).toDF("src", "pr")
      val joined = cut.join(probe, "src")
      val plan = joined.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      println(s"AQE=$aqe join plan exchanges: $nEx")
      if (args.contains("-v")) println(plan)
    }
    spark.stop()
  }
}

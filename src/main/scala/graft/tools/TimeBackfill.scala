package graft.tools
import org.apache.spark.sql.SparkSession
object TimeBackfill {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val days = args.headOption.map(_.toInt).getOrElse(30)
    val perDay = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val dates = (1 to days).map(d => f"2026-03-$d%02d")
    val base = java.nio.file.Files.createTempDirectory("graft-tb-").toString
    graft.sources.SyntheticRaw.writeDays(s"$base/raw", dates, perDay)
    val cfg = graft.Pipeline.Config(s"$base/raw", s"$base/lake", s"$base/serving",
      dates.head, "bench", multiLineRaw = false)
    val t0 = System.nanoTime()
    val r = graft.Pipeline.backfill(spark, cfg, dates, retries = 0, sleeper = _ => ())
    println(f"BACKFILL days=$days perDay=$perDay ok=${r.size} sec=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}

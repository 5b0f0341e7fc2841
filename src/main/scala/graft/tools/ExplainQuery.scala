package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for one or more catalog queries to files —
  * the plan evidence for the optimization rounds (`plans/rNN/`).
  * Usage: `runMain graft.tools.ExplainQuery <outDir> <suffix> <q1,q2,...> [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` per query. Prefix-matched like
  * SPARK_GRAFT_ONLY. Conf overrides may follow as k=v args. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainQuery <outDir> <suffix> <q1,q2,..> [sfDir] [k=v ...]")
    val outDir = args(0)
    val suffix = args(1)
    val want = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val rest = args.drop(3)
    val sfDir = rest.find(a => !a.contains("=")).getOrElse("/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    rest.filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => want.exists(n.startsWith))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** End-to-end determinism gate: run the ENTIRE query catalog at two
  * different parallelism levels and require bit-identical results.
  *
  * Per-operator partition-stability is unit-tested (the md5-not-rand
  * discipline), but nothing global caught a future query whose author
  * forgets it — a partition-count-sensitive result would sail through
  * the oracle compare (the driver runs one fixed parallelism) and then
  * differ between a 4-executor dev run and a 1000-executor production
  * run. This gate is that catch: the same digest at local[4]/4 shuffle
  * partitions and local[16]/16 means no result depends on partition
  * count, task scheduling, or parallel reduction order.
  *
  * The digest mirrors the driver's t2 compare: columns sorted by name,
  * rows IN RESULT ORDER (an unstable ORDER BY must fail here), values
  * via Row.toString. Queries are collected bounded — the catalog's
  * results are report-sized by design (the corpus-sized faces live
  * behind sinks, not queries).
  *
  * Usage: `runMain graft.tools.DeterminismGate [sfDir] [cpusA,cpusB]`
  * (defaults: sf0.01, 4,16). Exit 1 on any divergence.
  */
object DeterminismGate {

  private def digests(sfDir: String, cpus: String): Map[String, String] = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val d =
        try {
          val df = fn(spark, sfDir)
          val cols = df.columns.sorted.toSeq
          val md = java.security.MessageDigest.getInstance("MD5")
          df.select(cols.map(col): _*).collect().foreach { r =>
            md.update(r.mkString("", "", "").getBytes("UTF-8"))
          }
          md.digest().map("%02x".format(_)).mkString
        } catch {
          case e: Throwable =>
            "ERR:" + Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
        }
      name -> d
    }.toMap
    spark.stop()
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val Seq(a, b) = args.drop(1).headOption.getOrElse("4,16")
      .split(",").toSeq.take(2)
    val da = digests(sfDir, a)
    val db = digests(sfDir, b)
    var bad = 0
    for (name <- (da.keySet ++ db.keySet).toSeq.sorted) {
      (da.get(name), db.get(name)) match {
        case (Some(x), Some(y)) if x == y && !x.startsWith("ERR:") =>
          println(s"DETERMINISTIC $name $x")
        case (x, y) =>
          println(s"DIVERGED      $name local[$a]=${x.getOrElse("?")} local[$b]=${y.getOrElse("?")}")
          bad += 1
      }
    }
    println(s"TOTAL ${da.size} queries, $bad divergent between local[$a] and local[$b]")
    if (bad > 0) sys.exit(1)
  }
}

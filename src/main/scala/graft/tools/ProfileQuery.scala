package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** One-off job-level profile of a catalog query: prints job count,
  * per-job walls and call sites, and the task-time/wall ratio — the
  * diagnostic for overhead-bound macros (VERDICT r15 #4 work).
  * Usage: `runMain graft.tools.ProfileQuery <query> [sfDir]`. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q150_multilane_daily")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, start: Long, var end: Long = 0L, site: String)
    val jobs = scala.collection.mutable.Map[Int, J]()
    var taskTime = 0L
    var nStages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's callsite names the action; the deepest
        // frame of `details` names the library caller
        val si = e.stageInfos.lastOption
        val lib = si.map(_.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("SparkEntry") &&
              !l.contains("ProfileQuery"))
            .getOrElse("?").trim.take(90)).getOrElse("?")
        val act = si.map(_.name.takeWhile(_ != ' ')).getOrElse("?")
        jobs(e.jobId) = J(e.jobId, e.time, site = s"$act | $lib")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        nStages += 1
        val m = e.stageInfo.taskMetrics
        if (m != null) taskTime += m.executorRunTime
      }
    })

    val t0 = System.nanoTime()
    graft.SparkEntry.queries(q)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val done = jobs.values.toSeq.filter(_.end > 0)
    println(f"PROFILE $q wall=$wall%.1f s jobs=${done.size} stages=$nStages " +
      f"taskTime=${taskTime / 1e3}%.1f s (sum executor ms)")
    val byDur = done.map(j => (j.end - j.start, j.site)).sortBy(-_._1)
    println("top jobs by wall:")
    byDur.take(25).foreach { case (ms, site) => println(f"  $ms%6d ms  $site") }
    val bySite = byDur.groupBy(_._2).view
      .mapValues(g => (g.size, g.map(_._1).sum)).toSeq.sortBy(-_._2._2)
    println("by call site (n, total ms):")
    bySite.take(25).foreach { case (s, (n, ms)) => println(f"  $ms%6d ms  n=$n%-3d $s") }
    spark.stop()
  }
}

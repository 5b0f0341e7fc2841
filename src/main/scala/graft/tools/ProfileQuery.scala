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
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // extra args are k=v conf overrides (e.g. spark.sql.adaptive.enabled=false)
    args.drop(2).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ =>
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class J(id: Int, start: Long, var end: Long = 0L, site: String,
                 execId: Option[String] = None)
    val jobs = scala.collection.mutable.Map[Int, J]()
    // execution id -> root-action description (from SQLExecutionStart) —
    // attributes the otherwise-anonymous broadcast/subquery future jobs
    // to the action that planned them (r17: q150's ~260 broadcast jobs
    // needed a home before they could be cut)
    val execDesc = scala.collection.mutable.Map[String, String]()
    var taskTime = 0L
    var nStages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc(s.executionId.toString) = s.description.linesIterator
            .toSeq.headOption.getOrElse("?").take(90)
        case _ =>
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's callsite names the action; the deepest
        // frame of `details` names the library caller
        val si = e.stageInfos.lastOption
        val lib = si.map(_.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("SparkEntry") &&
              !l.contains("ProfileQuery"))
            .getOrElse("?").trim.take(90)).getOrElse("?")
        val act = si.map(_.name.takeWhile(_ != ' ')).getOrElse("?")
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        jobs(e.jobId) = J(e.jobId, e.time, site = s"$act | $lib",
          execId = execId)
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
    // the attribution that matters for overhead-bound macros: every job
    // (broadcast/subquery futures included) rolled up to the ROOT action
    // that planned it
    val byExec = done.groupBy(j => j.execId.flatMap(execDesc.get).getOrElse("<no sql execution>"))
      .view.mapValues(g => (g.size, g.map(j => j.end - j.start).sum))
      .toSeq.sortBy(-_._2._1)
    println("by root action (n jobs, total ms):")
    byExec.take(40).foreach { case (d, (n, ms)) =>
      println(f"  n=$n%-4d $ms%7d ms  $d")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment for the bucketed curate-state design (deleted once
  * CurateIncremental lands it): verifies DDL re-registration over
  * existing bucketed files, bucketed append, overwrite, and that a probe
  * join plans NO exchange on the bucketed state side. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("bucket-probe-").toString
    val dir = s"$root/fingerprints"
    val name = "probe_fps"
    val n = 4

    // 1. bucketed overwrite via saveAsTable + path option
    val fps = (0L until 1000L).map(i => (i, i * 31 + 7)).toDF("id", "content_key")
    fps.repartition(n, col("content_key"))
      .write.bucketBy(n, "content_key").sortBy("content_key")
      .option("path", dir).mode("overwrite").saveAsTable(name)
    println(s"1. overwrite OK, files=${new java.io.File(dir).list().count(_.startsWith("part-"))}")

    // 2. bucketed append
    val more = (1000L until 1200L).map(i => (i, i * 31 + 7)).toDF("id", "content_key")
    more.repartition(n, col("content_key"))
      .write.bucketBy(n, "content_key").sortBy("content_key")
      .option("path", dir).mode("append").saveAsTable(name)
    println(s"2. append OK, count=${spark.table(name).count()} files=${new java.io.File(dir).list().count(_.startsWith("part-"))}")

    // 3. drop catalog entry, re-register via DDL (fresh-session simulation)
    spark.sql(s"DROP TABLE $name")
    val schema = spark.read.parquet(dir).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $name ($schema) USING PARQUET
         |CLUSTERED BY (content_key) SORTED BY (content_key) INTO $n BUCKETS
         |LOCATION '$dir'""".stripMargin)
    println(s"3. DDL re-register OK, count=${spark.table(name).count()}")

    // 4. probe join plans no exchange on the state side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val delta = (500L until 1500L).map(i => (i + 90000, i * 31 + 7)).toDF("id", "content_key")
    val anti = delta.join(
      spark.table(name).select(col("content_key")).distinct(),
      Seq("content_key"), "left_anti")
    val plan = anti.queryExecution.executedPlan
    println(plan.toString)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    val badShuffles = plan.collect { case e: ShuffleExchangeExec => e }
      .filter(_.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(dir))
        case _ => false
      })
    println(s"4. state-side exchanges: ${badShuffles.size} (want 0)")
    val bucketedScan = plan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains(dir)) => f
    }
    println(s"   bucketed state scans found: ${bucketedScan.size}, bucketSpec=${bucketedScan.headOption.map(_.relation.bucketSpec)}")
    println(s"   anti count=${anti.count()} (want 500: ids 1200-1499 fresh... actually 1200..1499=300)")

    // 5. overwrite again while table exists (compaction shape)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val all = spark.table(name)
    val pinnedRdd = all.rdd
    pinnedRdd.localCheckpoint()
    pinnedRdd.count()
    val pinned = spark.createDataFrame(pinnedRdd, all.schema)
    pinned.repartition(n, col("content_key"))
      .write.bucketBy(n, "content_key").sortBy("content_key")
      .option("path", dir).mode("overwrite").saveAsTable(name)
    println(s"5. compact-overwrite OK, count=${spark.table(name).count()} files=${new java.io.File(dir).list().count(_.startsWith("part-"))}")

    spark.stop()
  }
}

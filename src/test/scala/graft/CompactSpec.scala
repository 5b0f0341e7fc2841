package graft

import org.apache.spark.sql.functions._

import graft.io.StatsManifest
import graft.ops.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def fileNames(d: String): Set[String] =
    StatsManifest.liveDataFiles(spark, d).toSet

  private def rowsOf(d: String): Seq[(Long, Long)] =
    spark.read.parquet(d).as[(Long, Long)].collect().sorted.toSeq

  test("compact bin-packs small files, leaves big ones, preserves rows exactly") {
    val d = java.nio.file.Files.createTempDirectory("compact").toString
    // one big file + 12 tiny ones
    (0L until 40000L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(d)
    (40000L until 41200L).map(i => (i, i)).toDF("id", "v")
      .repartition(12).write.mode("append").parquet(d)
    val expected = rowsOf(d)
    val bigName = Compactor.biggest(spark, d)
    val r = Compact.compact(spark, d, targetBytes = 256L << 10)
    assert(r.filesBefore == 13 && r.filesCompacted == 12 && r.filesWritten == 1,
      s"12 tiny files must pack into 1 bin (got $r)")
    val after = fileNames(d)
    assert(after.contains(bigName), "the big file must be untouched")
    assert(after.size == 2)
    assert(rowsOf(d) == expected, "compaction must preserve rows exactly")
    assert(spark.read.parquet(d).count() == 41200L)
    // idempotent: a second pass is a no-op (1 small file < 2)
    val r2 = Compact.compact(spark, d, targetBytes = 256L << 10)
    assert(r2.filesCompacted == 0 && fileNames(d) == after)
  }

  test("sortCols re-establish clustering; manifests refresh incrementally after compaction") {
    val d = java.nio.file.Files.createTempDirectory("compactsort").toString
    // 8 shuffled small files: every file's id envelope spans the domain
    (0L until 10000L).map(i => (i, i % 7)).toDF("id", "v")
      .repartition(8, col("id")).write.mode("overwrite").parquet(d)
    val total = fileNames(d).size
    StatsManifest.write(spark, d, Seq("id"))
    assert(StatsManifest.prunedFiles(spark, d, "id", 10L, 20L).size == total,
      "pre-compaction layout must be unprunable")
    val r = Compact.compact(spark, d, targetBytes = 24L << 10,
      sortCols = Seq("id"))
    assert(r.filesCompacted == total && r.filesWritten >= 2,
      s"fixture must compact into 2+ range-disjoint bins (got $r)")
    // the stats manifest refreshes by scanning only the new bins, and the
    // re-clustered layout now prunes a narrow range to ~1 file
    assert(!StatsManifest.isFresh(spark, d))
    StatsManifest.updateStats(spark, d, Seq("id"))
    assert(StatsManifest.isFresh(spark, d))
    val kept = StatsManifest.prunedFiles(spark, d, "id", 10L, 20L)
    assert(kept.size <= r.filesWritten / 2 + 1,
      s"post-compaction range probe must prune (kept ${kept.size} of ${r.filesWritten})")
    val got = StatsManifest.readRange(spark, d, "id", 10L, 20L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (10L to 20L).toSeq)
  }

  test("sweep rolls back a crash mid-landing losslessly") {
    val d = java.nio.file.Files.createTempDirectory("compactcrash").toString
    (0L until 900L).map(i => (i, i)).toDF("id", "v")
      .repartition(6).write.mode("overwrite").parquet(d)
    val expected = rowsOf(d)
    val olds = fileNames(d).toSeq.sorted
    // hand-build the mid-phase-2 crash state: stage a fake "new" file
    // (rows already duplicated into it), move two olds to undo, land the
    // new file, leave plan + undo behind
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val newName = "part-99999-deadbeef-c000.snappy.parquet"
    spark.read.parquet(s"$d/${olds.head}", s"$d/${olds(1)}")
      .coalesce(1).write.parquet(s"$d/.compact_staging_test")
    val stagedPart = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/.compact_staging_test"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")).head.getPath
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$d/.compact_undo"))
    Seq(olds.head, olds(1)).foreach { o =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$d/$o"),
        new org.apache.hadoop.fs.Path(s"$d/.compact_undo/$o")))
    }
    assert(fs.rename(stagedPart, new org.apache.hadoop.fs.Path(s"$d/$newName")))
    val plan = fs.create(new org.apache.hadoop.fs.Path(s"$d/${Compact.PlanFile}"), true)
    plan.write(
      s"""{"oldFiles":["${olds.head}","${olds(1)}"],"newFiles":["$newName"]}"""
        .getBytes("UTF-8"))
    plan.close()
    // crashed state is visibly wrong (duplicated rows); sweep repairs it
    assert(Compact.sweep(spark, d), "sweep must detect the crash")
    assert(rowsOf(d) == expected, "rollback must restore the exact rows")
    assert(fileNames(d).toSeq.sorted == olds)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/${Compact.PlanFile}")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/.compact_undo")))
    assert(!Compact.sweep(spark, d), "sweep is idempotent")
  }
}

/** Test-only helper: the biggest data file's name. */
private object Compactor {
  def biggest(spark: org.apache.spark.sql.SparkSession, d: String): String = {
    val root = new org.apache.hadoop.fs.Path(d)
    root.getFileSystem(spark.sessionState.newHadoopConf())
      .listStatus(root).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .maxBy(_.getLen).getPath.getName
  }
}

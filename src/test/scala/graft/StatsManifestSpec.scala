package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.StatsManifest
import graft.ops.Layout

class StatsManifestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("stats").toString
    // decorrelated dims (same fixture shape as LayoutSpec)
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i / 64).toLong, (Integer.reverse(i) >>> 20).toLong)
    }
    Layout.zorderWrite(rows.toDF("id", "a", "b"), "a", "b", 16, d)
    StatsManifest.write(spark, d, Seq("a", "b"))
    d
  }

  test("manifest has one row per file with sound envelopes") {
    val m = spark.read.json(s"$dir/${StatsManifest.ManifestDir}")
    val nFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(m.count() == nFiles)
    assert(m.filter(col("a_min") > col("a_max")).count() == 0)
    assert(m.filter(col("a_min").isNull).count() == 0)
  }

  test("readRange equals full-scan + filter, on BOTH z-ordered dimensions") {
    for ((c, lo, hi) <- Seq(("a", 10L, 14L), ("b", 100L, 300L))) {
      val got = StatsManifest.readRange(spark, dir, c, lo, hi)
        .select("id").as[Long].collect().sorted
      val want = spark.read.parquet(dir)
        .filter(col(c) >= lo && col(c) <= hi)
        .select("id").as[Long].collect().sorted
      assert(got.toSeq == want.toSeq, s"mismatch on $c")
      assert(got.nonEmpty)
    }
  }

  test("pruning actually skips files on both dimensions (the z-order payoff)") {
    val total = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    // each range sits inside one quartile of its dimension — a 4×4
    // z-order grid keeps ~1/4 of files per single-dimension cut
    val keptA = StatsManifest.prunedFiles(spark, dir, "a", 10, 14).size
    val keptB = StatsManifest.prunedFiles(spark, dir, "b", 100, 300).size
    assert(keptA < total / 2, s"a-pruning kept $keptA of $total")
    assert(keptB < total / 2, s"b-pruning kept $keptB of $total")
  }

  test("empty overlap reads zero files and returns an empty, schema-correct frame") {
    assert(StatsManifest.prunedFiles(spark, dir, "a", 1000000, 2000000).isEmpty)
    val empty = StatsManifest.readRange(spark, dir, "a", 1000000, 2000000)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "a", "b", "zkey"))
  }

  test("stale manifest (files appended) falls back to full scan — row contract holds") {
    val d2 = java.nio.file.Files.createTempDirectory("statsfresh").toString
    (0L until 100L).map(i => (i, i)).toDF("id", "c")
      .repartition(2).write.mode("overwrite").parquet(d2)
    StatsManifest.write(spark, d2, Seq("c"))
    assert(StatsManifest.isFresh(spark, d2))
    // append AFTER the manifest was written: rows 100..199 are in no
    // manifest envelope — r11's readRange silently dropped them
    (100L until 200L).map(i => (i, i)).toDF("id", "c")
      .repartition(1).write.mode("append").parquet(d2)
    assert(!StatsManifest.isFresh(spark, d2))
    val got = StatsManifest.readRange(spark, d2, "c", 50L, 150L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == (50L to 150L).toSeq,
      s"stale-manifest read must see appended rows (got ${got.length})")
    // rewriting the manifest restores freshness and pruning
    StatsManifest.write(spark, d2, Seq("c"))
    assert(StatsManifest.isFresh(spark, d2))
  }

  test("stale manifest (file deleted) falls back instead of failing the read") {
    val d3 = java.nio.file.Files.createTempDirectory("statsdel").toString
    (0L until 100L).map(i => (i, i)).toDF("id", "c")
      .repartition(4, col("c")).sortWithinPartitions("c")
      .write.mode("overwrite").parquet(d3)
    StatsManifest.write(spark, d3, Seq("c"))
    // simulate a compaction race: one data file vanishes
    val victim = java.nio.file.Files.list(java.nio.file.Paths.get(d3))
      .iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
    java.nio.file.Files.delete(victim)
    assert(!StatsManifest.isFresh(spark, d3))
    // r11's pruned read would fail on the missing path; the fallback
    // reads what exists and applies the filter
    val got = StatsManifest.readRange(spark, d3, "c", 0L, 99L).count()
    assert(got > 0 && got < 100,
      s"fallback must read the surviving files only (got $got)")
  }

  test("all-NULL stat columns are conservatively kept (pruning stays sound)") {
    val d2 = java.nio.file.Files.createTempDirectory("statsnull").toString
    Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "c")
      .repartition(1).write.mode("overwrite").parquet(d2)
    StatsManifest.write(spark, d2, Seq("c"))
    assert(StatsManifest.prunedFiles(spark, d2, "c", 0, 10).size == 1)
    assert(StatsManifest.readRange(spark, d2, "c", 0, 10).count() == 0)
  }
}

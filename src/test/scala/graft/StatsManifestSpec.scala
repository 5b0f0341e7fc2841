package graft

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

  test("all-NULL stat columns are conservatively kept (pruning stays sound)") {
    val d2 = java.nio.file.Files.createTempDirectory("statsnull").toString
    Seq((1L, None: Option[Long]), (2L, None)).toDF("id", "c")
      .repartition(1).write.mode("overwrite").parquet(d2)
    StatsManifest.write(spark, d2, Seq("c"))
    assert(StatsManifest.prunedFiles(spark, d2, "c", 0, 10).size == 1)
    assert(StatsManifest.readRange(spark, d2, "c", 0, 10).count() == 0)
  }
}

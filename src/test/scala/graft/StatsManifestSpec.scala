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

  // ---- per-file Bloom point-lookup index ----

  private lazy val bloomDir: String = {
    val d = java.nio.file.Files.createTempDirectory("bloompt").toString
    // ids deliberately hash-scattered across files: every file's id
    // envelope spans the whole domain, so min/max pruning is useless and
    // only the Bloom can skip files
    (0L until 4000L).map(i => (i, i % 8)).toDF("id", "grp")
      .repartition(8, col("id")).write.mode("overwrite").parquet(d)
    StatsManifest.writeBloom(spark, d, "id", expectedItemsPerFile = 1024L)
    d
  }

  test("bloom point read equals full scan + IN filter, present and absent keys") {
    val keys = Seq("17", "1234", "3999", "5000000")
    val got = StatsManifest.readPoints(spark, bloomDir, "id", keys)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(17L, 1234L, 3999L),
      s"point read must equal the IN filter exactly (got ${got.toSeq})")
  }

  test("bloom pruning skips most files for a single key; absent key reads zero-ish") {
    val total = spark.read.parquet(bloomDir)
      .select(input_file_name()).distinct().count()
    assert(total == 8L)
    // no false negatives: the key's own file is always kept
    val kept = StatsManifest.pointFiles(spark, bloomDir, Seq("17"))
    assert(kept.nonEmpty && kept.size <= 2,
      s"a 1%-fpp bloom over 8 files must keep ~1 for a single key (kept ${kept.size})")
    // min/max pruning on the same layout keeps EVERYTHING — the gap the
    // bloom index exists to close
    StatsManifest.write(spark, bloomDir, Seq("id"))
    assert(StatsManifest.prunedFiles(spark, bloomDir, "id", 17L, 17L).size == 8)
    val absent = StatsManifest.pointFiles(spark, bloomDir, Seq("99999999"))
    assert(absent.size <= 1, s"absent key must prune to ~0 files (kept ${absent.size})")
    val frame = StatsManifest.readPoints(spark, bloomDir, "id", Seq("99999999"))
    assert(frame.count() == 0 && frame.columns.toSeq == Seq("id", "grp"))
  }

  test("stale bloom index (files appended) falls back to full scan") {
    val d2 = java.nio.file.Files.createTempDirectory("bloomfresh").toString
    (0L until 100L).map(i => (i, i)).toDF("id", "c")
      .repartition(2).write.mode("overwrite").parquet(d2)
    StatsManifest.writeBloom(spark, d2, "id", 64L)
    (100L until 200L).map(i => (i, i)).toDF("id", "c")
      .repartition(1).write.mode("append").parquet(d2)
    val got = StatsManifest.readPoints(spark, d2, "id", Seq("50", "150"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(50L, 150L),
      "stale bloom read must see appended rows via the fallback")
  }

  test("zero-row part files: manifest stays fresh, bloom skips them soundly") {
    // repartition by a 2-value key into 8 partitions → ≥6 empty part
    // files land on disk; a rows-derived manifest that misses them would
    // trip the freshness gate forever (root cause found in r12)
    val d2 = java.nio.file.Files.createTempDirectory("bloomempty").toString
    (0L until 100L).map(i => (i, i % 2)).toDF("id", "grp")
      .repartition(8, col("grp")).write.mode("overwrite").parquet(d2)
    val live = StatsManifest.liveDataFiles(spark, d2).toSet
    val nonEmpty = spark.read.parquet(d2)
      .select(input_file_name()).distinct().count()
    // AQE coalesces most empty shuffle partitions, but at least one
    // zero-row part file still lands — the trigger this test pins
    assert(nonEmpty < live.size,
      s"fixture must land an empty part file (live ${live.size}, nonempty $nonEmpty)")
    StatsManifest.writeBloom(spark, d2, "id", 64L)
    StatsManifest.write(spark, d2, Seq("id"))
    assert(StatsManifest.isFresh(spark, d2),
      "manifest must cover zero-row part files")
    // bloom point read takes the PRUNED path (not the fallback) and
    // never keeps a key-less file
    val kept = StatsManifest.pointFiles(spark, d2, Seq("17"))
    assert(kept.size <= 2 && kept.nonEmpty)
    val got = StatsManifest.readPoints(spark, d2, "id", Seq("17", "424242"))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(17L))
    // range read equally takes the pruned path and matches the filter
    val r = StatsManifest.readRange(spark, d2, "id", 10L, 20L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(r == (10L to 20L).toSeq)
  }

  // ---- incremental manifest refresh ----

  test("updateStats after append restores freshness and prunes the new range") {
    val d2 = java.nio.file.Files.createTempDirectory("statsupd").toString
    (0L until 100L).map(i => (i, i)).toDF("id", "c")
      .repartitionByRange(2, col("id")).write.mode("overwrite").parquet(d2)
    StatsManifest.write(spark, d2, Seq("id"))
    (100L until 200L).map(i => (i, i)).toDF("id", "c")
      .repartition(1).write.mode("append").parquet(d2)
    assert(!StatsManifest.isFresh(spark, d2))
    StatsManifest.updateStats(spark, d2, Seq("id"))
    assert(StatsManifest.isFresh(spark, d2), "update must restore freshness")
    // the appended file's envelope is in the manifest: a probe inside the
    // appended range keeps ≤2 of 3 files (1 new + possibly 1 old overlap)
    val kept = StatsManifest.prunedFiles(spark, d2, "id", 150L, 160L)
    assert(kept.size == 1, s"appended-range probe must prune to the new file (kept ${kept.size})")
    val got = StatsManifest.readRange(spark, d2, "id", 40L, 110L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (40L to 110L).toSeq)
  }

  test("updateBloom scans ONLY unseen files (old files may be unreadable) and drops vanished rows") {
    val d2 = java.nio.file.Files.createTempDirectory("bloomupd").toString
    (0L until 100L).map(i => (i, i)).toDF("id", "c")
      .repartition(2).write.mode("overwrite").parquet(d2)
    StatsManifest.writeBloom(spark, d2, "id", 64L)
    (100L until 200L).map(i => (i, i)).toDF("id", "c")
      .repartition(1).write.mode("append").parquet(d2)
    // replace one ORIGINAL part file with garbage bytes: a full rebuild
    // would crash reading it, the incremental delta must never touch it
    val victim = StatsManifest.liveDataPaths(spark, d2)
      .map(p => java.nio.file.Paths.get(new java.net.URI(p)))
      .minBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
    java.nio.file.Files.write(victim, "not parquet".getBytes)
    StatsManifest.updateBloom(spark, d2, "id", 64L)
    assert(StatsManifest.isFresh(spark, d2, StatsManifest.BloomDir))
    // the appended key is findable through the refreshed index
    val keptNew = StatsManifest.pointFiles(spark, d2, Seq("150"))
    assert(keptNew.nonEmpty && keptNew.size <= 2)
    // now vanish the corrupt file: update drops its row driver-side
    java.nio.file.Files.delete(victim)
    StatsManifest.updateBloom(spark, d2, "id", 64L)
    assert(StatsManifest.isFresh(spark, d2, StatsManifest.BloomDir))
    val got = StatsManifest.readPoints(spark, d2, "id", Seq("150", "199", "999999"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(150L, 199L))
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

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Structured Streaming paths driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyKpi: watermarked daily windows aggregate per event day") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String, Double)]
    val q = Streaming.dailyKpi(
        ms.toDF.toDF("user_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("kpi_stream")
      .outputMode("complete").start()
    try {
      ms.addData(
        (1L, ts("2026-03-01 10:00:00"), "click", 10.0),
        (2L, ts("2026-03-01 11:00:00"), "view", 30.0),
        (1L, ts("2026-03-02 09:00:00"), "click", 50.0))
      q.processAllAvailable()
      val out = spark.table("kpi_stream").collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(out("2026-03-01") == ((2L, 1L, 20.0)))
      assert(out("2026-03-02") == ((1L, 1L, 50.0)))
      // second micro-batch updates the same window
      ms.addData((3L, ts("2026-03-01 23:00:00"), "click", 20.0))
      q.processAllAvailable()
      val out2 = spark.table("kpi_stream").collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(out2("2026-03-01") == ((3L, 2L, 20.0)))
    } finally q.stop()
  }

  test("indexedAppendSink: manifests stay fresh batch over batch; pruned reads stay exact") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.io.StatsManifest
    val ms = MemoryStream[(Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("idxappend").toString
    val table = s"$dir/t"
    val q = Streaming.indexedAppendSink(
      ms.toDF.toDF("id", "v"), s"$dir/ckpt", table,
      statCols = Seq("id"), bloomKey = Some("id"),
      expectedItemsPerFile = 64L)
    try {
      ms.addData((0L until 50L).map(i => (i, i)): _*)
      q.processAllAvailable()
      assert(StatsManifest.isFresh(spark, table), "fresh after batch 0")
      assert(StatsManifest.isFresh(spark, table, StatsManifest.BloomDir))
      ms.addData((50L until 100L).map(i => (i, i)): _*)
      q.processAllAvailable()
      // no reader between batches ever needs the staleness fallback
      assert(StatsManifest.isFresh(spark, table), "fresh after batch 1")
      assert(StatsManifest.isFresh(spark, table, StatsManifest.BloomDir))
      // range read sees BOTH batches through the pruned path
      val got = StatsManifest.readRange(spark, table, "id", 40L, 60L)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == (40L to 60L).toSeq)
      // point read straddles the batches + one absent key
      val pts = StatsManifest.readPoints(spark, table, "id",
          Seq("7", "77", "7777"))
        .select("id").as[Long].collect().sorted.toSeq
      assert(pts == Seq(7L, 77L))
      // batch partitions are disjoint: the batch-1 keys prune to batch-1 files
      val kept = StatsManifest.pointFiles(spark, table, Seq("77"))
      assert(kept.nonEmpty && kept.forall(_.contains("batch_id=1")),
        s"batch-1 key must resolve to batch-1 files (kept $kept)")
    } finally q.stop()
  }

  test("incrementalDedupStream: re-crawls of persisted content never reach the sink") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the persisted corpus state: fingerprints of two already-curated docs
    val persisted = graft.ops.CurateIncremental.fingerprintTable(
      Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = Streaming.incrementalDedupStream(
      ms.toDF.toDF("doc_id", "ts", "text"), "text", "ts", persisted)
    val q = out.writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        (100L, ts("2026-03-01 10:00:00"), "alpha beta gamma delta"), // re-crawl
        (101L, ts("2026-03-01 10:01:00"), "brand new document here"),
        (102L, ts("2026-03-01 10:02:00"), "ALPHA  beta   gamma delta"), // re-crawl, noised
        (103L, ts("2026-03-01 10:03:00"), "brand new document here")) // in-stream dup
      q.processAllAvailable()
      val ids = spark.table("inc_dedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(101L), s"survivors: $ids")
      // a later micro-batch repeating survived content is still deduped
      // (watermark state), and fresh content still flows
      ms.addData(
        (104L, ts("2026-03-01 10:04:00"), "brand new document here"),
        (105L, ts("2026-03-01 10:05:00"), "another novel doc entirely"))
      q.processAllAvailable()
      val ids2 = spark.table("inc_dedup").select("doc_id").as[Long].collect().toSet
      assert(ids2 == Set(101L, 105L), s"survivors after batch 2: $ids2")
    } finally q.stop()
  }

  test("stateless sampling ops stream unchanged: weightedSample/mixtureSample on micro-batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Sampling
    import org.apache.spark.sql.functions.col
    // the md5-bucket keep tests are pure map-side expressions, so the
    // SAME operator calls used in batch apply verbatim to a stream —
    // and a row's keep/drop decision cannot depend on which micro-batch
    // delivered it (the streaming analog of partition-stability)
    val ms = MemoryStream[(Long, String, Double)]
    val filtered = Sampling.weightedSample(
      Sampling.mixtureSample(ms.toDF.toDF("doc_id", "source", "w"),
        "doc_id", "source", Map("keep" -> 1.0), defaultFraction = 1.0),
      "doc_id", col("w"))
    val q = filtered.writeStream.format("memory").queryName("samp_stream")
      .outputMode("append").start()
    try {
      val rows = (0L until 400L).map(i =>
        (i, "keep", if (i < 200) 1.0 else 0.5))
      ms.addData(rows.take(100): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(100): _*) // rest arrives in a later batch
      q.processAllAvailable()
      val kept = spark.table("samp_stream").select("doc_id").as[Long].collect().toSet
      // weight-1 rows all pass regardless of batch boundaries
      assert((0L until 200L).forall(kept), "weight-1.0 rows must all stream through")
      // weight-0.5 rows match the BATCH operator's keep set exactly
      val batchKept = Sampling.weightedSample(
        rows.toDF("doc_id", "source", "w"), "doc_id", col("w"))
        .select("doc_id").as[Long].collect().toSet
      assert(kept == batchKept, "stream and batch keep sets must be identical")
    } finally q.stop()
  }

  test("curateSink: micro-batches run the full incremental curation against persisted state") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.CurateIncremental
    val rnd = new scala.util.Random(7777)
    val stop = Seq("the", "of", "and", "is", "a", "in", "to", "it")
    val words = Seq("fox", "dog", "mill", "river", "village", "platform",
      "service", "tools", "users", "meadow", "issue", "release", "page",
      "team", "project", "result", "list", "plan", "bend", "children")
    def gen(): String =
      Seq.tabulate(24)(i => if (i % 2 == 0) stop(rnd.nextInt(stop.size))
                            else words(rnd.nextInt(words.size))).mkString(" ")
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")

    // day-0 state from a full curate (the streaming query then extends it)
    val baseTexts = Seq.fill(6)(gen())
    val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-scur-").toString
    val boot = CurateIncremental.bootstrap(base, bench, "doc_id", "text", root)
    val nBase = boot.corpus.count()
    boot.release()

    val outDir = java.nio.file.Files.createTempDirectory("graft-scur-out-")
      .toString + "/survivors"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scur-ck-").toString
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.curateSink(ms.toDF.toDF("doc_id", "text"), bench,
      "doc_id", "text", root, outDir, ckpt)
    try {
      // batch 1: an exact re-crawl of state content, a near-dup truncation
      // of state content, and a fresh doc — only the fresh doc may land
      val fresh1 = gen()
      val t0 = baseTexts(0).split(" ")
      ms.addData((100L, baseTexts(1)),
        (101L, t0.take(t0.length * 4 / 5).mkString(" ")),
        (102L, fresh1))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(102L), s"batch-1 survivors: $out1")

      // batch 2: batch 1's survivor is now persisted state — its exact
      // re-crawl and a near-dup of it both die; fresh content still flows
      val f1 = fresh1.split(" ")
      ms.addData((200L, fresh1),
        (201L, f1.take(f1.length * 4 / 5).mkString(" ")),
        (202L, gen()))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(102L, 202L), s"cumulative survivors: $out2")
    } finally q.stop()

    // the state corpus grew by exactly the landed survivors, so a batch
    // restart (or the daily batch job itself) picks up where the stream left
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.count() == nBase + 2 && st.fingerprints.count() == nBase + 2)
  }

  test("curateSink with winnowFilter: borrowers die at the persisted span probe, batch over batch") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Curate, CurateIncremental}
    val cfg = Curate.Config(winnowFilter = Some(Curate.Winnow()))
    def doc(seed: String): String =
      (0 until 12).map(i => s"$seed tok$i word${i % 5}").mkString(" ")
    def borrow(src: String, tag: String): String =
      (Seq(s"${tag}p1", s"${tag}p2", s"${tag}p3", s"${tag}p4") ++
        src.split(" ").slice(5, 19) ++
        Seq(s"${tag}s1", s"${tag}s2", s"${tag}s3", s"${tag}s4")).mkString(" ")
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val base = Seq((1L, doc("alpha")), (2L, doc("beta"))).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-swin-").toString
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root, cfg).release()

    val outDir = java.nio.file.Files.createTempDirectory("graft-swin-out-")
      .toString + "/survivors"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-swin-ck-").toString
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.curateSink(ms.toDF.toDF("doc_id", "text"), bench,
      "doc_id", "text", root, outDir, ckpt, cfg)
    try {
      // batch 1: a borrower of state content dies at the winnow probe
      // (below the near-dup Jaccard threshold — only the span stage sees
      // it); a fresh doc lands
      val fresh = doc("gamma2")
      ms.addData((100L, borrow(doc("alpha"), "bb")), (101L, fresh))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(101L), s"batch-1 survivors: $out1")

      // batch 2: batch 1's survivor is persisted — borrowing from IT dies
      ms.addData((200L, borrow(fresh, "cc")), (201L, doc("omega")))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(101L, 201L), s"cumulative survivors: $out2")
    } finally q.stop()
    // the winnow table grew with the survivors
    val st = CurateIncremental.loadState(spark, root)
    assert(st.winnowFps.nonEmpty &&
      st.winnowFps.get.select("id").distinct().count() == st.corpus.count())
  }

  private def sh3Col(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ws = split(trim(t), "\\s+")
    val len = greatest(size(ws) - 2, lit(0))
    zip_with(zip_with(slice(ws, lit(1), len), slice(ws, lit(2), len),
      (a, b) => concat(a, lit(" "), b)), slice(ws, lit(3), len),
      (ab, c) => concat(ab, lit(" "), c))
  }

  test("curateSink with entityExact: streamed batches equal the batch entity-stage curate of the union (VERDICT r15 #5)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Curate, CurateIncremental}
    val cfg = Curate.Config(nearDupThreshold = 2.0,
      entityExact = Some(Curate.EntityExact(sh3Col, 2L, 3L)))
    def doc(seed: String): String =
      (0 until 12).map(i => s"the $seed tok$i word${i % 5}").mkString(" ")
    def alias(src: String): String = src + " alias postscript marker"
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val base = Seq((1L, doc("alpha")), (2L, doc("beta"))).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-sent-").toString
    CurateIncremental.bootstrap(base, bench, "doc_id", "text", root, cfg).release()

    val outDir = java.nio.file.Files.createTempDirectory("graft-sent-out-")
      .toString + "/survivors"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sent-ck-").toString
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.curateSink(ms.toDF.toDF("doc_id", "text"), bench,
      "doc_id", "text", root, outDir, ckpt, cfg)
    val fresh1 = doc("gamma")
    val b1 = Seq((100L, alias(doc("alpha"))), (101L, fresh1))
    val b2 = Seq((200L, alias(fresh1)), (201L, doc("delta")))
    try {
      // batch 1: an entity alias of STATE content dies at the persisted
      // prefix-index probe; the fresh doc lands
      ms.addData(b1: _*)
      q.processAllAvailable()
      val out1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(101L), s"batch-1 survivors: $out1")
      // batch 2: batch 1's survivor is persisted — ITS alias dies across
      // the batch boundary; fresh content still flows
      ms.addData(b2: _*)
      q.processAllAvailable()
      val out2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(101L, 201L), s"cumulative survivors: $out2")
    } finally q.stop()

    // streamed state == one batch entity-stage curate of the union
    val union = base.unionByName(b1.toDF("doc_id", "text"))
      .unionByName(b2.toDF("doc_id", "text"))
    val full = Curate.curate(union, bench, "doc_id", "text", cfg)
    val want = full.corpus.select("doc_id").as[Long].collect().toSet
    val got = CurateIncremental.loadState(spark, root)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"streamed ($got) != batch union curate ($want)")
    full.release()

    // crash/replay no-op: re-running a delivered batch's content against
    // the state drops everything at the fingerprint probe — the state
    // stays exactly-once however often the batch re-delivers
    val replay = CurateIncremental.daily(b2.toDF("doc_id", "text"), bench,
      "doc_id", "text", root, cfg)
    assert(replay.corpus.count() == 0, "replayed batch must over-drop, never re-admit")
    replay.release()
    assert(CurateIncremental.loadState(spark, root).corpus.count() == want.size)
  }

  test("entity probe sinks: streamed pairs equal one batch probe of the union; index appends idempotent (VERDICT r15 #5)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Dedup, ExactJoinState, FuzzyJoinState}
    def doc(seed: String): String =
      (0 until 12).map(i => s"$seed tok$i word${i % 5}").mkString(" ")
    def alias(src: String): String = src + " alias postscript marker"
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .as[(Long, Long)].collect().toSet

    // ---- exact lane: base index, two streamed batches with aliases of
    // state content AND of an earlier batch's appended content
    val base = Seq((1L, doc("alpha")), (2L, doc("beta"))).toDF("doc_id", "text")
    val xroot = java.nio.file.Files.createTempDirectory("graft-xsink-").toString
    ExactJoinState.build(base, "doc_id", sh3Col(col("text")), 2L, 3L, xroot)
    val xout = java.nio.file.Files.createTempDirectory("graft-xsink-out-")
      .toString + "/pairs"
    val xckpt = java.nio.file.Files.createTempDirectory("graft-xsink-ck-").toString
    val xms = MemoryStream[(Long, String)]
    val xq = Streaming.exactEntitySink(xms.toDF.toDF("doc_id", "text"),
      "doc_id", "text", sh3Col, xroot, xout, xckpt)
    val fresh = doc("gamma")
    val xb1 = Seq((10L, alias(doc("alpha"))), (11L, fresh))
    val xb2 = Seq((20L, alias(fresh)), (21L, doc("omega")))
    try {
      xms.addData(xb1: _*); xq.processAllAvailable()
      xms.addData(xb2: _*); xq.processAllAvailable()
    } finally xq.stop()
    val streamed = canon(spark.read.parquet(xout))
    // golden: (1,10) state hit in batch 1; (11,20) cross-BATCH hit —
    // batch 1's append made doc 11 probe-able by batch 2
    assert(streamed == Set((1L, 10L), (11L, 20L)), s"streamed pairs: $streamed")
    // equivalence: one batch pair recompute over the union finds the
    // same set (base docs are mutually non-matching by construction)
    val union = base.unionByName(xb1.toDF("doc_id", "text"))
      .unionByName(xb2.toDF("doc_id", "text"))
    val batchPairs = canon(Dedup.exactJaccardPairs(
      union, "doc_id", sh3Col(col("text")), 2L, 3L))
    assert(streamed == batchPairs, s"streamed $streamed != batch $batchPairs")
    // replayed append is idempotent by id: token rows land exactly once
    val toksBefore = spark.read.parquet(s"$xroot/exact_state/tokens").count()
    ExactJoinState.append(xb2.toDF("doc_id", "text"), "doc_id",
      sh3Col(col("text")), xroot)
    assert(spark.read.parquet(s"$xroot/exact_state/tokens").count() == toksBefore,
      "replayed append must not re-land token rows")

    // ---- fuzzy lane golden: supplier-style short strings at distance 1
    val fbase = Seq((1L, "supplier-alpha-001"), (2L, "supplier-beta-002"))
      .toDF("doc_id", "text")
    val froot = java.nio.file.Files.createTempDirectory("graft-fsink-").toString
    FuzzyJoinState.build(fbase, "doc_id", "text", maxDist = 1, q = 2, froot)
    val fout = java.nio.file.Files.createTempDirectory("graft-fsink-out-")
      .toString + "/pairs"
    val fckpt = java.nio.file.Files.createTempDirectory("graft-fsink-ck-").toString
    val fms = MemoryStream[(Long, String)]
    val fq = Streaming.fuzzyEntitySink(fms.toDF.toDF("doc_id", "text"),
      "doc_id", "text", froot, fout, fckpt)
    try {
      // batch 1: one edit from state doc 1, plus a fresh name
      fms.addData((10L, "supplier-alpha-00X"), (11L, "supplier-gamma-003"))
      fq.processAllAvailable()
      // batch 2: one edit from BATCH-1's doc 11 (cross-batch), one far name
      fms.addData((20L, "supplier-gamma-00Z"), (21L, "wholesaler-delta-9"))
      fq.processAllAvailable()
    } finally fq.stop()
    val fpairs = spark.read.parquet(fout)
      .select(col("id_a"), col("id_b"), col("dist").cast("long")).as[(Long, Long, Long)].collect().toSet
    assert(fpairs == Set((1L, 10L, 1L), (11L, 20L, 1L)),
      s"fuzzy streamed pairs: $fpairs")
  }

  test("entity/scd2 sinks with autoCompact: file counts bounded for the stream's life, results bit-identical (VERDICT r16 #4)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{ExactJoinState, Scd2State, Temporal}
    def doc(seed: String): String =
      (0 until 12).map(i => s"$seed tok$i word${i % 5}").mkString(" ")
    def alias(src: String): String = src + " alias postscript marker"
    // six streamed batches, each aliasing the previous batch's fresh doc
    val freshes = (0 to 6).map(i => doc(s"g$i"))
    val batches = (1 to 6).map(i =>
      Seq((100L + i, alias(freshes(i - 1))), (200L + i, freshes(i))))
    def runExact(autoCompact: Option[Int]): (Set[(Long, Long)], Double, String) = {
      val root = java.nio.file.Files.createTempDirectory("graft-xac-").toString
      val out = java.nio.file.Files.createTempDirectory("graft-xac-o-")
        .toString + "/pairs"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-xac-c-").toString
      ExactJoinState.build(Seq((1L, freshes(0))).toDF("doc_id", "text"),
        "doc_id", sh3Col(col("text")), 2L, 3L, root)
      val ms = MemoryStream[(Long, String)]
      val q = Streaming.exactEntitySink(ms.toDF.toDF("doc_id", "text"),
        "doc_id", "text", sh3Col, root, out, ckpt, autoCompact = autoCompact)
      try batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      val pairs = spark.read.parquet(out)
        .select(least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b"))
        .as[(Long, Long)].collect().toSet
      (pairs, ExactJoinState.filesPerBucket(spark, root), root)
    }
    val (boundedPairs, boundedFpb, _) = runExact(Some(1))
    val (plainPairs, plainFpb, _) = runExact(None)
    assert(boundedPairs == plainPairs,
      s"autoCompact changed the streamed pairs:\n$boundedPairs\nvs\n$plainPairs")
    // golden content: each batch's alias pairs with the previous fresh
    assert(boundedPairs == (1 to 6).map(i =>
      (math.min(100L + i, if (i == 1) 1L else 200L + i - 1),
        math.max(100L + i, if (i == 1) 1L else 200L + i - 1))).toSet,
      s"pairs: $boundedPairs")
    assert(plainFpb > 3.0,
      s"fixture must accrue files without the knob (got $plainFpb)")
    assert(boundedFpb <= 2.0,
      s"autoCompact must bound files per bucket (got $boundedFpb)")

    // ---- scd2 lane: streamed folds with autoCompact stay bounded and
    // equal the batch collapse
    val days = (1 to 9).map(i => f"2024-02-0$i")
    val rows = days.zipWithIndex.flatMap { case (d, i) =>
      Seq((1L, d, s"a${i / 2}"), (2L, d, "x")) }
    val snaps = rows.toDF("k", "d", "attr")
      .select(col("k"), to_date(col("d")).as("d"), col("attr"))
    val sroot = java.nio.file.Files.createTempDirectory("graft-sac-").toString
    Scd2State.bootstrap(snaps.filter(col("d") === days.head),
      Seq("k"), Seq("attr"), "d", sroot, buckets = 2)
    val sckpt = java.nio.file.Files.createTempDirectory("graft-sac-c-").toString
    val sms = MemoryStream[(Long, String, String)]
    val sqy = Streaming.scd2FoldSink(
      sms.toDF.toDF("k", "d", "attr")
        .select(col("k"), to_date(col("d")).as("d"), col("attr")),
      Seq("k"), Seq("attr"), "d", sroot, sckpt, autoCompact = Some(2))
    try {
      days.tail.foreach { d =>
        sms.addData(rows.filter(_._2 == d): _*); sqy.processAllAvailable()
      }
    } finally sqy.stop()
    val got = Scd2State.intervals(spark, sroot)
      .select(col("k"), col("version"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("attr"))
      .as[(Long, Long, String, String, String)].collect().toSet
    val want = Temporal.scd2WithDeletions(snaps, Seq("k"), Seq("attr"), "d")
      .select(col("k"), col("version"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("attr"))
      .as[(Long, Long, String, String, String)].collect().toSet
    assert(got == want, s"streamed folds diverged:\n$got\nvs\n$want")
    assert(Scd2State.currentFileCount(spark, sroot) <= 3 * 2,
      "autoCompact must bound the current table's files")
    assert(Scd2State.historyDirCount(spark, sroot) <= 3,
      "autoCompact must bound the history dirs")
  }

  test("annAppendSink: exactly-once postings across batches, replays and crashes (VERDICT r16 #7)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.AnnIndex
    def vec(i: Long): Seq[Double] = {
      val raw = (0 until 16).map(j => (((i * 31 + j * 17 + 7) % 97) - 48).toDouble)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val cfg = AnnIndex.Config(nCells = 4, kmeansIters = 3, dim = 16)
    def cdf(ids: Seq[Long]) = ids.map(i => (i, vec(i))).toDF("c_id", "c_vec")
    def postingsSet(root: String) = spark.read
      .parquet(s"$root/ann_index/postings")
      .select(col("id"), col("cell")).as[(Long, Int)].collect().toSeq.sorted

    val base = cdf(1L to 40L)
    val root = java.nio.file.Files.createTempDirectory("graft-annsink-").toString
    AnnIndex.build(base, "c_id", "c_vec", root, cfg, buckets = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annsink-c-").toString
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = Streaming.annAppendSink(ms.toDF.toDF("c_id", "c_vec"),
      "c_id", "c_vec", root, ckpt, autoCompact = Some(2))
    val batches = Seq(41L to 50L, 51L to 60L, 61L to 70L)
    try {
      batches.foreach { ids =>
        ms.addData(ids.map(i => (i, vec(i))): _*)
        q.processAllAvailable()
        // probe-able after every batch: the batch's own vectors rank
        val probe = AnnIndex.topK(
          ids.take(2).map(i => (i, vec(i))).toDF("q_id", "q_vec"),
          root, k = 3, nProbes = 2)
        assert(probe.count() > 0, s"index not probe-able after batch $ids")
      }
    } finally q.stop()

    // streamed == one-shot batch append of the union, against the SAME
    // trained centroids (clone the built index, append once)
    val root2 = java.nio.file.Files.createTempDirectory("graft-annsink2-").toString
    AnnIndex.build(base, "c_id", "c_vec", root2, cfg, buckets = 2,
      trained = graft.ops.IndexStore.loadCentroids(spark,
        s"$root/ann_index/centroids"))
    AnnIndex.append(cdf(41L to 70L), "c_id", "c_vec", root2)
    assert(postingsSet(root) == postingsSet(root2),
      "streamed postings != one-shot batch append of the union")

    // a replayed (already-ledgered) batch lands ZERO new postings
    val before = postingsSet(root)
    assert(!AnnIndex.appendExactlyOnce(cdf(41L to 50L), "c_id", "c_vec",
      root, "stream-000000000"), "ledgered replay must no-op")
    assert(postingsSet(root) == before, "replay landed new postings")

    // crash between the postings append and the ledger: the next call
    // rolls the partial append back and re-lands it exactly once
    intercept[RuntimeException] {
      AnnIndex.appendExactlyOnceHooked(cdf(71L to 75L), "c_id", "c_vec",
        root, "stream-000000099", None, () => sys.error("boom before ledger"))
    }
    AnnIndex.appendExactlyOnce(cdf(71L to 75L), "c_id", "c_vec",
      root, "stream-000000099")
    val after = postingsSet(root)
    assert(after.map(_._1).count(id => id >= 71L && id <= 75L) == 5,
      s"crash replay must land the batch exactly once: $after")
  }

  test("bm25AppendSink: exactly-once postings, probes == batch over the streamed union") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Retrieval, RetrievalState}
    val words = Seq("spark", "join", "fast", "scan", "table", "window",
      "stream", "dup", "the", "vector")
    def text(i: Long): String =
      (0 until 8).map(j => words(((i * 7 + j * 3 + 1) % 10).toInt)).mkString(" ")
    def docs(ids: Seq[Long]) = ids.map(i => (i, text(i))).toDF("doc_id", "text")
    def postingsSet(root: String) = spark.read
      .parquet(s"$root/bm25_state/postings")
      .select(col("term"), col("id"), col("tf")).as[(String, Long, Long)]
      .collect().toSeq.sorted

    val root = java.nio.file.Files.createTempDirectory("graft-bmsink-").toString
    RetrievalState.build(docs(1L to 20L), "doc_id", "text", root, buckets = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bmsink-c-").toString
    val ms = MemoryStream[(Long, String)]
    val q = Streaming.bm25AppendSink(ms.toDF.toDF("doc_id", "text"),
      "doc_id", "text", root, ckpt, autoCompact = Some(2))
    val queries = Seq((1L, "dup scan"), (2L, "spark the")).toDF("query_id", "qtext")
    val batches = Seq(21L to 30L, 31L to 40L, 41L to 50L)
    try {
      batches.foreach { ids =>
        ms.addData(ids.map(i => (i, text(i))): _*)
        q.processAllAvailable()
        assert(RetrievalState.probe(queries, "query_id", "qtext", root)
          .count() > 0, s"index not probe-able after batch $ids")
      }
    } finally q.stop()

    // streamed probes == the batch face over everything streamed
    val key = Seq("query_id", "doc_id", "n_matched", "score", "rank")
    val fromState = RetrievalState.probe(queries, "query_id", "qtext", root)
      .withColumnRenamed("id", "doc_id").select(key.map(col): _*)
    val batch = Retrieval.bm25TopK(docs(1L to 50L), "doc_id", "text",
      queries, "query_id", "qtext").select(key.map(col): _*)
    assert(fromState.collect().toSet == batch.collect().toSet,
      "streamed index diverged from the batch recompute")

    // a replayed (already-ledgered) batch lands ZERO new postings
    val before = postingsSet(root)
    assert(!RetrievalState.appendExactlyOnce(docs(21L to 30L),
      "doc_id", "text", root, "stream-000000000"), "ledgered replay must no-op")
    assert(postingsSet(root) == before, "replay landed new postings")

    // autoCompact held the stream's postings file count bounded
    assert(RetrievalState.filesPerBucket(spark, root) <= 2.0,
      s"autoCompact must bound files: ${RetrievalState.filesPerBucket(spark, root)}")
  }

  test("curateSink with vecCol: micro-batches run the embedding stage against persisted state") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.CurateIncremental
    val ecfg = CurateIncremental.EmbedConfig(threshold = 0.99, dim = 16)
    // deterministic far-apart vectors (periodic mod 19 — keep generator
    // indices' residues distinct); a planted near-dup is a scalar multiple
    def vec(i: Long): Seq[Double] =
      (0 until 16).map(j => (((i * 31 + j * 17 + 7) % 19) - 9).toDouble / 9.0)
    def jitter(v: Seq[Double]): Seq[Double] = v.map(_ * 1.0009765625)
    val rnd = new scala.util.Random(4242)
    val words = Seq("fox", "dog", "mill", "river", "village", "platform",
      "service", "tools", "users", "meadow", "issue", "release", "page",
      "team", "project", "result", "list", "plan", "bend", "children")
    def gen(): String =
      Seq.tabulate(24)(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val bench = Seq((999L, "holdout alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")

    val base = (1L to 4L).map(i => (i, gen())).toDF("doc_id", "text")
    val baseVecs = (1L to 4L).map(i => (i, vec(i))).toDF("doc_id", "v")
    val root = java.nio.file.Files.createTempDirectory("graft-scurv-").toString
    val boot = CurateIncremental.bootstrap(base, bench, "doc_id", "text", root,
      graft.ops.Curate.Config(), vecs = Some(baseVecs), ecfg = ecfg)
    val nBase = boot.corpus.count()
    boot.release()

    val outDir = java.nio.file.Files.createTempDirectory("graft-scurv-out-")
      .toString + "/survivors"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scurv-ck-").toString
    val ms = MemoryStream[(Long, String, Seq[Double])]
    val q = Streaming.curateSink(ms.toDF.toDF("doc_id", "text", "v"), bench,
      "doc_id", "text", root, outDir, ckpt,
      vecCol = Some("v"), ecfg = ecfg)
    try {
      // batch 1: fresh text whose vector jitters state doc 2's (only the
      // embedding probe can kill it) + a genuinely fresh doc
      ms.addData((100L, gen(), jitter(vec(2))), (101L, gen(), vec(7)))
      q.processAllAvailable()
      val out1 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(101L), s"batch-1 survivors: $out1")

      // batch 2: batch 1's survivor vector is now persisted state — its
      // jitter dies; fresh content still flows
      ms.addData((200L, gen(), jitter(vec(7))), (201L, gen(), vec(8)))
      q.processAllAvailable()
      val out2 = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(101L, 201L), s"cumulative survivors: $out2")
    } finally q.stop()

    // corpus and embedding tables grew in lockstep with the landed survivors
    val st = CurateIncremental.loadState(spark, root)
    assert(st.corpus.count() == nBase + 2 && st.embeddings.get.count() == nBase + 2)
  }

  test("rawFileStream: new raw-zone files arrive as micro-batches") {
    val cfg = MovieFixtures.tempConfig()
    val stream = Streaming.rawFileStream(spark, cfg.rawRoot, "omdb", "ratings",
        graft.model.Schemas.omdbSchema, maxFilesPerTrigger = 2)
      .filter(org.apache.spark.sql.functions.col("data.Response") === "True")
    val q = stream.writeStream.format("memory").queryName("raw_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // fixture zone has 3 Response=True docs (multiLine files are single
      // JSON objects; the stream reads them as one record each)
      val n0 = spark.table("raw_stream").count()
      assert(n0 == 3, s"expected 3 enveloped docs, got $n0")
      // a late-arriving file is picked up incrementally
      val d = java.nio.file.Paths.get(cfg.rawRoot, "omdb", "ratings",
        s"date=${MovieFixtures.SnapshotDate}")
      java.nio.file.Files.writeString(d.resolve("tt7777.json"),
        """{"_meta":{"snapshot_date":"2026-02-18","run_id":"r","extracted_at_utc":"t","source":"omdb","endpoint":"ratings"},"data":{"Response":"True","Title":"Late","imdbRating":"5.0","imdbVotes":"1","Metascore":"50","Rated":"R","Type":"movie","Year":"2020","Country":"US","Genre":"G","Director":"D","Actors":"A","Ratings":[]}}""")
      q.processAllAvailable()
      assert(spark.table("raw_stream").count() == 4)
      // batch parity (review r12): _src_file rides the stream (the
      // Staging transforms select it; OMDb keys on the file stem) …
      assert(spark.table("raw_stream").columns.contains("_src_file"))
      assert(spark.table("raw_stream")
        .filter(graft.io.RawZone.srcFileStem === "tt7777").count() == 1,
        "file stem must be derivable from the streamed _src_file")
      // … and a corrupt file is DROPPED, not surfaced as an all-null row
      java.nio.file.Files.writeString(d.resolve("corrupt.json"),
        """{"_meta": {"snapshot_date": truncated-garbage""")
      q.processAllAvailable()
      assert(spark.table("raw_stream").count() == 4,
        "corrupt raw file must be isolated exactly like the batch reader")
    } finally q.stop()
  }

  test("esSink: micro-batches bulk-index over live HTTP; mapping bootstrapped once") {
    import org.apache.spark.sql.functions._
    FakeEs.withEs { (base, es) =>
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft_es_stream").toString
      val ms = MemoryStream[(String, Long, Double)]
      val stream = ms.toDF.toDF("day", "tmdb_id", "imdb_rating")
        .select(to_date(col("day")).as("snapshot_date"),
          col("tmdb_id"), col("imdb_rating"))
      val q = Streaming.esSink(stream, s"$dir/ckpt", "movies_enriched_daily",
        idCols = Seq("snapshot_date", "tmdb_id"),
        spec = graft.io.ServingSink.movieFieldSpec,
        cfg = graft.io.EsTransport.Config(base))
      try {
        ms.addData(("2026-03-01", 101L, 7.5), ("2026-03-01", 102L, 6.0))
        q.processAllAvailable()
        // mapping bootstrapped over the wire, docs bulked from executors
        assert(es.indexes.keySet == Set("movies_enriched_daily"))
        val lines1 = es.bulks.flatMap(_.split("\n").filter(_.nonEmpty))
        assert(lines1.count(_.startsWith("""{"index":""")) == 2)
        assert(lines1.exists(_.contains(""""_id":"2026-03-01_101"""")))
        // a second batch re-bulks without re-PUTting the mapping; a
        // redelivered key writes the SAME stable _id (ES-side upsert)
        es.indexes("movies_enriched_daily") = "sentinel"
        ms.addData(("2026-03-01", 101L, 9.9), ("2026-03-02", 103L, 5.0))
        q.processAllAvailable()
        assert(es.indexes("movies_enriched_daily") == "sentinel") // no re-PUT
        val lines2 = es.bulks.flatMap(_.split("\n").filter(_.nonEmpty))
        assert(lines2.count(_.startsWith("""{"index":""")) == 4)
        assert(lines2.count(_.contains(""""_id":"2026-03-01_101"""")) == 2)
      } finally q.stop()
    }
  }

  test("lakeSink: streaming micro-batches merge-upsert into the lake zones") {
    import org.apache.spark.sql.functions._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_stream").toString
    val ms = MemoryStream[(String, Long, Double, Timestamp)]
    val stream = ms.toDF.toDF("day", "user_id", "value", "ts")
      .select(to_date(col("day")).as("snapshot_date"),
        col("user_id"), col("value"), col("ts"))
    val q = Streaming.lakeSink(stream, s"$dir/ckpt", s"$dir/lake", "usage",
      "user_latest", keys = Seq("user_id"), order = Seq(col("ts").desc),
      outputMode = "append")
    try {
      ms.addData(
        ("2026-03-01", 1L, 1.0, ts("2026-03-01 10:00:00")),
        ("2026-03-01", 2L, 2.0, ts("2026-03-01 11:00:00")))
      q.processAllAvailable()
      // a later batch updates user 1 and opens a second day; user 2's row
      // must survive the rewrite of day 1 (merge, not clobber)
      ms.addData(
        ("2026-03-01", 1L, 9.0, ts("2026-03-01 12:00:00")),
        ("2026-03-02", 3L, 3.0, ts("2026-03-02 09:00:00")))
      q.processAllAvailable()
      val out = io.LakeZones.readTable(spark, s"$dir/lake", "usage", "user_latest")
        .select(col("snapshot_date").cast("string"), col("user_id"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(out == Map(
        ("2026-03-01", 1L) -> 9.0,
        ("2026-03-01", 2L) -> 2.0,
        ("2026-03-02", 3L) -> 3.0))
      // within-batch LWW: an older duplicate key in one batch never wins
      ms.addData(
        ("2026-03-02", 3L, 7.0, ts("2026-03-02 11:00:00")),
        ("2026-03-02", 3L, 5.0, ts("2026-03-02 10:00:00")))
      q.processAllAvailable()
      val day2 = io.LakeZones.readTable(spark, s"$dir/lake", "usage", "user_latest")
        .filter(col("snapshot_date") === "2026-03-02")
        .select("value").collect().map(_.getDouble(0)).toSeq
      assert(day2 == Seq(7.0))
    } finally q.stop()
  }

  test("driftSink: per-batch drift reports equal the batch recompute, replay-keyed") {
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val reference = Seq(10L, 20L, 80L, 160L, 170L).toDF("v")
    val outDir = java.nio.file.Files.createTempDirectory("drift-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drift-ckpt").toString
    val q = Streaming.driftSink(ms.toDF.toDF("v"), "v", reference,
      bucketWidth = 75L, nBuckets = 4, outDir = outDir, checkpointDir = ckpt)
    try {
      ms.addData(12L, 90L)           // batch 0
      q.processAllAvailable()
      ms.addData(500L, 600L, 700L)   // batch 1: all clamp to the top bucket
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      assert(got.select("batch_id").distinct().count() == 2)
      for ((bid, data) <- Seq(0L -> Seq(12L, 90L), 1L -> Seq(500L, 600L, 700L))) {
        val want = graft.ops.Monitor
          .histogramDrift(reference, data.toDF("v"), "v", 75L, 4)
          .orderBy("bucket").collect().toSeq
        val rows = got.filter(col("batch_id") === bid)
          .select("bucket", "c_a", "c_b", "gap_num", "gap_ppm")
          .orderBy("bucket").collect().toSeq
        assert(rows == want, s"batch $bid report != batch recompute")
      }
    } finally q.stop()
  }

  test("scd2FoldSink: streamed daily snapshots equal the one-shot batch collapse") {
    import org.apache.spark.sql.functions.{col, to_date}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val root = java.nio.file.Files.createTempDirectory("scd2sink-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scd2sink-ckpt").toString
    // key 1 extends, key 2 changes attrs, key 3 vanishes then returns
    // identical (the gap must split its version), key 4 is born late
    val all = Seq(
      (1L, "2024-01-01", "a"), (2L, "2024-01-01", "x"), (3L, "2024-01-01", "m"),
      (1L, "2024-01-02", "a"), (2L, "2024-01-02", "y"),
      (1L, "2024-01-03", "a"), (2L, "2024-01-03", "y"), (3L, "2024-01-03", "m"),
      (4L, "2024-01-03", "q"))
    def snaps(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "d", "attr").select(col("k"),
        to_date(col("d")).as("d"), col("attr"))
    // day 0 bootstraps the state; the stream then delivers day 1 AND a
    // replay of day 0 in one batch (ledger no-op), day 2 in the next
    graft.ops.Scd2State.bootstrap(snaps(all.filter(_._2 == "2024-01-01")),
      Seq("k"), Seq("attr"), "d", root, buckets = 4)
    val q = Streaming.scd2FoldSink(
      ms.toDF.toDF("k", "d", "attr")
        .select(col("k"), to_date(col("d")).as("d"), col("attr")),
      Seq("k"), Seq("attr"), "d", root, ckpt)
    try {
      ms.addData(all.filter(r => r._2 <= "2024-01-02"): _*) // day 0 replay + day 1
      q.processAllAvailable()
      ms.addData(all.filter(_._2 == "2024-01-03"): _*)
      q.processAllAvailable()
    } finally q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("version"), col("valid_from").cast("string"),
          col("valid_to").cast("string"), col("nb_snapshots"), col("attr"))
        .as[(Long, Long, String, String, Long, String)].collect().sorted.toSeq
    val got = norm(graft.ops.Scd2State.intervals(spark, root))
    val want = norm(graft.ops.Temporal.scd2WithDeletions(
      snaps(all), Seq("k"), Seq("attr"), "d"))
    assert(got == want, s"streamed folds ($got) != batch collapse ($want)")
    assert(got.filter(_._1 == 3L).map(_._2).sorted == Seq(1L, 2L),
      "the gap must split key 3's version across the stream")
  }

  test("quantileDriftSink: per-batch quantile drift equals the batch recompute") {
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val reference = Seq(("web", 100L), ("web", 120L), ("web", 900L),
      ("pdf", 40L), ("pdf", 50L)).toDF("src", "v")
    val outDir = java.nio.file.Files.createTempDirectory("qdrift-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("qdrift-ckpt").toString
    val quants = Seq(("p50", 1L, 2L), ("p90", 9L, 10L))
    val q = Streaming.quantileDriftSink(ms.toDF.toDF("src", "v"), "src", "v",
      reference, quants, outDir = outDir, checkpointDir = ckpt)
    val b0 = Seq(("web", 110L), ("web", 130L), ("pdf", 45L))
    val b1 = Seq(("web", 4000L), ("web", 5000L)) // 4x-length crawler change
    try {
      ms.addData(b0: _*); q.processAllAvailable()
      ms.addData(b1: _*); q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      assert(got.select("batch_id").distinct().count() == 2)
      for ((bid, data) <- Seq(0L -> b0, 1L -> b1)) {
        val want = graft.ops.Monitor
          .quantileDrift(reference, data.toDF("src", "v"), "src", col("v"), quants)
          .orderBy("src").collect().toSeq
        val rows = got.filter(col("batch_id") === bid)
          .select("src", "p50_a", "p90_a", "p50_b", "p90_b",
            "p50_shift", "p90_shift")
          .orderBy("src").collect().toSeq
        assert(rows == want, s"batch $bid quantile report != batch recompute")
      }
      // the drifted batch flags the planted source: p50 jumped octaves
      val drifted = got.filter(col("batch_id") === 1L && col("src") === "web")
        .select("p50_shift").collect().head.getLong(0)
      assert(drifted > 0, s"planted 4x shift must surface (got $drifted)")
    } finally q.stop()
  }

  test("embedDriftSink: per-batch embedding drift equals the batch recompute") {
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Double])]
    val reference = (0 until 30).map(i => i.toLong -> Seq(0.1 * (i % 5), 1.0))
      .toDF("id", "v")
    val outDir = java.nio.file.Files.createTempDirectory("edrift-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("edrift-ckpt").toString
    val q = Streaming.embedDriftSink(ms.toDF.toDF("id", "v"), "v", reference,
      outDir = outDir, checkpointDir = ckpt)
    val b0 = Seq(100L -> Seq(0.2, 1.0), 101L -> Seq(0.3, 1.0))
    val b1 = Seq(200L -> Seq(5.0, 1.0), 201L -> Seq(6.0, 1.0)) // drifted dim 0
    try {
      ms.addData(b0: _*); q.processAllAvailable()
      ms.addData(b1: _*); q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      assert(got.select("batch_id").distinct().count() == 2)
      for ((bid, data) <- Seq(0L -> b0, 1L -> b1)) {
        val want = graft.ops.Monitor
          .embeddingDrift(reference, data.toDF("id", "v"), "v")
          .orderBy("i").collect().toSeq
        val rows = got.filter(col("batch_id") === bid)
          .select("i", "n_a", "s1_a", "s2_a", "n_b", "s1_b", "s2_b",
            "mean_a", "mean_b", "mean_shift", "shift_z")
          .orderBy("i").collect().toSeq
        assert(rows == want, s"batch $bid embedding-drift != batch recompute")
      }
    } finally q.stop()
  }

  test("dsirProfileSink: streamed batches fold into the profile the batch pass would build") {
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val root = java.nio.file.Files.createTempDirectory("dsirsink-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dsirsink-ckpt").toString
    val all = Seq(
      (1L, "the patient received the treatment"),
      (2L, "clinical trial results show improvement"),
      (3L, "the diagnosis confirmed the therapy"))
    val q = Streaming.dsirProfileSink(
      ms.toDF.toDF("doc_id", "text"), "text", root, ckpt)
    try {
      ms.addData(all.take(2): _*); q.processAllAvailable()
      ms.addData(all.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val fromState = graft.ops.Sketches.readState(spark, root)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val oneShot = graft.ops.Sampling
      .hashedNgramCounts(all.toDF("doc_id", "text"), "text")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(fromState == oneShot,
      s"streamed profile must equal the batch profile: $fromState vs $oneShot")
    // takedown: the ledgered negative fold leaves the survivors' profile
    graft.ops.Sampling.dsirProfileRemoveState(spark, root,
      all.take(1).toDF("doc_id", "text"), "text", "takedown-1")
    graft.ops.Sampling.dsirProfileRemoveState(spark, root,
      all.take(1).toDF("doc_id", "text"), "text", "takedown-1") // replay no-op
    val afterRemove = graft.ops.Sketches.readState(spark, root)
      .filter(col("cnt") =!= 0L)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    val survivors = graft.ops.Sampling
      .hashedNgramCounts(all.drop(1).toDF("doc_id", "text"), "text")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(afterRemove == survivors,
      s"negative fold must leave the survivors' profile: $afterRemove vs $survivors")
  }

  test("enrichStream: static dim joins each micro-batch, misses flagged") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = Streaming.enrichStream(
        ms.toDF.toDF("user_id", "value"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      ms.addData((1L, 10.0), (3L, 20.0))
      q.processAllAvailable()
      val out = spark.table("enriched_stream").collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getAs[String]("tier")), r.getAs[Boolean]("missing_dim"))))
        .toMap
      assert(out(1L) == ((Some("gold"), false)))
      assert(out(3L) == ((None, true))) // no dim row: flagged, not dropped
    } finally q.stop()
  }

  test("attributionJoin: clicks match impressions within the delay window only") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val joined = Streaming.attributionJoin(
      imps.toDF.toDF("ad_id", "ts"), clks.toDF.toDF("ad_id", "ts"),
      key = "ad_id", maxDelay = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2026-03-01 10:00:00")), (2L, ts("2026-03-01 10:00:00")))
      clks.addData(
        (1L, ts("2026-03-01 10:30:00")), // within 1 h of impression 1 → match
        (1L, ts("2026-03-01 12:30:00")), // same key, beyond the window → no
        (3L, ts("2026-03-01 10:15:00"))) // no impression for this key → no
      q.processAllAvailable()
      val out = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).toString))
      assert(out.toSeq == Seq((1L, "2026-03-01 10:30:00.0")), out.mkString(","))
    } finally q.stop()
  }

  test("sessionize: gap sessions close on event-time timeout, split on gap") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streaming.sessionize(ms.toDS(), gapMs = 30 * 60 * 1000L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session); user 2: one event
      ms.addData(
        Event(1L, ts("2026-03-01 10:00:00"), "click", 1.0),
        Event(1L, ts("2026-03-01 10:10:00"), "view", 2.0),
        Event(2L, ts("2026-03-01 10:05:00"), "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet
      // user 1 again 2 h later: splits into a NEW session (gap > 30 min);
      // this also advances the watermark past both old sessions' timeouts
      ms.addData(Event(1L, ts("2026-03-01 12:10:00"), "click", 4.0))
      q.processAllAvailable()
      // one more nudge so the timeout fires in a subsequent micro-batch
      ms.addData(Event(9L, ts("2026-03-01 14:00:00"), "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getInt(3))).toSet
      assert(out.contains((1L, "2026-03-01 10:00:00.0", "2026-03-01 10:10:00.0", 2)),
        out.toString)
      assert(out.contains((2L, "2026-03-01 10:05:00.0", "2026-03-01 10:05:00.0", 1)),
        out.toString)
    } finally q.stop()
  }

  test("sessionize: cross-batch out-of-order events extend the session start, not absorb blindly") {
    // review r12: the old merge test `ts − end ≤ gap` was vacuously true
    // for ANY event before the session end, silently absorbing events
    // arbitrarily far in the past and never moving `start`
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streaming.sessionize(ms.toDS(), gapMs = 30 * 60 * 1000L,
        watermark = "10 hours") // nothing below is late
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      ms.addData(Event(1L, ts("2026-03-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      // batch 2, out of order: 09:50 is within gap BEFORE the session
      // start → must merge and extend start backward; 07:00 is far
      // before any reachable window → its own immediate single session
      ms.addData(
        Event(1L, ts("2026-03-01 09:50:00"), "view", 2.0),
        Event(1L, ts("2026-03-01 07:00:00"), "stray", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to time the open session out
      ms.addData(Event(9L, ts("2026-03-02 23:00:00"), "click", 0.0))
      q.processAllAvailable()
      ms.addData(Event(9L, ts("2026-03-03 23:00:00"), "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sessions_ooo").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getInt(3))).toSet
      assert(out.contains((1L, "2026-03-01 07:00:00.0", "2026-03-01 07:00:00.0", 1)),
        s"far-out-of-order event must close as its own session: $out")
      assert(out.contains((1L, "2026-03-01 09:50:00.0", "2026-03-01 10:00:00.0", 2)),
        s"near-out-of-order event must extend the session start backward: $out")
    } finally q.stop()
  }

  test("latestPerUser: keyed state keeps the newest event across batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streaming.latestPerUser(ms.toDS())
      .writeStream.format("memory").queryName("lww_stream")
      .outputMode("update").start()
    try {
      ms.addData(
        Event(1L, ts("2026-03-01 10:00:00"), "click", 1.0),
        Event(1L, ts("2026-03-01 12:00:00"), "view", 2.0))
      q.processAllAvailable()
      // older event in a LATER batch must not displace the state
      ms.addData(Event(1L, ts("2026-03-01 11:00:00"), "error", 9.0))
      q.processAllAvailable()
      val rows = spark.table("lww_stream").as[Event].collect()
      val last = rows.last // update-mode emits per batch; final emit wins
      assert(last.ts == ts("2026-03-01 12:00:00") && last.event_type == "view")
    } finally q.stop()
  }

  test("kmvDistinctStream: sketch state matches the batch operator after every prefix") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.ops.Sketches
    val k = 16
    val ms = MemoryStream[(String, String)]
    val q = Streaming.kmvDistinctStream(ms.toDF.toDF("g", "v"), "g", col("v"), k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    // the batch operator over the same prefix is the oracle here
    def batchRow(rows: Seq[(String, String)], g: String) = {
      val r = Sketches.kmvDistinct(rows.toDF("g", "v"), "g", col("v"), k)
        .filter(col("g") === g).collect()(0)
      (r.getAs[Long]("k_used"), r.getAs[Long]("kth_min"),
        r.getAs[Double]("est_distinct"))
    }
    val b1 = (0 until 100).map(i => ("a", s"v$i")) ++
      (0 until 5).map(i => ("b", s"w$i")) // "b" stays below k: exact branch
    val b2 = (50 until 150).map(i => ("a", s"v$i")) // half-overlapping delta
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      val rows1 = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      for (g <- Seq("a", "b")) {
        val last = rows1.filter(_._1 == g).last
        assert((last._2.toLong, last._3, last._4) == batchRow(b1, g),
          s"group $g diverges from the batch sketch after batch 1")
      }
      ms.addData(b2: _*)
      q.processAllAvailable()
      val rows2 = spark.table("kmv_stream").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      val last = rows2.filter(_._1 == "a").last
      assert((last._2.toLong, last._3, last._4) == batchRow(b1 ++ b2, "a"),
        "group a diverges from the batch sketch after batch 2")
    } finally q.stop()
  }
}

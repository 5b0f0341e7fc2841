package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line consumed by the driver.
  *
  * Measurement rules (VERDICT r1 fixes):
  *  - every query executes through the `noop` sink, so the full physical
  *    plan runs (a bare `.count()` lets Catalyst prune projections and
  *    drop sorts, under-measuring expression-heavy queries);
  *  - a warm-up pass over all queries absorbs JVM/codegen/parquet-footer
  *    warmup so per-query timings are steady-state and comparable
  *    round-over-round;
  *  - failures are reported per-query in an "errors" object instead of
  *    being swallowed into a fake timing.
  *
  * r7: the JSON also carries per-query shuffle READ/WRITE bytes
  * (`"shuffle":{"q01…":{"read":N,"write":N},…}`), captured on the
  * warm-up pass via a stage-metrics listener — shuffle bytes are
  * deterministic on this corpus (PERF.md §scale-stress measured
  * identical bytes across runs) where wall carries up to ~7× VM noise,
  * so a round-over-round regression is attributable from the BENCH file
  * alone: bytes moved → the plan changed; bytes flat → it's the host.
  * Only the warm-up pass pays the listener-drain waits; timed passes
  * are untouched.
  */
object Bench {

  private class ShuffleMetrics extends org.apache.spark.scheduler.SparkListener {
    @volatile var read = 0L
    @volatile var written = 0L
    @volatile var submitted = 0L
    @volatile var completed = 0L
    override def onStageSubmitted(
        ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
      submitted += 1
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read += m.shuffleReadMetrics.totalBytesRead
        written += m.shuffleWriteMetrics.bytesWritten
      }
      completed += 1
    }
    /** Poll until every submitted stage has completed AND the async bus
      * has gone quiet (counters stable for one interval) — the balance
      * check catches a straggler stage that would otherwise get its
      * bytes attributed to the NEXT query. Bounded; a timeout with
      * unbalanced counts is LOGGED so a silently-skewed byte map cannot
      * masquerade as a clean run. */
    def drain(): Unit = {
      var last = (-1L, -1L, -1L, -1L)
      var waited = 0
      while (((read, written, submitted, completed) != last || submitted != completed)
        && waited < 10000) {
        last = (read, written, submitted, completed)
        Thread.sleep(50)
        waited += 50
      }
      if (submitted != completed)
        System.err.println(s"[bench] drain timeout after ${waited}ms with " +
          s"$submitted stages submitted vs $completed completed — the next " +
          "query's shuffle bytes may include this straggler")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // product path installs the library's Catalyst extensions: the
      // stacked-dedup collapse rule + the graft_simhash64 SQL function
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The harness keeps only a ~2 KB tail of the combined output, and the
    // q64/q73 localCheckpoints make MapPartitionsRDD/CacheManager WARN
    // ("locally checkpointed, lineage truncated") the dominant tail
    // content — one burst after the bench line would push it out of the
    // capture window entirely. These warnings are expected on every run
    // (the checkpoints are deliberate), so they carry zero signal here:
    // pin the three chatty loggers to ERROR for the bench session only.
    Seq("org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.sql.execution.CacheManager",
        "org.apache.spark.util.SparkStringUtils").foreach { l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR)
    }

    // Testdata fingerprint (VERDICT r13 #3): the driver regenerates
    // /root/testdata between some rounds, which silently invalidates any
    // cross-round byte comparison (r12→r13 produced 44 spurious flags).
    // Record per-table row counts plus a content digest (md5 over each
    // file's name, length, and first/last 4 KiB — parquet footers carry
    // content stats, so any regen flips it) so CompareBench can DETECT a
    // regen and scope itself out instead of flagging noise.
    val dataFp: String = try {
      val dir = new java.io.File(sfDir)
      val files = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
      val md = java.security.MessageDigest.getInstance("MD5")
      files.foreach { f =>
        md.update(f.getName.getBytes("UTF-8"))
        md.update(f.length().toString.getBytes("UTF-8"))
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val head = new Array[Byte](math.min(4096L, f.length()).toInt)
          raf.readFully(head); md.update(head)
          if (f.length() > 4096) {
            raf.seek(math.max(0L, f.length() - 4096))
            val tail = new Array[Byte](math.min(4096L, f.length()).toInt)
            raf.readFully(tail); md.update(tail)
          }
        } finally raf.close()
      }
      val digest = md.digest().map("%02x".format(_)).mkString
      val rows = files.map { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        s""""${f.getName.stripSuffix(".parquet")}":$n"""
      }.mkString("{", ",", "}")
      s"""{"digest":"$digest","rows":$rows}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] testdata fingerprint failed: ${e.getMessage}")
      """{"digest":"unavailable","rows":{}}"""
    }

    def runOnce(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }

    // SPARK_GRAFT_ONLY=q73,q40 benches just the named (prefix-matched)
    // queries — the profiling loop for a single regression
    // VERDICT r15 #4: the per-lane incremental macros are ORACLE-ONLY
    // rows — graft.Verify + the DuckDB oracle still gate every one of
    // them at sf0.01, but the bench prices the composite daily ONCE,
    // through q150_multilane_daily (the same exact/entity/quality/DSIR/
    // embedding lanes over one cloned state at FULL scale). Re-pricing
    // each lane's clone+daily scaffold separately grew the bench
    // ~20 s/round while measuring the same fixed cost: profiled
    // (tools/ProfileQuery), a composite daily's wall is ~90% per-job
    // overhead, not data — q150 at sf0.01 runs 368 jobs whose summed
    // task time is ~7 s of 32-core compute under a ~28 s daily wall,
    // and its wall is IDENTICAL at sf0.1 (26.5 s) — so each demoted
    // macro re-priced ~the same scaffold. SPARK_GRAFT_ONLY still
    // benches any of them explicitly when a single lane needs
    // profiling.
    val oracleOnly = Set("q135_entity_stage", "q138_entity_incremental",
      "q144_embed_entity_daily", "q149_dsir_recipe")
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(f) =>
        val want = f.split(",").map(_.trim).filter(_.nonEmpty)
        allNames.filter(n => want.exists(n.startsWith))
      case None => allNames.filterNot(oracleOnly)
    }
    // Lifecycle macro-benchmarks re-run a ~1 min 30-day backfill per
    // invocation; warm-up + min-of-2 would triple that for a noise
    // robustness their signal (day-count × per-day overhead) doesn't
    // need. They run ONCE: one timed pass — with the shuffle listener
    // capturing THAT pass (VERDICT r13 #2: bytes are run-invariant, so
    // the single timed pass serves both; the drains sit outside the
    // per-query timer, so only this macro's wall absorbs their waits —
    // and without this the catalog's most expensive query was the one
    // outside the byte-scoped regression gate).
    val singlePass = Set("q82_backfill_days")
    // warm-up: JVM, codegen, parquet footers, page cache — and the
    // shuffle-byte capture (bytes are run-invariant, so the warm pass is
    // as good as a timed one and keeps drain waits off the timings)
    val metrics = new ShuffleMetrics
    spark.sparkContext.addSparkListener(metrics)
    val shuffleBytes = scala.collection.mutable.Map[String, (Boolean, Long, Long)]()
    names.filterNot(singlePass).foreach { n =>
      metrics.drain()
      val (r0, w0) = (metrics.read, metrics.written)
      val ok = runOnce(n).isRight
      metrics.drain()
      shuffleBytes(n) = (ok, metrics.read - r0, metrics.written - w0)
    }
    // two timed passes, keep the min — the host's multi-core throughput is
    // noisy (PERF.md), and min-of-n is the standard noise-robust statistic.
    // The listener stays attached (accumulating counters costs nothing);
    // single-pass macros capture their bytes here, on their only pass.
    val pass1 = names.map { n =>
      if (!singlePass(n)) n -> runOnce(n)
      else {
        metrics.drain()
        val (r0, w0) = (metrics.read, metrics.written)
        val r = runOnce(n)
        metrics.drain()
        shuffleBytes(n) = (r.isRight, metrics.read - r0, metrics.written - w0)
        n -> r
      }
    }.toMap
    spark.sparkContext.removeSparkListener(metrics)
    val results = names.map { n =>
      if (singlePass(n)) n -> pass1(n)
      else {
        val r2 = runOnce(n)
        n -> ((pass1(n), r2) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Right(a), Left(_)) => Right(a)
          case (_, b) => b
        })
      }
    }

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    // The harness stores only a ~2000-char tail of stdout (BENCH_r08/r09:
    // "parsed": null both rounds) — a 75-query line with the full shuffle
    // map is ~8 KB and never survives. The PRINTED line is therefore
    // compact: qNN keys (names share no prefix collisions; guarded below),
    // millisecond-rounded seconds, no shuffle map. The full-fidelity JSON
    // (full names, full precision, per-query shuffle bytes, errors) goes to
    // bench_full.json in the working directory for CompareBench / triage.
    val short: Map[String, String] = {
      val pref = names.map(n => n -> n.takeWhile(_ != '_')).toMap
      val collide = pref.values.groupBy(identity).collect { case (p, g) if g.size > 1 => p }.toSet
      pref.map { case (n, p) => n -> (if (collide(p)) n else p) }
    }
    def sec3(v: Double): String = f"$v%.3f"
    val qs = results.collect { case (k, Right(v)) => s""""${esc(short(k))}":${sec3(v)}""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(e)) => s""""${esc(short(k))}":"${esc(e.take(80))}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val fullQs = results.collect { case (k, Right(v)) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val fullErrs = results.collect { case (k, Left(e)) => s""""${esc(k)}":"${esc(e)}"""" }
      .mkString("{", ",", "}")
    val shuffle = names.flatMap { n =>
      shuffleBytes.get(n).collect { case (true, r, w) =>
        s""""${esc(n)}":{"read":$r,"write":$w}"""
      }
    }.mkString("{", ",", "}")
    // r18-opt (VERDICT r17 #2): emit the session's core count and
    // effective default parallelism so the driver's core-scaling probe
    // can read WHAT the bench ran with from the line itself — the
    // testdata parquets are single-row-group, so scans are 1 partition
    // at any core count and most sf0.1 queries are fixed-overhead-bound;
    // these fields make that attributable instead of suspicious.
    val parInfo = s""""cpus":$cpus,"parallelism":${spark.sparkContext.defaultParallelism}"""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec",$parInfo,"queries":$fullQs,"errors":$fullErrs,"shuffle":$shuffle,"data":$dataFp,"sf":"${esc(sfDir)}"}"""
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
      System.err.println(s"[bench] full per-query JSON (incl. shuffle bytes) -> ${new java.io.File("bench_full.json").getAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_full.json: ${e.getMessage}")
    }
    // Stop Spark BEFORE printing: shutdown emits its own log burst, and
    // the compact line must be the LAST thing in the ~2 KB tail capture.
    // Printed on BOTH streams so it survives whichever one the harness
    // tails (stderr is where sbt routes the JVM's log noise — a stdout-
    // only line can lose the window to interleaved stderr).
    spark.stop()
    val line = s"""{"metric":"total","value":${sec3(total)},"unit":"sec",$parInfo,"queries":$qs,"errors":$errs,"sf":"${esc(sfDir)}"}"""
    // VERDICT r12 #6: wall is host-noisy (byte-identical plans have
    // swung ±50% round-over-round) — the FILE copy of the bench line
    // also carries per-query shuffle-read bytes (qNN keys, captured on
    // the warm-up pass) so a regression call can be byte-scoped from
    // BENCH_rNN alone. Only the file grows; the PRINTED line below stays
    // inside the harness's ~2 KB tail window.
    val readBytes = names.flatMap { n =>
      shuffleBytes.get(n).collect { case (true, r, _) =>
        s""""${esc(short(n))}":$r"""
      }
    }.mkString("{", ",", "}")
    val fileLine = s"""{"metric":"total","value":${sec3(total)},"unit":"sec",$parInfo,"queries":$qs,"errors":$errs,"shuffle_read":$readBytes,"data":$dataFp,"sf":"${esc(sfDir)}"}"""
    // Belt-and-braces (VERDICT r11 #3): the harness extracts the line from
    // a ~2 KB output tail and sbt's [info]/[error] prefixes have defeated
    // that extractor two rounds running — so ALSO write the compact line
    // to a fixed file where no tail window or log prefix can lose it.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LINE.json"), fileLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LINE.json: ${e.getMessage}")
    }
    println(line)
    System.out.flush()
    System.err.println(line)
    System.err.flush()
  }
}

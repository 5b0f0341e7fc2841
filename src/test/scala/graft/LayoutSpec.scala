package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton spread (bit-by-bit), independent of the mask chain. */
  private def refSpread(x: Long): Long =
    (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).reduce(_ | _)

  test("spread16 matches the bit-by-bit reference on edge and random values") {
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 43690L, 21845L, 65535L) ++
      (1 to 50).map(i => (i * 2654435761L) & 0xFFFFL)
    val got = vals.toDF("x").select(Layout.spread16(col("x")).as("s"))
      .as[Long].collect()
    assert(got.toSeq == vals.map(refSpread))
  }

  test("interleave16 is a bijection on the quantized grid and orders blocks") {
    // distinct (a, b) pairs → distinct keys; key of (a, b) has a's bits even
    val pairs = for { a <- 0 to 15; b <- 0 to 15 } yield (a.toLong, b.toLong)
    val keys = pairs.toDF("a", "b")
      .select(Layout.interleave16(col("a"), col("b")).as("z")).as[Long].collect()
    assert(keys.distinct.length == pairs.length)
    // the (a,b) = (15,15) corner dominates every other key in this block
    assert(keys.max == keys(pairs.indexOf((15L, 15L))))
  }

  test("zorderKey2: exact-integer quantization, NULL and constant-column edges") {
    val df = Seq(
      (1L, Some(0L), Some(100L)),
      (2L, Some(1000L), Some(100L)),
      (3L, None: Option[Long], Some(100L))
    ).toDF("id", "a", "b")
    val out = Layout.zorderKey2(df, "a", "b").orderBy("id")
      .select("zkey").as[Option[Long]].collect()
    // b is constant → quantizes to 0 → zkey = spread(qa):
    // a=0 → qa=0 → 0; a=1000 → qa=65535 → spread = 0x55555555
    assert(out(0).contains(0L))
    assert(out(1).contains(0x55555555L))
    assert(out(2).isEmpty) // NULL dimension → NULL key
  }

  test("zorderKey2 quantizer is overflow-safe over the full int64 domain") {
    // r11's BIGINT quantizer ((x−mn)·65535 div range) wrapped once
    // range > ~1.4e14, and mx−mn itself wrapped for signed extremes —
    // epoch-micros timestamps and hash-derived keys live there. The
    // DECIMAL form must keep every quantized lane inside [0, 65536)
    // and stay monotone.
    val xs = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      1234567890123456789L, Long.MaxValue - 1, Long.MaxValue)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x, x) }
      .toDF("id", "a", "b")
    val q = Layout.zorderKey2(df, "a", "b").orderBy("id")
      .select("zkey").as[Long].collect()
    assert(q.forall(_ >= 0L), s"corrupt keys: ${q.toSeq}")
    // both lanes carry the same value → every key is a 2-bit-spread of
    // one 16-bit lane ORed with its shift: < 2^32
    assert(q.forall(_ < (1L << 32)), s"lane escaped 16 bits: ${q.toSeq}")
    // monotone in the input (same value in both dims ⇒ key order = quantizer order)
    assert(q.toSeq == q.sorted.toSeq)
    assert(q.head == 0L && q.last == q.max)
  }

  test("quantizer truncates fractional columns like the stats do (review r12)") {
    // stats use cast(long) (truncation); the value path must truncate
    // identically BEFORE widening to decimal — a direct fractional
    // cast rounds HALF_UP and can quantize outside [0, 2^16)
    val df = Seq((1L, 0.0, 0.0), (2L, 3.6, 0.0), (3L, -3.6, 0.0))
      .toDF("id", "a", "b")
    val out = Layout.zorderKey2(df, "a", "b").orderBy("id")
      .select("zkey").as[Long].collect()
    // truncated values: 0, 3, -3 → range [-3, 3], q = (x+3)*65535 div 6
    def q(x: Long): Long = (x + 3) * 65535 / 6
    assert(out(0) == refSpread(q(0)))
    assert(out(1) == refSpread(q(3)))
    assert(out(2) == refSpread(q(-3)))
    assert(out.forall(z => z >= 0 && z < (1L << 32)), s"lane escaped: ${out.toSeq}")
  }

  test("caller columns named like the staging columns survive (review r12)") {
    val df = Seq((1L, 10L, 20L, 99L), (2L, 30L, 40L, 98L))
      .toDF("id", "a", "b", "__graft_z0_mn_a")
    val out2 = Layout.zorderKey2(df, "a", "b")
    assert(out2.columns.contains("__graft_z0_mn_a"))
    assert(out2.select("__graft_z0_mn_a").as[Long].collect().sorted.toSeq
      == Seq(98L, 99L), "caller column corrupted by zorderKey2 staging")
    val dfN = Seq((1L, 1L, 2L, 3L, 7L)).toDF("id", "a", "b", "__graft_z0_mn_0", "c")
    val outN = Layout.zorderKeyN(dfN, Seq(("a", 4), ("b", 4), ("c", 4)))
    assert(outN.select("__graft_z0_mn_0").as[Long].head() == 3L,
      "caller column corrupted by zorderKeyN staging")
  }

  test("zorderKeyN rejects any dimension whose top bit passes 62 (review r12)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    // sum(bits) = 33 <= 63 but b's top bit lands at (32-1)*2 + 1 = 63:
    // the old sum-based guard admitted this and JVM shifts alias mod 64
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(df, Seq(("a", 1), ("b", 32)))
    }
    // legal unequal budgets still work: (24,8) at stride 2 tops at 47
    val ok = Layout.zorderKeyN(
      Seq((1L, 2L), (1000000L, 3L)).toDF("a", "b"), Seq(("a", 24), ("b", 8)))
      .select("zkey").as[Long].collect()
    assert(ok.forall(_ >= 0L))
  }

  test("zorderKeyN: 3-dim bijection on the grid, NULL propagation, budget guard") {
    // 3 dims × 4 bits: all 4096 grid points → distinct keys < 2^12
    // values 0,3,…,45: range 45, top 2^4−1 = 15 → q = (x·15) div 45
    // = x div 3 restores the 0..15 grid exactly
    val triples = for { a <- 0 to 15; b <- 0 to 15; c <- 0 to 15 }
      yield (a.toLong * 3, b.toLong * 3, c.toLong * 3)
    val df = triples.toDF("a", "b", "c")
    val keys = Layout.zorderKeyN(df, Seq(("a", 4), ("b", 4), ("c", 4)))
      .select("zkey").as[Long].collect()
    assert(keys.distinct.length == triples.length)
    assert(keys.forall(k => k >= 0 && k < (1L << 12)))
    // NULL in any dimension → NULL key
    val withNull = Seq((Some(1L), Some(2L), None: Option[Long]))
      .toDF("a", "b", "c")
    val nk = Layout.zorderKeyN(withNull, Seq(("a", 4), ("b", 4), ("c", 4)))
      .select("zkey").as[Option[Long]].collect()
    assert(nk.head.isEmpty)
    // budgets must sum to ≤ 63
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(df, Seq(("a", 32), ("b", 31), ("c", 1)))
    }
  }

  test("zorderKeyN with declared bounds: identical keys, no stats job, clamped stragglers") {
    val triples = for { a <- 0 to 15; b <- 0 to 15; c <- 0 to 15 }
      yield (a.toLong * 3, b.toLong * 3, c.toLong * 3)
    val df = triples.toDF("a", "b", "c")
    val dims = Seq(("a", 4), ("b", 4), ("c", 4))
    // bounds = the true min/max → bit-identical to the observed-stats path
    val bounds = Map("a" -> (0L, 45L), "b" -> (0L, 45L), "c" -> (0L, 45L))
    val observed = Layout.zorderKeyN(df, dims)
      .select("a", "b", "c", "zkey").as[(Long, Long, Long, Long)]
      .collect().toSet
    val declared = Layout.zorderKeyN(df, dims, bounds = bounds)
      .select("a", "b", "c", "zkey").as[(Long, Long, Long, Long)]
      .collect().toSet
    assert(declared == observed, "declared-bounds keys diverged from observed-stats keys")
    // fully-bound key is pure map-side: no aggregate, no broadcast join
    val plan = Layout.zorderKeyN(df, dims, bounds = bounds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate") && !plan.contains("BroadcastNestedLoop"),
      plan.take(800))
    // out-of-range values clamp onto the grid edge — never a corrupted key
    val stragglers = Seq((-100L, 500L, 7L)).toDF("a", "b", "c")
    val Seq(k) = Layout.zorderKeyN(stragglers, dims, bounds = bounds)
      .select("zkey").as[Long].collect().toSeq
    val Seq(edge) = Layout.zorderKeyN(Seq((0L, 45L, 7L)).toDF("a", "b", "c"),
        dims, bounds = bounds)
      .select("zkey").as[Long].collect().toSeq
    assert(k == edge && k >= 0 && k < (1L << 12),
      s"straggler must clamp to the grid-edge key (got $k, want $edge)")
    // misdeclared bounds fail loudly
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(df, dims, bounds = Map("zzz" -> (0L, 1L)))
    }
    intercept[IllegalArgumentException] {
      Layout.zorderKeyN(df, dims, bounds = Map("a" -> (10L, 5L)))
    }
  }

  test("zorderKeyN agrees with an independent bit-by-bit reference") {
    def refKeyN(qs: Seq[Long], bits: Seq[Int]): Long = {
      val n = qs.size
      qs.zip(bits).zipWithIndex.map { case ((q, b), j) =>
        (0 until b).map(i => ((q >> i) & 1L) << (i * n + j)).foldLeft(0L)(_ | _)
      }.reduce(_ | _)
    }
    // same quantizer replayed in plain Scala (operands small, no overflow)
    def refQuant(x: Long, mn: Long, mx: Long, bits: Int): Long =
      if (mx <= mn) 0L else (x - mn) * ((1L << bits) - 1) / (mx - mn)
    val rows = (0 until 200).map { i =>
      (i.toLong, ((i * 37) % 256).toLong, ((i * 91) % 64).toLong)
    }
    val df = rows.toDF("a", "b", "c")
    val (mnA, mxA) = (rows.map(_._1).min, rows.map(_._1).max)
    val (mnB, mxB) = (rows.map(_._2).min, rows.map(_._2).max)
    val (mnC, mxC) = (rows.map(_._3).min, rows.map(_._3).max)
    // mixed budgets: 9 + 8 + 6 = 23 bits
    val got = Layout.zorderKeyN(df, Seq(("a", 9), ("b", 8), ("c", 6)))
      .select("a", "b", "c", "zkey").as[(Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    got.foreach { case (a, b, c, z) =>
      val want = refKeyN(Seq(
        refQuant(a, mnA, mxA, 9), refQuant(b, mnB, mxB, 8),
        refQuant(c, mnC, mxC, 6)), Seq(9, 8, 6))
      assert(z == want, s"key mismatch at ($a,$b,$c): got $z want $want")
    }
  }

  test("zorderWriteN narrows file envelopes in all THREE dimensions") {
    // three decorrelated uniform dims over 4096 rows
    val rows = (0 until 4096).map { i =>
      val b = Integer.reverse(i) >>> 20 // 12-bit reversal
      val c = (i * 2654435761L) & 0xFFFL // Knuth-hash low bits
      (i.toLong, (i / 64).toLong, b.toLong, c)
    }
    val df = rows.toDF("id", "a", "b", "c")
    val zdir = java.nio.file.Files.createTempDirectory("zorder3").toString
    Layout.zorderWriteN(df, Seq(("a", 12), ("b", 12), ("c", 12)), 16, zdir)
    def meanEnvelope(c: String): Double = {
      val env = spark.read.parquet(zdir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("w"))
        .select("w").as[Long].collect()
      env.sum.toDouble / env.length
    }
    // each dim's per-file envelope must be well under its global range
    // (16 files over 3 interleaved dims → roughly a half-bit of pruning
    // per dim per file doubling; 0.6 is a loose, stable bound)
    assert(meanEnvelope("a") < 63 * 0.6, s"a: ${meanEnvelope("a")}")
    assert(meanEnvelope("b") < 4095 * 0.6, s"b: ${meanEnvelope("b")}")
    assert(meanEnvelope("c") < 4095 * 0.6, s"c: ${meanEnvelope("c")}")
    assert(spark.read.parquet(zdir).count() == 4096)
  }

  test("zorderWrite narrows file envelopes in BOTH dimensions; single-column sort does not") {
    // two independent uniform dims: a = i div 64, b = bit-reversed i → no correlation
    val rows = (0 until 4096).map { i =>
      val b = Integer.reverse(i) >>> 20 // 12-bit reversal → decorrelated
      (i.toLong, (i / 64).toLong, b.toLong)
    }
    val df = rows.toDF("id", "a", "b")
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sdir = java.nio.file.Files.createTempDirectory("asort").toString
    Layout.zorderWrite(df, "a", "b", 16, zdir)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sdir)

    def meanEnvelope(dir: String, c: String): Double = {
      val env = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("w"))
        .select("w").as[Long].collect()
      env.sum.toDouble / env.length
    }
    val globalB = 4095.0
    // z-order: BOTH dims pruned to a fraction of the global range
    assert(meanEnvelope(zdir, "a") < 64 * 16) // ~a-range per 1/16 slice, loose
    assert(meanEnvelope(zdir, "b") < globalB * 0.5)
    // a-only sort: b envelopes stay essentially full-width
    assert(meanEnvelope(sdir, "b") > globalB * 0.9)
    // and the z-order rows are the same corpus (no loss through the write)
    assert(spark.read.parquet(zdir).count() == 4096)
  }
}

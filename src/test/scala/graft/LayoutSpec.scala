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

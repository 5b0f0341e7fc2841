package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Testdata

/** The testdata loader must adapt to whichever physical type `events.ts`
  * carries — the driver regenerated the tables between rounds with
  * timestamp[us] (TIMESTAMP_NTZ) where earlier generations used
  * TIMESTAMP(NANOS)-read-as-Long, and the round-9 loader, pinned to the
  * Long shape, silently broke all 10 events-based queries (ADVICE r9,
  * high). Both branches must yield the same µs TimestampType wall clock.
  */
class TestdataSpec extends SparkSpec {

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-testdata-spec-")
    dir.toFile.deleteOnExit()
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  test("NTZ timestamp[us] ts is cast to session-UTC TimestampType, wall clock preserved") {
    val s = spark
    import s.implicits._
    val dir = writeEvents(
      Seq(1L, 2L).toDF("event_id").withColumn(
        "ts", lit("2024-03-01 12:34:56.789012").cast(TimestampNTZType)))
    val got = Testdata.table(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val vals = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSet
    assert(vals == Set("2024-03-01 12:34:56.789012"))
  }

  test("Long nanos ts is integer-divided to µs TimestampType") {
    val s = spark
    import s.implicits._
    // 2024-03-01T12:34:56.789012345Z as ns since epoch; div 1000 truncates
    // to .789012, matching DuckDB's ns→µs coercion
    val ns = 1709296496L * 1000000000L + 789012345L
    val dir = writeEvents(Seq((1L, ns)).toDF("event_id", "ts"))
    val got = Testdata.table(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    val v = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(v == "2024-03-01 12:34:56.789012")
  }

  test("the shipped sf0.001 events table loads with a TimestampType ts and parses dates") {
    val got = Testdata.table(spark, "/root/testdata/sf0.001", "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.where(col("ts").isNotNull).limit(1).count() == 1)
  }
}

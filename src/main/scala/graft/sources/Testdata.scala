package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver's synthetic testdata (TESTDATA.md).
  *
  * Pins the session semantics the engine relies on:
  *  - `spark.sql.ansi.enabled=false`: cast-of-garbage yields NULL, matching
  *    the reference's sentinel-scrubbed Postgres casts (SURVEY.md §7.4.2).
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: `events.ts` is parquet
  *    TIMESTAMP(NANOS), which Spark 4 otherwise refuses; it reads as LongType
  *    nanos and is converted here to a microsecond TimestampType with the
  *    same truncation DuckDB applies when it coerces ns → its µs TIMESTAMP.
  */
object Testdata {

  private def pin(s: SparkSession): Unit = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** Read one testdata table by name; timestamp-nanos columns are normalized
    * to microsecond TimestampType so date logic behaves identically to the
    * DuckDB oracle. */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    pin(s)
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer `div` (not `/`): ns values exceed 2^53, double division
      // would lose precision before the truncation.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Raw read without the nanos normalization (ts stays LongType nanos). */
  def raw(s: SparkSession, dir: String, name: String): DataFrame = {
    pin(s)
    s.read.parquet(s"$dir/$name.parquet")
  }
}

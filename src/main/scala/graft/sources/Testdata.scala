package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver's synthetic testdata (TESTDATA.md).
  *
  * Pins the session semantics the engine relies on:
  *  - `spark.sql.ansi.enabled=false`: cast-of-garbage yields NULL, matching
  *    the reference's sentinel-scrubbed Postgres casts (SURVEY.md §7.4.2).
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: some testdata generations
  *    store `events.ts` as parquet TIMESTAMP(NANOS), which Spark 4 otherwise
  *    refuses; it then reads as LongType nanos. Other generations store it as
  *    timestamp[us] (TIMESTAMP_NTZ). `table` adapts to whichever schema the
  *    files carry, always yielding a microsecond TimestampType matching the
  *    DuckDB oracle's µs TIMESTAMP.
  */
object Testdata {

  private def pin(s: SparkSession): Unit = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ→TZ normalization below assumes a UTC session, matching DuckDB's
    // naive-µs TIMESTAMP semantics.
    s.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Read one testdata table by name; `events.ts` is normalized to a
    * microsecond TimestampType so date logic behaves identically to the
    * DuckDB oracle, whatever physical type the parquet carries. */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    pin(s)
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case LongType =>
          // TIMESTAMP(NANOS) read as Long under nanosAsLong. Integer `div`
          // (not `/`): ns values exceed 2^53, double division would lose
          // precision before the truncation.
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // timestamp[us] without zone: reinterpret the wall-clock value as
          // session-UTC instant, same as DuckDB's TIMESTAMP.
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df // already TimestampType
      }
    } else df
  }

  /** Raw read without the nanos normalization (ts stays LongType nanos). */
  def raw(s: SparkSession, dir: String, name: String): DataFrame = {
    pin(s)
    s.read.parquet(s"$dir/$name.parquet")
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §7.3 deliberate addition (a)): exact
  * weighted mean as an `Aggregator` — the engine-quality form of the
  * reference's weighted composite score (`movies_enriched_daily.sql:97-103`)
  * when it must be aggregated across rows rather than derived per row.
  *
  * Aggregators run inside Spark's ObjectHashAggregate with partial+final
  * merge — distributed, spill-aware, no collect. Register per session:
  * {{{ spark.udf.register("weighted_mean", functions.udaf(WeightedMean)) }}}
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), java.lang.Double] {
  /** (value, weight) → running (Σ w·x, Σ w). */
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  /** NULL (SQL-style) on an all-zero-weight group. */
  override def finish(r: (Double, Double)): java.lang.Double =
    if (r._2 == 0.0) null else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

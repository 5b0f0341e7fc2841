package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable heavy-hitters sketch (space-saving / Misra-Gries family) as a
  * typed Aggregator — the bounded-memory way to find hot tokens/domains/
  * n-grams in a 100 TB corpus where an exact groupBy-count would shuffle
  * the full vocabulary.
  *
  * Buffer: at most `capacity` (token → count) entries. Guarantee: any item
  * with true frequency > N/capacity survives, and each reported count
  * undercounts by at most N/capacity (classic Misra-Gries bound; merging
  * preserves it). Counts are approximate and merge-order-dependent —
  * callers rank by them, not equality-test them.
  *
  * Runs inside ObjectHashAggregate with partial+final merge: each
  * partition keeps one bounded map, merges are map-sum + decrement.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(capacity > 0)

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (b.contains(item) || b.size < capacity) {
      b.update(item, b.getOrElse(item, 0L) + 1L)
    } else {
      // Misra-Gries decrement step: shrink everyone instead of admitting
      b.mapValuesInPlace((_, v) => v - 1L)
      b.filterInPlace((_, v) => v > 0L)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // standard mergeable-summaries merge (Agarwal et al., "Mergeable
      // Summaries"): subtract the (capacity+1)-th largest count from every
      // entry and drop the non-positive ones. Equivalent to running the
      // Misra-Gries decrement `cutoff` times at once, so the combined
      // sketch keeps the N/capacity undercount bound across merges —
      // truncating without subtracting would let an evicted item lose an
      // arbitrarily large count.
      val cutoff = a.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      a.mapValuesInPlace((_, v) => v - cutoff)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  override def finish(r: mutable.Map[String, Long]): Map[String, Long] = r.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal modeling over snapshot series — the slowly-changing-
  * dimension face of the lake layer: the engine writes day-partitioned
  * snapshots (`LakeZones`), and an SCD2 collapse turns N daily copies
  * of a dimension into one row per (key, version) with a validity
  * interval, the shape warehouse queries join against.
  *
  * Plan shape: ONE window pass per step over (key, date) — lag to
  * detect change points (null-safe, so NULL attribute values compare
  * like values, not like "always changed"), a running sum to number
  * versions, then a partial+final aggregation per (key, version).
  * Everything shuffles on the key exactly once (the window and the
  * final agg share the hash partitioning on key — no second exchange),
  * and rows carry only keys + attrs + dates.
  *
  * Contract: versions break on ATTRIBUTE CHANGE between a key's
  * consecutive snapshots. A key absent for a stretch and returning
  * with identical attributes stays in the SAME version (its interval
  * simply spans the gap) — presence gaps are not modeled; callers that
  * need absence-as-deletion should densify against a snapshot calendar
  * first. `valid_from`/`valid_to` are the run's first and last observed
  * snapshot dates, both inclusive; `valid_to` of a key's last version
  * is its last snapshot, not NULL/open — the collapse reports what was
  * observed, an open-ended current row is presentation.
  */
object Temporal {

  /** Densify a per-key daily series to every date in the key's own
    * [first, last] observation span and FORWARD-FILL the value columns
    * across the gaps — resampling for downstream consumers that assume
    * a gap-free calendar (charts, drift monitors, the scd2 caller that
    * needs absence modeled). Synthesized rows carry the most recent
    * observed value per column; a `was_observed` flag separates real
    * rows from fill.
    *
    * Plan shape: one per-key min/max aggregation, a map-side
    * `sequence()` explode of each key's span (rows generated ∝ the
    * densified output, never a global calendar cross join), one left
    * join back on (key, date), and one ordered window per key for the
    * fill — everything shuffles on the key, and the window shares the
    * join's partitioning. */
  def densifyFfill(df: DataFrame, keyCols: Seq[String], dateCol: String,
                   valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val keys = keyCols.map(col)
    val spans = df.groupBy(keys: _*)
      .agg(min(col(dateCol)).as("__from"), max(col(dateCol)).as("__to"))
    val calendar = spans.select(keys :+ explode(
      expr(s"sequence(__from, __to, interval 1 day)")).as(dateCol): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = calendar.join(
      df.withColumn("__obs", lit(true)), keyCols :+ dateCol, "left")
    valueCols.foldLeft(
        joined.withColumn("was_observed",
          coalesce(col("__obs"), lit(false))).drop("__obs")) {
        (acc, c) => acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
  }

  /** Point-in-time enrichment against an SCD2 dimension: each fact row
    * joins the dimension version whose `[valid_from, valid_to]`
    * (inclusive) covers the fact's date, on equal keys. INNER — facts
    * dated outside every version drop (the caller decides how to
    * default them). Plan: the key equality drives a hash/sort-merge
    * join and the interval predicate rides along as the join residual —
    * never a cartesian; intervals per key are disjoint by construction
    * of [[scd2]], so the join is at most 1:1 per fact. The frames may
    * share lineage (a dimension derived from the same table) — aliases
    * keep the self-join unambiguous. */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
              factDateCol: String, validFromCol: String = "valid_from",
              validToCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty)
    val f = facts.alias("__f")
    val d = dim.alias("__d")
    val cond = keyCols.map(k => col(s"__f.$k") === col(s"__d.$k")).reduce(_ && _) &&
      col(s"__f.$factDateCol")
        .between(col(s"__d.$validFromCol"), col(s"__d.$validToCol"))
    keyCols.foldLeft(f.join(d, cond))((df, k) => df.drop(col(s"__d.$k")))
  }

  /** [[scd2]] with ABSENCE AS DELETION (VERDICT r12 #7): a key missing
    * from a snapshot date on which OTHER keys were observed closes its
    * interval — `valid_to` is its last observed date before the gap, and
    * a later reappearance opens a NEW version even when the attributes
    * come back identical (plain [[scd2]] spans such gaps by design).
    * The calendar is the frame's own distinct snapshot dates (the
    * observation grid); a key is only "absent" from dates on/after its
    * first appearance — never retroactively before it was born.
    *
    * Plan shape: the calendar is date-count-bounded (one distinct over
    * the date column, broadcast), the key×calendar grid is
    * Σ per-key-span rows (output-proportional, the densify posture),
    * then ONE key-shuffle drives the presence left-join, the run window
    * and the final collapse. `version` is renumbered densely per key
    * (1-based by `valid_from`) over the collapsed run frame — absent
    * runs are dropped, not numbered.
    *
    * Precondition (same as [[scd2]]'s): at most one row per (key, date).
    * Duplicate snapshot rows for a key/date would fan out through the
    * calendar-grid left join — inflating `nb_snapshots` and making the
    * run splitting / `first(attr)` nondeterministic when the duplicates
    * disagree — so pre-aggregate multi-row snapshots first (the q133
    * caller's `groupBy(key, date)` shape). Not checked here: the
    * defensive dropDuplicates would add a (key, date) exchange every
    * caller with clean input pays for nothing. */
  def scd2WithDeletions(snapshots: DataFrame, keyCols: Seq[String],
                        attrCols: Seq[String], dateCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val keys = keyCols.map(col)
    val calendar = snapshots.select(col(dateCol)).distinct()
    val births = snapshots.groupBy(keys: _*)
      .agg(min(col(dateCol)).as("__born"))
    val grid = births.join(broadcast(calendar), col(dateCol) >= col("__born"))
      .drop("__born")
    val w = Window.partitionBy(keys: _*).orderBy(col(dateCol))
    // a run breaks exactly like scd2's, with presence riding the attr
    // struct: present→absent→present breaks twice, so the gap splits
    // the version even when attributes return unchanged
    val attrs = struct((attrCols :+ "__present").map(col): _*)
    val chg = when(lag(attrs, 1).over(w).isNull ||
      !(attrs <=> lag(attrs, 1).over(w)), 1L).otherwise(0L)
    grid.join(snapshots.withColumn("__present", lit(true)),
        keyCols :+ dateCol, "left")
      .withColumn("__present", coalesce(col("__present"), lit(false)))
      .withColumn("__ver", sum(chg).over(w))
      .filter(col("__present"))
      .groupBy((keyCols :+ "__ver").map(col): _*)
      .agg(min(col(dateCol)).as("valid_from"),
        (Seq(max(col(dateCol)).as("valid_to"),
          count(lit(1)).as("nb_snapshots")) ++
          attrCols.map(c => first(col(c)).as(c))): _*)
      .withColumn("version", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("valid_from"))).cast("long"))
      .drop("__ver")
  }

  /** Collapse a snapshot series into SCD2 intervals: one row per (key,
    * run of identical `attrCols`), with `valid_from`, `valid_to`
    * (inclusive), `nb_snapshots`, and the run's attribute values.
    * `snapshots` must have at most one row per (key, date). */
  def scd2(snapshots: DataFrame, keyCols: Seq[String],
           attrCols: Seq[String], dateCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(dateCol))
    // a run breaks when ANY attribute null-safely differs from the
    // previous snapshot; the first row of a key always breaks (lag is
    // NULL and <=> against a NULL struct is false unless all-null attrs
    // — wrap in a struct so one lag covers all attrs at once)
    val attrs = struct(attrCols.map(col): _*)
    val chg = when(lag(attrs, 1).over(w).isNull ||
      !(attrs <=> lag(attrs, 1).over(w)), 1L).otherwise(0L)
    snapshots
      .withColumn("__ver", sum(chg).over(w))
      .groupBy((keyCols :+ "__ver").map(col): _*)
      .agg(min(col(dateCol)).as("valid_from"),
        (Seq(max(col(dateCol)).as("valid_to"),
          count(lit(1)).as("nb_snapshots")) ++
          attrCols.map(c => first(col(c)).as(c))): _*)
      .withColumnRenamed("__ver", "version")
  }
}

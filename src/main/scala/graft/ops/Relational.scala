package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operator library.
  *
  * These are the engine-level primitives the reference's pipeline decomposes
  * into (SURVEY.md §2): top-k scans (S1), keyed last-write-wins upsert (S7),
  * left-enrich joins with missing-flags (J1/J2 + P10), null-skipping KPI
  * aggregation (A1-A5), and dbt-style data-quality assertions (Q1-Q3) — plus
  * the inner/semi/anti/set-op surface Spark gives for free (§2.3 note).
  *
  * Scale posture: every op is expressed as a declarative DataFrame transform
  * (no collect, no driver loops) so Catalyst plans partial aggregation,
  * broadcast vs sort-merge joins, and partition-pruned scans on its own.
  */
object Relational {

  /** Exact sum of a double column computed over DECIMAL(18,2) and returned
    * as double. Parallel floating-point summation is order-dependent; the
    * decimal widening makes the aggregate bit-reproducible across partition
    * counts (and across engines, which the DuckDB oracle gate relies on). */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact null-skipping mean of a double column (decimal sum / non-null
    * count), quantized to `scale` decimal places via a DECIMAL cast — not
    * round() — so the value is bit-identical across engines (Spark round()
    * is BigDecimal HALF_UP on the exact double; DuckDB round() scales by
    * 10^n first; double→decimal casts are correctly rounded in both).
    * SQL-`avg` semantics: NULLs excluded from numerator and denominator
    * (SURVEY §2.4 A4). */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast("decimal(18,2)")).cast("double") / count(c))
      .cast(s"decimal(18,$scale)").cast("double")

  /** Conditional count: SUM(CASE WHEN cond THEN 1 ELSE 0 END) (A2/A5).
    * NULL condition falls to ELSE, i.e. counts as 0 — matching Postgres
    * CASE and the reference's flag counting. */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Top-k by explicit ordering (S1: the reference's API-delegated
    * top-20-by-popularity re-derived in-engine). Callers must pass a total
    * order (include a unique tiebreak column) for deterministic results. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Left-enrich a fact with a dimension and flag unmatched rows (J1/J2 +
    * P10 `missing_omdb_data`). NULL join keys never match, leaving the flag
    * true — identical semantics in Spark's Seq-key join and the reference's
    * SQL left join. `dimKey` must be a dimension-side column that is never
    * null on a match (e.g. its primary key). */
  def leftEnrich(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 missingFlag: String, dimKey: String): DataFrame =
    fact.join(dim, keys, "left").withColumn(missingFlag, col(dimKey).isNull)

  /** Keyed last-write-wins dedup (S7: `INSERT ... ON CONFLICT DO UPDATE`).
    * Keeps exactly one row per key group, the first under `order` (pass
    * e.g. desc(ts), desc(fileSeq) for "latest wins" with a deterministic
    * tiebreak — SURVEY §7.4.1). Implemented as a ranking window so it
    * shuffles once on the key and never collects. */
  def lastWriteWins(df: DataFrame, keys: Seq[String], order: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-group top-n as a DataFrame (window ranking; the scalable form of
    * "top 3 per customer"). `order` must be total for determinism. */
  def topNPerGroup(df: DataFrame, keys: Seq[String], n: Int, order: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** dbt-style `not_null` violation count for `cols` (Q1). Returns a single
    * aggregated row; the pipeline asserts it is all zeros. Empty `cols`
    * folds to a constant-false predicate (0 violations) instead of
    * crashing on empty.reduce. */
  def notNullViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      countIf(cols.map(col(_).isNull).foldLeft(lit(false))(_ || _)).as("nb_null_rows"),
      count(lit(1)).as("nb_rows")
    )

  /** dbt-style `unique` check (Q2/Q3): number of key groups with more than
    * one row, and the surplus row count. Encodes the reference's *intended*
    * invariant — uniqueness per composite key (SURVEY §2.6 note). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        countIf(col("__n") > 1).as("nb_dup_keys"),
        sum(col("__n") - 1).as("nb_surplus_rows")
      )

  /** As-of join (an operator Spark lacks natively): for each fact row,
    * attach the dimension row with the greatest `dimTime` ≤ `factTime`
    * for the same key — SURVEY §2.3's "beyond the reference" surface,
    * composed from existing ops per the custom-operator preference order.
    *
    * Implementation is the scalable union+window form: ONE shuffle on the
    * key (no range cross-join, no per-row subquery) — tag both sides,
    * sort by (time, dim-first, tiebreak) within the key partition, and
    * carry the latest dim payload forward with a running `last(…,
    * ignoreNulls)`. Ties on (key, time) resolve to the greatest
    * `dimTieBreak`, making results deterministic.
    *
    * Returns all fact rows (unmatched → NULL payload) plus
    * `payload` columns prefixed `asof_`. */
  def asOfJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               factTime: String, dimTime: String, dimTieBreak: String,
               payload: Seq[String]): DataFrame = {
    val pCols = (dimTime +: dimTieBreak +: payload).distinct
    val factCols = fact.columns.toSeq
    val taggedDim = dim.select(
      Seq(col(dimKey).as("__k"), col(dimTime).as("__t"), lit(1).as("__is_dim"),
          col(dimTieBreak).as("__tie")) ++
        pCols.map(c => col(c).as(s"__p_$c")) ++
        factCols.map(c => lit(null).as(c)): _*)
    val taggedFact = fact.select(
      Seq(col(factKey).as("__k"), col(factTime).as("__t"), lit(0).as("__is_dim"),
          lit(null).as("__tie")) ++
        pCols.map(c => lit(null).as(s"__p_$c")) ++
        factCols.map(col): _*)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_dim").desc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedDim.unionByName(taggedFact)
      .select(
        (factCols.map(col) :+ col("__is_dim")) ++
          pCols.map(c => last(when(col("__is_dim") === 1, col(s"__p_$c")), ignoreNulls = true)
            .over(w).as(s"asof_$c")): _*)
    carried.filter(col("__is_dim") === 0).drop("__is_dim")
  }

  /** Binned range join (the scalable form of an interval join, which
    * Spark would otherwise plan as a broadcast-nested-loop or cartesian):
    * match fact rows whose `factTime` falls in the dim's
    * [`dimStart`, `dimEnd`) interval for the same key. Both sides are
    * bucketed into fixed `binSeconds` bins — intervals explode to every
    * bin they span — so the match becomes an equi-join on (key, bin)
    * followed by the exact predicate. Shuffle is keyed on (key, bin);
    * pair blow-up is bounded by interval-length / bin size.
    *
    * Times must be TIMESTAMP columns. Returns fact ⨯ matching dim rows
    * (inner). */
  def rangeJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                factTime: String, dimStart: String, dimEnd: String,
                binSeconds: Long): DataFrame = {
    val binF = (unix_seconds(col(factTime)) / binSeconds).cast("long")
    val binS = (unix_seconds(col(dimStart)) / binSeconds).cast("long")
    val binE = (unix_seconds(col(dimEnd)) / binSeconds).cast("long")
    val sf = fact.withColumn("__bin", binF)
      .withColumnRenamed(factKey, "__k")
    val sd = dim
      .withColumn("__bin", explode(sequence(binS, binE)))
      .withColumnRenamed(dimKey, "__k")
    sf.join(sd, Seq("__k", "__bin"))
      .filter(col(factTime) >= col(dimStart) && col(factTime) < col(dimEnd))
      .drop("__bin")
      .withColumnRenamed("__k", factKey)
  }

  /** Skew-mitigating salted join: fact rows get a deterministic salt in
    * [0, buckets), the dimension is replicated once per salt value, and
    * the join key becomes (keys…, salt) — a hot key's rows spread over
    * `buckets` reducers instead of one. Use when AQE's skew-join split
    * is unavailable or insufficient (e.g. skewed aggregation feeding the
    * join). Cost: dim side × buckets.
    *
    * Only inner and left-flavored joins are semantics-preserving: the dim
    * side is replicated per salt bucket, so right/full-outer (and
    * right-semi/anti) would emit each unmatched dim row `buckets` times. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-flavored joins only, got '$joinType' " +
        "(the replicated dim side would duplicate unmatched dim rows)")
    val sf = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(buckets)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    sf.join(sd, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Snapshot diff — the day-over-day lake-table audit behind S7-style
    * keyed upserts: full-outer join two snapshots on the key and classify
    * every key as added / removed / changed / unchanged. Column
    * comparison is null-safe (`<=>`), so NULL→NULL is unchanged and
    * NULL→value is changed. One key shuffle (zero with co-bucketed
    * snapshots); the classification is a pure projection over the join. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    def pick(df: DataFrame, p: String) =
      df.select((keyCol +: compareCols).map(c => col(c).as(s"$p$c")): _*)
    val joined = pick(oldSnap, "__o_")
      .join(pick(newSnap, "__n_"),
        col(s"__o_$keyCol") === col(s"__n_$keyCol"), "full_outer")
    val differs = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    joined.select(
      coalesce(col(s"__o_$keyCol"), col(s"__n_$keyCol")).as(keyCol),
      when(col(s"__o_$keyCol").isNull, "added")
        .when(col(s"__n_$keyCol").isNull, "removed")
        .when(differs, "changed")
        .otherwise("unchanged").as("change_type"))
  }

  /** Assert zero data-quality violations, mirroring `dbt test` semantics
    * (run inside pipelines; throws on violation).
    *
    * ONE action for both gates (was two): the unique check's key groupBy
    * carries the null-violation count through as a per-group partial, so
    * the not_null total falls out of the same job — per-day pipelines run
    * five of these, and each saved action is saved scheduling wall on
    * every backfilled day. The null gate still reports first. */
  def assertQuality(df: DataFrame, notNullCols: Seq[String], uniqueKeys: Seq[String]): Unit =
    assertQualityAll(Seq(("table", df, notNullCols, uniqueKeys)))

  /** N quality gates in ONE action (r17-opt): each gate reduces to a
    * (gate, nb_null_rows, nb_dup_keys) row and the rows union into a
    * single collect — a 5-gate pipeline day pays one driver round-trip
    * instead of five (measured on the q82 lifecycle macro: the gates
    * were ~100 tiny AQE stage-jobs over a 5-day backfill). Violation
    * semantics are [[assertQuality]]'s: throws naming the first
    * violated gate's columns; all gates evaluate before any throw. */
  def assertQualityAll(
      gates: Seq[(String, DataFrame, Seq[String], Seq[String])]): Unit = {
    require(gates.nonEmpty, "assertQualityAll needs at least one gate")
    // duplicate gate names would silently collapse in the result map —
    // a masked violated gate is worse than a failing one (ADVICE r17).
    // (r18-opt note: fusing ALL keyed gates into one two-exchange
    // union plan — gate-tagged rows, stringified key arrays — was
    // A/B-measured on the q82 lifecycle: −15 jobs/arc but a consistent
    // +0.8 s wall (the union's array-keyed aggregation costs more task
    // time than the per-gate two-row aggregates it replaces at this
    // row count) — REVERTED; the per-gate subtrees below stay.)
    require(gates.map(_._1).distinct.size == gates.size,
      s"assertQualityAll gate names must be unique: ${gates.map(_._1)}")
    val per = gates.map { case (name, df, notNullCols, uniqueKeys) =>
      val nullPred = notNullCols.map(col(_).isNull).foldLeft(lit(false))(_ || _)
      if (uniqueKeys.isEmpty)
        df.agg(countIf(nullPred).as("nb_null_rows"))
          .select(lit(name).as("gate"), col("nb_null_rows"),
            lit(0L).as("nb_dup_keys"))
      else
        df.groupBy(uniqueKeys.map(col): _*)
          .agg(count(lit(1)).as("__n"), countIf(nullPred).as("__nulls"))
          .agg(coalesce(sum(col("__nulls")), lit(0L)).as("nb_null_rows"),
            countIf(col("__n") > 1).as("nb_dup_keys"))
          .select(lit(name).as("gate"), col("nb_null_rows"),
            col("nb_dup_keys"))
    }
    // (r17-opt note: narrowing AQE/shuffle.partitions around this
    // collect was A/B-measured and REVERTED — AQE-off widened the tiny
    // gate shuffles to session width (+2.5 s over a 5-day lifecycle),
    // and pinning shuffle.partitions=1 here would also freeze the
    // persisted `enriched` frame's layout at 1 partition for every
    // downstream consumer, a scale trap. AQE's runtime coalescing is
    // exactly right for these row-bounded aggregates.)
    val byGate = per.reduce(_ unionAll _).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    gates.foreach { case (name, _, notNullCols, uniqueKeys) =>
      val (nulls, dups) = byGate(name)
      require(nulls == 0,
        s"not_null violated ($name): $nulls rows with NULL in $notNullCols")
      require(dups == 0,
        s"unique violated ($name): $dups duplicate key groups for $uniqueKeys")
    }
  }
}

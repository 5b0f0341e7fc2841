package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational._
import graft.sources.Testdata.table

/** Generic relational operators from SURVEY.md §2 expressed over the
  * driver's testdata, each with a DuckDB oracle. Query-name → §2 operator-id
  * mapping lives in COVERAGE.md.
  *
  * Determinism rules (driver hash-compares Spark vs DuckDB):
  *  - identical ORDER BY with a unique tiebreak in both engines;
  *  - double aggregates via decimal(18,2) sums ([[graft.ops.Relational.dsum]]);
  *  - integer-like outputs cast to BIGINT on both sides;
  *  - timestamps surfaced as epoch microseconds (both engines truncate the
  *    source's nanos the same way).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // S1: in-engine top-k (reference: TMDB popular page = top-20 by
    // popularity, fetch_tmdb.py:49-51). Total order via o_orderkey tiebreak.
    "q02_topk_orders" -> ((s, dir) => {
      topK(table(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
           20, col("o_totalprice").desc, col("o_orderkey").asc)
    }),

    // P1: JSON field extraction (payload->>'k', stg_tmdb_popular.sql:22-27).
    "q03_json_extract" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("k")
        .agg(count(lit(1)).as("nb_events"), dsum(col("value")).as("total_value"))
        .orderBy(asc_nulls_last("k"))
    }),

    // P2-P5: empty-string→NULL date parse, 'N/A' sentinel scrub,
    // thousands-separator strip, string→number cast (stg_omdb_ratings.sql).
    "q04_scrub_cast" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val raw = when(col("o_orderkey") % 97 === 0, lit("N/A"))
        .when(col("o_orderkey") % 101 === 0, lit(""))
        .otherwise(concat(
          floor(col("o_totalprice") / 1000).cast("long").cast("string"),
          lit(","),
          lpad((floor(col("o_totalprice")).cast("long") % 1000).cast("string"), 3, "0")))
      val dateStr = when(col("o_orderkey") % 89 === 0, lit(""))
        .otherwise(col("o_orderdate").cast("date").cast("string"))
      o.withColumn("raw_price", raw)
        .withColumn("scrubbed_price",
          when(col("raw_price").isNull || col("raw_price") === "N/A" || col("raw_price") === "",
            lit(null).cast("long"))
            .otherwise(regexp_replace(col("raw_price"), ",", "").cast("long")))
        .withColumn("order_date",
          when(dateStr === "", lit(null).cast("date")).otherwise(dateStr.cast("date")))
        .select("o_orderkey", "raw_price", "scrubbed_price", "order_date")
        .orderBy("o_orderkey")
    }),

    // J1/J2 + P10: left-enrich with missing-flag; NULL keys never match.
    "q05_left_join_missing" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val dim = table(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .withColumnRenamed("c_custkey", "o_custkey")
      leftEnrich(o, dim, Seq("o_custkey"), "missing_customer", "c_name")
        .groupBy("missing_customer")
        .agg(count(lit(1)).as("nb_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy("missing_customer")
    }),

    // P7-P11: year extraction, coalesce fallback, weighted composite score
    // with CASE fallback, threshold flags (movies_enriched_daily.sql:97-114).
    "q06_enriched_flags" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val dim = table(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      leftEnrich(o, dim, Seq("o_custkey"), "missing_customer", "c_name")
        .withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .withColumn("fallback_bal", coalesce(col("c_acctbal"), col("o_totalprice")))
        // Rounded outputs go through DECIMAL(18,2) quantization on BOTH
        // engines (not round-on-double): Spark round() is exact-BigDecimal
        // HALF_UP while DuckDB round() scales by 10^n on the double — they
        // can disagree by one ULP-step on boundary values. double→decimal
        // casts are correctly-rounded in both, so the quantized value (and
        // its double image) is bit-identical.
        .withColumn("composite_score",
          when(col("c_acctbal").isNotNull,
            (col("o_totalprice") * 0.6 + col("c_acctbal") * 0.4))
            .otherwise(col("o_totalprice"))
            .cast("decimal(18,2)").cast("double"))
        .withColumn("is_big",
          when(col("o_totalprice") >= 150000.0 && coalesce(col("c_acctbal"), lit(0.0)) < 1000.0, true)
            .otherwise(false))
        .withColumn("is_small",
          when(col("o_totalprice") < 50000.0 && coalesce(col("c_acctbal"), lit(0.0)) >= 9000.0, true)
            .otherwise(false))
        .select("o_orderkey", "order_year", "fallback_bal", "composite_score",
                "is_big", "is_small", "missing_customer")
        .orderBy("o_orderkey")
    }),

    // A1-A5: the kpi_daily_summary shape — one row per day: counts,
    // conditional counts, coverage ratio, null-skipping means, flag counts.
    "q07_kpi_daily" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .groupBy("event_date")
        .agg(
          count(lit(1)).as("nb_events"),
          countIf(col("event_type") === "click").as("nb_clicks"),
          countIf(col("event_type") === "error").as("nb_errors"),
          davg(col("value"), 4).as("avg_value"),
          countIf(col("value") >= 10.0).as("nb_high_value")
        )
        .withColumn("click_ratio",
          (col("nb_clicks").cast("double") / col("nb_events").cast("double"))
            .cast("decimal(18,4)").cast("double"))
        .orderBy(asc_nulls_last("event_date"))
    }),

    // J1 at scale: multi-way dim join (region⋈nation⋈customer⋈orders).
    // Broadcast hints ONLY on the fixed-cardinality dims (region: 5 rows,
    // nation: 25); customer grows with SF, so its join strategy is left to
    // AQE — a forced broadcast would OOM executors at 100× (VERDICT r1).
    "q08_join3_rollup" -> ((s, dir) => {
      val region = table(s, dir, "region")
      val nation = table(s, dir, "nation")
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("nb_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("r_name")
    }),

    // Window ranking: top-3 orders per customer (generic form of the
    // reference's per-entity top-k; §2.5 beyond-parity surface).
    "q09_window_topn" -> ((s, dir) => {
      topNPerGroup(table(s, dir, "orders"), Seq("o_custkey"), 3,
                   col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // Window frame: running per-user sum over event time (decimal-exact).
    "q10_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // S7: keyed last-write-wins (upsert semantics: latest event per user,
    // deterministic tiebreak on event_id — SURVEY §7.4.1).
    "q11_last_write_wins" -> ((s, dir) => {
      lastWriteWins(table(s, dir, "events"), Seq("user_id"),
                    col("ts").desc, col("event_id").desc)
        .withColumn("ts_us", unix_micros(col("ts")))
        .select("user_id", "event_id", "ts_us", "value")
        .orderBy("user_id")
    }),

    // Q1-Q3: dbt-style not_null / unique assertion counts as data.
    "q12_dq_checks" -> ((s, dir) => {
      val o = table(s, dir, "orders").agg(
        countIf(col("o_custkey").isNull).as("orders_null_cust"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orders_dup_keys"))
      val c = table(s, dir, "customer").agg(
        countIf(col("c_name").isNull).as("cust_null_name"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("cust_dup_keys"))
      o.crossJoin(c)
    }),

    // Semi/anti join surface (§2.3 note: free via the same join primitive).
    "q13_semi_anti" -> ((s, dir) => {
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
      val withO = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("nb_with_orders"))
      val withoutO = customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("nb_without_orders"))
      withO.crossJoin(withoutO)
    }),

    // Set operators (INTERSECT / EXCEPT / UNION, set semantics).
    "q14_set_ops" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(col("c_custkey").as("key")).distinct()
      val o = table(s, dir, "orders").select(col("o_custkey").as("key")).distinct()
      c.intersect(o).agg(count(lit(1)).as("nb_intersect"))
        .crossJoin(c.except(o).agg(count(lit(1)).as("nb_except")))
        .crossJoin(c.union(o).distinct().agg(count(lit(1)).as("nb_union")))
    }),

    // Grouping sets (ROLLUP) — beyond-parity aggregation surface.
    "q15_rollup" -> ((s, dir) => {
      table(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("nb"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // Exact DISTINCT aggregation.
    "q16_distinct_agg" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("nb_customers"),
             count(lit(1)).as("nb_orders"))
        .orderBy("o_orderpriority")
    }),

    // J2's defining semantic, explicitly exercised: INJECTED NULL left keys
    // must never match the dimension (SQL null-equality), leaving the
    // missing-flag true for exactly those rows (VERDICT r1 item 8).
    "q25_nullkey_join" -> ((s, dir) => {
      val o = table(s, dir, "orders")
        .withColumn("join_key",
          when(col("o_orderkey") % 13 === 0, lit(null)).otherwise(col("o_custkey")))
      val dim = table(s, dir, "customer").withColumnRenamed("c_custkey", "join_key")
      leftEnrich(o, dim, Seq("join_key"), "missing_customer", "c_name")
        .groupBy(col("join_key").isNull.as("null_key"), col("missing_customer"))
        .agg(count(lit(1)).as("nb_orders"))
        .orderBy("null_key", "missing_customer")
    }),

    // Snapshot diff: today's documents snapshot vs yesterday's — every
    // 17th doc removed, every 13th edited, every 19th re-keyed as an
    // addition. The full-outer classification must label each key exactly
    // (null-safe compares; removal beats edit where the selectors overlap).
    "q59_snapshot_diff" -> ((s, dir) => {
      val d = table(s, dir, "documents").select("doc_id", "text", "n_chars")
      val today = d.filter(col("doc_id") % 17 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("n_chars")))
      snapshotDiff(d, today, "doc_id", Seq("text", "n_chars"))
        .orderBy("doc_id")
    }),

    // P9 in its exact reference shape: THREE-branch composite fallback
    // (both stats → weighted+rounded; primary only → primary unrounded;
    // else → base metric), per movies_enriched_daily.sql:97-103.
    "q26_composite_3branch" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val dim = table(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      o.join(dim, Seq("o_custkey"), "left")
        .withColumn("primary_stat",
          when(col("c_acctbal") >= 1000.0, col("c_acctbal")))
        .withColumn("secondary_stat",
          when(col("o_totalprice") >= 100000.0, col("o_totalprice")))
        .withColumn("composite",
          when(col("primary_stat").isNotNull && col("secondary_stat").isNotNull,
            (col("primary_stat") * 0.6 + (col("secondary_stat") / 10.0) * 0.4)
              .cast("decimal(18,2)"))
            .when(col("primary_stat").isNotNull, col("primary_stat").cast("decimal(18,2)"))
            .otherwise(col("o_totalprice").cast("decimal(18,2)"))
            // double output face: decimal(18,2)→double is exact, while
            // pandas narrows small decimals to float64 only on one side
            .cast("double"))
        .select("o_orderkey", "primary_stat", "secondary_stat", "composite")
        .orderBy("o_orderkey")
    }),

    // As-of join (beyond-parity operator surface): each event picks up the
    // customer's latest order at-or-before the event time; ties on order
    // date resolve to the greatest orderkey. One shuffle on the key.
    "q27_asof_join" -> ((s, dir) => {
      val events = table(s, dir, "events").select("event_id", "user_id", "ts")
      val orders = table(s, dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      asOfJoin(events, orders,
          factKey = "user_id", dimKey = "o_custkey",
          factTime = "ts", dimTime = "o_orderdate", dimTieBreak = "o_orderkey",
          payload = Seq("o_totalprice"))
        .select(col("event_id"),
          // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the
          // cast is a type-face change, micros match DuckDB's epoch_us
          unix_micros(col("asof_o_orderdate").cast("timestamp")).as("asof_date_us"),
          col("asof_o_orderkey").as("asof_orderkey"),
          col("asof_o_totalprice").as("asof_totalprice"))
        .orderBy("event_id")
    }),

    // Binned range join (beyond-parity): events inside each order's 3-day
    // window for the same customer, rolled up per order. The interval
    // match runs as an equi-join on (key, day-bin) + exact filter — never
    // a nested-loop join.
    "q28_range_join" -> ((s, dir) => {
      val events = table(s, dir, "events").select("event_id", "user_id", "ts", "value")
      val orders = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("o_start"))
        .withColumn("o_end", col("o_start") + expr("INTERVAL 3 DAYS"))
      rangeJoin(events, orders, "user_id", "o_custkey", "ts", "o_start", "o_end",
          binSeconds = 86400L)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("nb_events"), dsum(col("value")).as("total_value"))
        .orderBy("o_orderkey")
    }),

    // CUBE grouping sets: every (status, priority) subtotal combination.
    "q30_cube" -> ((s, dir) => {
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("nb"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // Pivot (wide reshaping): order counts per priority × status. Spark's
    // pivot() is sugar over conditional aggregation, which is exactly how
    // the oracle expresses it — explicit value list keeps plans static.
    "q34_pivot" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")
    }),

    // Unpivot (long reshaping): per-order metric rows from wide columns.
    "q35_unpivot" -> ((s, dir) => {
      table(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey", "o_totalprice", "o_custkey")
        .unpivot(
          Array(col("o_orderkey")),
          Array(col("o_totalprice").cast("double").as("o_totalprice"),
                col("o_custkey").cast("double").as("o_custkey")),
          "metric", "value")
        .orderBy("o_orderkey", "metric")
    }),

    // SQL entry path (spark.sql over registered views) with a correlated
    // scalar subquery — Catalyst decorrelates it into a join, same engine
    // surface users of the SQL API hit.
    "q38_sql_subquery" -> ((s, dir) => {
      table(s, dir, "customer").createOrReplaceTempView("customer_v")
      table(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT CAST(count(*) AS BIGINT) FROM orders_v o
          |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0) AS nb_big_orders
          |FROM customer_v c
          |WHERE c_custkey % 50 = 0
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Calendar-function battery with conventions explicitly aligned
    // (day-of-week origins differ across engines; ISO week matches).
    "q37_date_parts" -> ((s, dir) => {
      table(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .withColumn("d", to_date(col("o_orderdate")))
        .select(col("o_orderkey"),
          year(col("d")).as("y"),
          month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          (dayofweek(col("d")) - 1).as("dow_sun0"), // Spark: Sun=1 → Sun=0
          dayofyear(col("d")).as("doy"),
          quarter(col("d")).as("q"),
          weekofyear(col("d")).as("iso_week"),
          date_format(col("d"), "yyyy-MM").as("ym"),
          unix_date(col("d")).as("epoch_days"))
        .orderBy("o_orderkey")
    }),

    // Exact quantiles (ordered-set aggregate surface): engine-exact ONLY
    // because l_quantity is integer-valued — linear interpolation between
    // integer-valued doubles at f ∈ {0, .25, .5, .75} is exact IEEE
    // arithmetic under either engine's formula, so values hash-match.
    "q32_quantiles" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("nb"))
        .orderBy("l_returnflag")
    }),

    // Gap-based sessionization (stream-analytics staple): a new session
    // starts after a >30-minute silence per user; pure lag+cumsum window
    // logic on epoch micros — exact integer arithmetic in both engines.
    // Event funnel: first view → first click at-or-after it → first
    // purchase at-or-after that, per user. Three stacked window minima
    // over ONE user-partitioned sort (Spark evaluates successive Window
    // operators over the same partitioning without re-shuffling), then a
    // per-user rollup. NULL stage times propagate: no view → no eligible
    // click, exactly the funnel semantics.
    "q60_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      val ev = table(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
      ev
        .withColumn("v_us",
          min(when(col("event_type") === "view", col("ts_us"))).over(w))
        .withColumn("c_us",
          min(when(col("event_type") === "click" && col("ts_us") >= col("v_us"),
            col("ts_us"))).over(w))
        .withColumn("p_us",
          min(when(col("event_type") === "purchase" && col("ts_us") >= col("c_us"),
            col("ts_us"))).over(w))
        .groupBy("user_id")
        .agg(max(col("v_us")).as("first_view_us"),
          max(col("c_us")).as("first_click_us"),
          max(col("p_us")).as("first_purchase_us"))
        .withColumn("reached_stage",
          when(col("first_purchase_us").isNotNull, 3)
            .when(col("first_click_us").isNotNull, 2)
            .when(col("first_view_us").isNotNull, 1)
            .otherwise(0))
        .orderBy("user_id")
    }),

    // Cohort retention: users bucketed by first-seen date, activity counted
    // per (cohort, day offset) — two partial+final aggregates around an
    // id-keyed join (the first-seen side is users-sized, AQE broadcasts it
    // at small SF; at scale both sides shuffle on user_id once).
    "q61_retention" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy("user_id").agg(min(col("d")).as("cohort"))
      ev.join(first, Seq("user_id"))
        .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
        .agg(count_distinct(col("user_id")).as("nb_active"))
        .orderBy("cohort", "day_offset")
    }),

    "q31_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = table(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("nb_events"),
          // floor division (not a double→long cast: Spark truncates where
          // DuckDB's cast rounds — floor matches `//` for positives)
          floor((max(col("ts_us")) - min(col("ts_us"))) / 1000000L).cast("long")
            .as("duration_s"))
        .groupBy("user_id")
        .agg(max(col("session_id")).as("nb_sessions"),
          max(col("nb_events")).as("max_session_events"),
          max(col("duration_s")).as("max_session_s"))
        .orderBy("user_id")
    }),

    // Skew-mitigating salted join under a REAL hot key: ~70% of the fact
    // rows collapse onto key 0 — the shape where a plain hash join parks
    // 70% of the probe side on one reducer and the stage runs at
    // straggler speed. saltedJoin spreads the hot key across 8 salt
    // lanes (dim replicated 8×, fact salted by a deterministic row
    // hash); the oracle is the PLAIN join — salting must be invisible in
    // the result. Decimal-path sum keeps the per-key aggregate
    // order-independent for the hash compare.
    "q81_salted_join" -> ((s, dir) => {
      val fact = table(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 < 7, lit(0L))
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_quantity"))
      val dim = table(s, dir, "part")
        .groupBy((col("p_partkey") % 100).as("k"))
        .agg(min(col("p_brand")).as("brand"))
      saltedJoin(fact, dim, Seq("k"), buckets = 8)
        .groupBy(col("k"), col("brand"))
        .agg(count(lit(1)).as("nb_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy("k")
    }),

    // Flagship-lifecycle macro-benchmark: a 5-day Pipeline.backfill over
    // a deterministic synthetic raw zone (SyntheticRaw, sliding ~80%-
    // overlap id windows) — per-day manifests, DQ gates, dynamic
    // partition overwrites and serving sinks, ten times over. The
    // construction RUNS the backfill, so Bench's timing captures the
    // per-day overhead the golden tests can't see regressing; the result
    // face is the per-day KPI read back from the lake it just wrote.
    // The arc is 5 days (was 10, was 30): the signal is per-day overhead × N,
    // so a longer arc only multiplies bench wall without adding
    // information — tools/TimeBackfill.scala covers long arcs. DuckDB
    // cannot replay the lifecycle, but the RESULT face is closed-form:
    // SyntheticRaw's values are pure functions of (day, id), every day
    // carries exactly 50 popular movies whose id window starts on a
    // multiple of 10, and the OMDb docs exist for ids with i%2==0 and
    // i%5!=0 — 4 per 10 consecutive ids = 20 per day. The oracle
    // therefore generates the expected (snapshot_date, 50, 20) rows
    // arithmetically (see `oracles`), making this row hash-checkable
    // without replaying the lifecycle. Bench runs it single-pass (see
    // Bench.singlePass).
    "q82_backfill_days" -> ((s, dir) => {
      // 5 days (was 10): the signal is per-day overhead x N, so the arc
      // only needs enough days to average startup noise (VERDICT r15
      // #4); tools/TimeBackfill.scala covers long arcs
      val dates = (1 to 5).map(d => f"2026-03-$d%02d")
      val base = java.nio.file.Files.createTempDirectory("graft-q82-").toString
      graft.sources.SyntheticRaw.writeDays(s"$base/raw", dates, moviesPerDay = 50)
      val cfg = graft.Pipeline.Config(s"$base/raw", s"$base/lake",
        s"$base/serving", dates.head, "bench", multiLineRaw = false)
      val ran = graft.Pipeline.backfill(s, cfg, dates, retries = 0,
        sleeper = _ => ())
      require(ran.size == dates.size,
        s"backfill completed ${ran.size}/${dates.size} days")
      graft.io.LakeZones.readTable(s, cfg.lakeRoot, "usage", "kpi_daily")
        .select(col("snapshot_date").cast("string").as("snapshot_date"),
          col("nb_movies"), col("nb_movies_with_omdb"))
        .orderBy("snapshot_date")
    }),

    // Star-schema rollup across the full dimension chain: lineitem ⋈
    // orders ⋈ customer ⋈ nation ⋈ region, revenue per (region, nation,
    // order year). The fact-side joins shuffle on their keys; the two
    // geography dims ride explicit broadcasts (they are constant-sized
    // at any SF — the canonical small-dim case). Revenue is an exact
    // DECIMAL product-sum — price(18,2) × (1 − discount)(18,2) has 4dp,
    // summed exactly in any order — cast to double only at the surface.
    "q105_star_revenue" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"),
          year(col("o_orderdate")).as("yr"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
              col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("nb_items"))
        .orderBy("r_name", "n_name", "yr")
    }),

    // Exact integer PageRank over the part co-purchase graph (parts
    // that share an order, symmetrized). Fixed-point arithmetic makes
    // an ITERATIVE graph computation hash-comparable: every floor
    // division is replayed verbatim by the oracle's // chain, and the
    // result is bit-identical on any partitioning (GraphSpec +
    // DeterminismGate). 3 iterations, mass normalized to 10^15.
    "q125_pagerank" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val a = li.toDF("o", "pa")
      val b = li.toDF("o", "pb")
      val pairs = a.join(b, "o").filter(col("pa") < col("pb"))
        .select(col("pa").as("src"), col("pb").as("dst")).distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      // edges are distinct by construction (distinct pairs with src<dst,
      // unioned with their disjoint flips) — skip the operator's de-dup
      // exchange (r17-opt)
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3,
          assumeDistinctEdges = true)
        .orderBy("node")
    }),

    // PageRank with dangling-mass REDISTRIBUTION (VERDICT r12 #5) on a
    // genuinely dangling graph: the directed supplies graph
    // supplier → part (parts offset by 100000 so key spaces never
    // collide) has every part node sink-only, so most of the mass is
    // dangling every iteration; each round measures it and hands every
    // node `D div N` before damping — exact integers, replayed verbatim
    // by the oracle's unrolled CTE chain (tol=0: a data-dependent early
    // stop can't be replayed by fixed-depth SQL; the stop itself is
    // unit-pinned against closed-form fixed points in GraphSpec).
    "q132_pagerank_dangling" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val edges = li.select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey").cast("long") + 100000L).as("dst")).distinct()
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3,
        redistributeDangling = true,
        // the caller's own distinct makes the operator's de-dup pass
        // redundant (r17-opt)
        assumeDistinctEdges = true)
        .orderBy("node")
    }),

    // Exact per-node triangle counts on the same co-purchase graph —
    // the orientation trick (a<b ⋈ b<c ⋈ a<c) materializes each
    // triangle once; items sharing an order form cliques, so the count
    // is C(k−1, 2)-ish per member and the oracle replays the identical
    // triple join.
    "q126_triangles" -> ((s, dir) => {
      val li = table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val a = li.toDF("o", "pa")
      val b = li.toDF("o", "pb")
      // repeat co-purchases only (>= 2 shared orders): single-order
      // co-occurrence is noise and keeping it makes the graph dense
      // enough that exact wedge enumeration dominates the whole bench
      val pairs = a.join(b, "o").filter(col("pa") < col("pb"))
        .groupBy(col("pa").as("src"), col("pb").as("dst"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select("src", "dst")
      graft.ops.Graph.triangles(pairs, "src", "dst")
        .orderBy("node")
    }),

    // SCD2 snapshot collapse: each user's per-day dominant event type is
    // a daily snapshot series; scd2 turns it into validity intervals —
    // versions break on attribute change, presence gaps are spanned
    // (both semantics replayed by the oracle's window chain).
    "q127_scd2_user_type" -> ((s, dir) => {
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      graft.ops.Temporal.scd2(snap, Seq("user_id"), Seq("etype"), "snap_date")
        .orderBy("user_id", "version")
    }),

    // SCD2 with ABSENCE AS DELETION (VERDICT r12 #7): same snapshot
    // series as q127, but a user missing from a snapshot day (while
    // other users were observed) CLOSES the running version — the
    // events fixture is sparse per user, so most users carry several
    // gap-closed intervals that plain scd2 would span. version is
    // renumbered densely over the present runs; the oracle replays the
    // calendar grid, presence flag and run collapse.
    "q133_scd2_deletions" -> ((s, dir) => {
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      graft.ops.Temporal.scd2WithDeletions(snap, Seq("user_id"),
        Seq("etype"), "snap_date")
        .select("user_id", "version", "valid_from", "valid_to",
          "nb_snapshots", "etype")
        .orderBy("user_id", "version")
    }),

    // Incremental SCD2 (VERDICT r13 #3): the first N−3 snapshot dates
    // bootstrap a persisted fold state (each key's open/closed latest
    // version, key-bucketed, ledgered); the query clones the fixture
    // (folds mutate the state they read — the q138 discipline) and folds
    // the LAST 3 dates one at a time, each a single key-shuffle over
    // current ∪ delta with no history rescan. Output = the state's
    // intervals, which must equal — and the oracle replays — a one-shot
    // scd2WithDeletions over ALL snapshots (q133's calendar-grid SQL).
    "q139_scd2_fold" -> ((s, dir) => {
      import graft.ops.Scd2State
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      // calendar-bounded driver-side list: the split adapts to whatever
      // date range a testdata regeneration produces
      val dates = snap.select(date_format(col("snap_date"), "yyyy-MM-dd").as("d"))
        .distinct().orderBy("d").collect().map(_.getString(0)).toSeq
      require(dates.length >= 4, s"q139 needs >= 4 snapshot dates, got $dates")
      val (bootDates, foldDates) = dates.splitAt(dates.length - 3)
      val fixture = LlmQueries.cachedFixture("q139", dir) { r =>
        Scd2State.bootstrap(
          snap.filter(date_format(col("snap_date"), "yyyy-MM-dd")
            .isin(bootDates: _*)),
          Seq("user_id"), Seq("etype"), "snap_date", r)
      }
      val root = LlmQueries.cloneFixture("q139", dir, fixture)
      foldDates.foreach { dt =>
        Scd2State.fold(
          snap.filter(date_format(col("snap_date"), "yyyy-MM-dd") === dt)
            .select("user_id", "etype"), root, dt)
      }
      Scd2State.intervals(s, root)
        .select("user_id", "version", "valid_from", "valid_to",
          "nb_snapshots", "etype")
        .orderBy("user_id", "version")
    }),

    // Date-range-PRUNED point-in-time over the PERSISTED SCD2 store
    // (VERDICT r15 #7): the fixture folds the whole events snapshot
    // calendar into Scd2State (bootstrap + daily folds — each fold
    // range-manifests its retired generation), then the query answers
    // "which interval covered the median calendar date" through
    // intervalsAt, which opens ONLY the history generations whose
    // manifested [min valid_from, max valid_to] overlaps the date
    // (Scd2StateSpec pins the file-count assertion; this row pins the
    // ANSWER against DuckDB's batch replay of the same PIT filter).
    // Read-only at query time — no per-invocation clone.
    "q152_pit_pruned" -> ((s, dir) => {
      import graft.ops.Scd2State
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      val dates = snap
        .select(date_format(col("snap_date"), "yyyy-MM-dd").as("d"))
        .distinct().orderBy("d").collect().map(_.getString(0)).toSeq
      val fixture = LlmQueries.cachedFixture("q152", dir) { r =>
        Scd2State.bootstrap(
          snap.filter(date_format(col("snap_date"), "yyyy-MM-dd") === dates.head),
          Seq("user_id"), Seq("etype"), "snap_date", r)
        dates.tail.foreach { dt =>
          Scd2State.fold(
            snap.filter(date_format(col("snap_date"), "yyyy-MM-dd") === dt)
              .select("user_id", "etype"), r, dt)
        }
      }
      val pit = dates((dates.size - 1) / 2) // the median calendar date
      Scd2State.intervalsAt(s, fixture, pit)
        .select("user_id", "version", "valid_from", "valid_to",
          "nb_snapshots", "etype")
        .orderBy("user_id", "version")
    }),

    // RANGE face of the pruned PIT read (VERDICT r16 #3): the same
    // persisted SCD2 store answers "every interval overlapping the
    // middle third of the calendar" through intervalsBetween — the
    // read a fact table spanning a date window needs before a PIT
    // join. The window CROSSES history-generation boundaries (each
    // fold's retirements land in their own d=<date> dir), which is
    // exactly where a range-manifest bug would hide; construction
    // asserts the plan opens ≥2 overlapping generations, skips ≥1
    // non-overlapping one, and scans no files outside the kept dirs ∪
    // current. The oracle replays the batch interval derivation plus
    // the overlap filter in DuckDB. Shares q152's read-only fixture.
    "q153_pit_range" -> ((s, dir) => {
      import graft.ops.Scd2State
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      val dates = snap
        .select(date_format(col("snap_date"), "yyyy-MM-dd").as("d"))
        .distinct().orderBy("d").collect().map(_.getString(0)).toSeq
      val fixture = LlmQueries.cachedFixture("q152", dir) { r =>
        Scd2State.bootstrap(
          snap.filter(date_format(col("snap_date"), "yyyy-MM-dd") === dates.head),
          Seq("user_id"), Seq("etype"), "snap_date", r)
        dates.tail.foreach { dt =>
          Scd2State.fold(
            snap.filter(date_format(col("snap_date"), "yyyy-MM-dd") === dt)
              .select("user_id", "etype"), r, dt)
        }
      }
      val lo = dates(dates.size / 3)
      val hi = dates(2 * dates.size / 3)
      val kept = Scd2State.prunedHistLabels(s, fixture, lo, hi)
      require(kept.size >= 2,
        s"q153 window [$lo,$hi] must cross >=2 history generations: $kept")
      val out = Scd2State.intervalsBetween(s, fixture, lo, hi)
      val histFiles = out.inputFiles.filter(_.contains("/history/d="))
      require(histFiles.nonEmpty &&
        histFiles.forall(f => kept.exists(l => f.contains(s"/d=$l/"))),
        s"q153 plan reads non-overlapping generations:\n${histFiles.mkString("\n")}")
      require(histFiles.isEmpty ||
        Scd2State.prunedHistLabels(s, fixture, dates.head, dates.last)
          .size > kept.size,
        s"q153 window must actually prune (kept all ${kept.size} dirs)")
      out.select("user_id", "version", "valid_from", "valid_to",
          "nb_snapshots", "etype")
        .orderBy("user_id", "version")
    }),


    // DELETION-AWARE point-in-time (VERDICT r13 #8): the dimension is
    // scd2WithDeletions — a user's absence closes their interval — and
    // the fact side plants every event AGAIN dated one day later
    // (+10000000 ids). A planted fact whose user was observed the next
    // day joins that run; one falling in a deletion gap (or past the
    // user's last observation) finds NO covering version and provably
    // DROPS from the inner join — the semantics plain scd2 (q128) can't
    // express, since its gap-spanning intervals would cover it.
    "q142_pit_deletions" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("fd"))
      val facts = ev.unionByName(ev.select(
        (col("event_id") + 10000000L).as("event_id"), col("user_id"),
        date_add(col("fd"), 1).as("fd")))
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      val dim = graft.ops.Temporal.scd2WithDeletions(snap, Seq("user_id"),
        Seq("etype"), "snap_date")
      graft.ops.Temporal.pitJoin(facts, dim, Seq("user_id"), "fd")
        .select("event_id", "user_id", "fd", "version", "etype")
        .orderBy("event_id")
    }),

    // Point-in-time enrichment: every event joins the SCD2 version
    // covering its date (dimension derived from the same events — the
    // aliased self-lineage case). Coverage is total by construction, so
    // the inner join returns one row per event.
    "q128_pit_enrich" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("fd"))
      val snap = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("snap_date"))
        .agg(max(col("event_type")).as("etype"))
      val dim = graft.ops.Temporal.scd2(snap, Seq("user_id"), Seq("etype"),
        "snap_date")
      graft.ops.Temporal.pitJoin(ev, dim, Seq("user_id"), "fd")
        .select("event_id", "user_id", "fd", "version", "etype")
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q03_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(count(*) AS BIGINT) AS nb_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY k NULLS LAST""".stripMargin,

    "q04_scrub_cast" ->
      """WITH raws AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN 'N/A'
        |         WHEN o_orderkey % 101 = 0 THEN ''
        |         ELSE concat(CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS VARCHAR), ',',
        |                     lpad(CAST(CAST(floor(o_totalprice) AS BIGINT) % 1000 AS VARCHAR), 3, '0'))
        |    END AS raw_price,
        |    CASE WHEN o_orderkey % 89 = 0 THEN ''
        |         ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS date_str
        |  FROM orders)
        |SELECT o_orderkey, raw_price,
        |  CASE WHEN raw_price IS NULL OR raw_price = 'N/A' OR raw_price = '' THEN NULL
        |       ELSE CAST(replace(raw_price, ',', '') AS BIGINT) END AS scrubbed_price,
        |  CASE WHEN date_str = '' THEN NULL ELSE CAST(date_str AS DATE) END AS order_date
        |FROM raws ORDER BY o_orderkey""".stripMargin,

    "q05_left_join_missing" ->
      """SELECT (c.c_name IS NULL) AS missing_customer,
        |  CAST(count(*) AS BIGINT) AS nb_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders o
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY missing_customer""".stripMargin,

    "q06_enriched_flags" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
        |  coalesce(c_acctbal, o_totalprice) AS fallback_bal,
        |  CAST(CAST(CASE WHEN c_acctbal IS NOT NULL THEN o_totalprice * 0.6 + c_acctbal * 0.4
        |       ELSE o_totalprice END AS DECIMAL(18,2)) AS DOUBLE) AS composite_score,
        |  CASE WHEN o_totalprice >= 150000.0 AND coalesce(c_acctbal, 0.0) < 1000.0 THEN true
        |       ELSE false END AS is_big,
        |  CASE WHEN o_totalprice < 50000.0 AND coalesce(c_acctbal, 0.0) >= 9000.0 THEN true
        |       ELSE false END AS is_small,
        |  (c_name IS NULL) AS missing_customer
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q07_kpi_daily" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(count(*) AS BIGINT) AS nb_events,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb_clicks,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS nb_errors,
        |  CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS DECIMAL(18,4)) AS DOUBLE) AS avg_value,
        |  CAST(sum(CASE WHEN value >= 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS nb_high_value,
        |  CAST(CAST(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE) AS DECIMAL(18,4)) AS DOUBLE) AS click_ratio
        |FROM events GROUP BY 1 ORDER BY event_date NULLS LAST""".stripMargin,

    "q08_join3_rollup" ->
      """SELECT r_name,
        |  CAST(count(*) AS BIGINT) AS nb_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q09_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q10_window_running" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q11_last_write_wins" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q12_dq_checks" ->
      """SELECT * FROM
        |(SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_null_cust,
        |        CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS orders_dup_keys FROM orders)
        |CROSS JOIN
        |(SELECT CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_null_name,
        |        CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS cust_dup_keys FROM customer)""".stripMargin,

    "q13_semi_anti" ->
      """SELECT * FROM
        |(SELECT CAST(count(*) AS BIGINT) AS nb_with_orders FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |CROSS JOIN
        |(SELECT CAST(count(*) AS BIGINT) AS nb_without_orders FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))""".stripMargin,

    "q14_set_ops" ->
      """SELECT * FROM
        |(SELECT CAST(count(*) AS BIGINT) AS nb_intersect FROM
        | (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders))
        |CROSS JOIN
        |(SELECT CAST(count(*) AS BIGINT) AS nb_except FROM
        | (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders))
        |CROSS JOIN
        |(SELECT CAST(count(*) AS BIGINT) AS nb_union FROM
        | (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders))""".stripMargin,

    "q15_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q16_distinct_agg" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS nb_customers,
        |  CAST(count(*) AS BIGINT) AS nb_orders
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q25_nullkey_join" ->
      """WITH o AS (
        |  SELECT *, CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END AS join_key
        |  FROM orders)
        |SELECT (join_key IS NULL) AS null_key,
        |       (c_name IS NULL) AS missing_customer,
        |       CAST(count(*) AS BIGINT) AS nb_orders
        |FROM o LEFT JOIN customer ON join_key = c_custkey
        |GROUP BY 1, 2 ORDER BY null_key, missing_customer""".stripMargin,

    "q59_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text, n_chars FROM documents),
        |new AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' edited' ELSE text END AS text,
        |    n_chars
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text, n_chars FROM documents WHERE doc_id % 19 = 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS DISTINCT FROM n.text
        |         OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'changed'
        |       ELSE 'unchanged' END AS change_type
        |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q26_composite_3branch" ->
      """WITH j AS (
        |  SELECT o_orderkey, o_totalprice,
        |    CASE WHEN c_acctbal >= 1000.0 THEN c_acctbal END AS primary_stat,
        |    CASE WHEN o_totalprice >= 100000.0 THEN o_totalprice END AS secondary_stat
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey)
        |SELECT o_orderkey, primary_stat, secondary_stat,
        |  CAST(CASE WHEN primary_stat IS NOT NULL AND secondary_stat IS NOT NULL
        |         THEN CAST(primary_stat * 0.6 + (secondary_stat / 10.0) * 0.4 AS DECIMAL(18,2))
        |       WHEN primary_stat IS NOT NULL THEN CAST(primary_stat AS DECIMAL(18,2))
        |       ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DOUBLE) AS composite
        |FROM j ORDER BY o_orderkey""".stripMargin,

    "q27_asof_join" ->
      """WITH tagged AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, 1 AS is_dim, o_orderkey AS tie,
        |         o_orderdate AS p_date, o_orderkey AS p_key, o_totalprice AS p_price,
        |         NULL::BIGINT AS event_id
        |  FROM orders
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, NULL, NULL, NULL, event_id FROM events),
        |w AS (
        |  SELECT event_id, is_dim,
        |    last_value(CASE WHEN is_dim = 1 THEN p_date END IGNORE NULLS)
        |      OVER win AS asof_date,
        |    last_value(CASE WHEN is_dim = 1 THEN p_key END IGNORE NULLS)
        |      OVER win AS asof_orderkey,
        |    last_value(CASE WHEN is_dim = 1 THEN p_price END IGNORE NULLS)
        |      OVER win AS asof_totalprice
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY k ORDER BY t, is_dim DESC, tie NULLS LAST
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, epoch_us(asof_date) AS asof_date_us,
        |       asof_orderkey, asof_totalprice
        |FROM w WHERE is_dim = 0 ORDER BY event_id""".stripMargin,

    "q28_range_join" ->
      """SELECT o_orderkey,
        |  CAST(count(*) AS BIGINT) AS nb_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders JOIN events
        |  ON user_id = o_custkey
        | AND ts >= o_orderdate AND ts < o_orderdate + INTERVAL 3 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q30_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS nb,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q38_sql_subquery" ->
      """SELECT c_custkey,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0) AS nb_big_orders
        |FROM customer c
        |WHERE c_custkey % 50 = 0
        |ORDER BY c_custkey""".stripMargin,

    "q37_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(date_part('year', o_orderdate) AS INT) AS y,
        |  CAST(date_part('month', o_orderdate) AS INT) AS m,
        |  CAST(date_part('day', o_orderdate) AS INT) AS dom,
        |  CAST(date_part('dow', o_orderdate) AS INT) AS dow_sun0,
        |  CAST(date_part('doy', o_orderdate) AS INT) AS doy,
        |  CAST(date_part('quarter', o_orderdate) AS INT) AS q,
        |  CAST(date_part('week', o_orderdate) AS INT) AS iso_week,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(CAST(CAST(o_orderdate AS DATE) AS DATE) - DATE '1970-01-01' AS INT) AS epoch_days
        |FROM orders WHERE o_orderkey % 500 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q34_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q35_unpivot" ->
      """SELECT o_orderkey, 'o_totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value
        |FROM orders WHERE o_orderkey % 100 = 0
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey', CAST(o_custkey AS DOUBLE)
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey, metric""".stripMargin,

    "q32_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  CAST(count(*) AS BIGINT) AS nb
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q60_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN ts_us END) AS v_us
        |      FROM ev GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS c_us
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us >= v.v_us GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS p_us
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us >= c.c_us GROUP BY 1)
        |SELECT v.user_id, v.v_us AS first_view_us, c.c_us AS first_click_us,
        |  p.p_us AS first_purchase_us,
        |  CAST(CASE WHEN p.p_us IS NOT NULL THEN 3
        |       WHEN c.c_us IS NOT NULL THEN 2
        |       WHEN v.v_us IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached_stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q61_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY 1)
        |SELECT cohort, CAST(date_diff('day', cohort, d) AS INT) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS nb_active
        |FROM ev e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,

    "q31_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us, event_id,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |per AS (
        |  SELECT user_id, session_id,
        |    CAST(count(*) AS BIGINT) AS nb_events,
        |    CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_s
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(max(session_id) AS BIGINT) AS nb_sessions,
        |  CAST(max(nb_events) AS BIGINT) AS max_session_events,
        |  CAST(max(duration_s) AS BIGINT) AS max_session_s
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the PLAIN join — salting must be invisible in the result
    "q81_salted_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
        |              ELSE l_orderkey % 100 END AS k,
        |         l_quantity
        |  FROM lineitem),
        |dim AS (
        |  SELECT p_partkey % 100 AS k, min(p_brand) AS brand
        |  FROM part GROUP BY 1)
        |SELECT CAST(fact.k AS BIGINT) AS k, brand,
        |  CAST(count(*) AS BIGINT) AS nb_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM fact JOIN dim ON fact.k = dim.k
        |GROUP BY 1, 2 ORDER BY k""".stripMargin,

    // Closed-form replay of the lifecycle's RESULT face (the lifecycle
    // itself — manifests, DQ gates, upserts, sinks — DuckDB cannot run):
    // SyntheticRaw writes exactly 50 popular movies per day whose id
    // window starts at 1 + d*10 (a multiple of 10), and emits an OMDb doc
    // for ids with i%2==0 AND i%5!=0 — exactly 4 per 10 consecutive ids.
    // Over 50 ids aligned to a 10-boundary that is 20 matches/day, and
    // the enrichment join is by imdb_id which exists precisely for those
    // ids. Derived from the generator's SPEC (SyntheticRaw.scala:24-53),
    // not from Spark output.
    "q82_backfill_days" ->
      """SELECT concat('2026-03-', lpad(CAST(d AS VARCHAR), 2, '0'))
        |    AS snapshot_date,
        |  CAST(50 AS BIGINT) AS nb_movies,
        |  CAST(20 AS BIGINT) AS nb_movies_with_omdb
        |FROM generate_series(1, 5) t(d)
        |ORDER BY snapshot_date""".stripMargin,

    // exact decimal product-sum; year() on the naive timestamp matches
    // the UTC session
    "q105_star_revenue" ->
      """SELECT r_name, n_name, CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |       AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS nb_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2, 3 ORDER BY r_name, n_name, yr""".stripMargin,

    // 3 generated iteration CTEs replaying pageRank's exact integer
    // arithmetic: same init (scale // n), same base, same floor chain
    "q125_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT src, dst FROM pairs
        |          UNION SELECT dst, src FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |pr0 AS (SELECT node, (SELECT 1000000000000000 // n FROM nn) AS pr FROM nodes),
        |pr1 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * COALESCE(sm.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr0 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node),
        |pr2 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * COALESCE(sm.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr1 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node),
        |pr3 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * COALESCE(sm.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr2 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node)
        |SELECT node, pr FROM pr3 ORDER BY node""".stripMargin,

    // Dangling-mass PageRank: the same unrolled chain as q125 plus a
    // per-iteration dangling-mass scalar (sum over nodes with no
    // out-edges, floor-divided by N) added to every node's incoming sum
    // before damping — mirroring Graph.pageRankWithRounds exactly.
    "q132_pagerank_dangling" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_suppkey AS src, l_partkey + 100000 AS dst
        |  FROM lineitem),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |pr0 AS (SELECT node, (SELECT 1000000000000000 // n FROM nn) AS pr
        |        FROM nodes),
        |d1 AS (SELECT COALESCE(SUM(pr), 0) // (SELECT n FROM nn) AS sh
        |       FROM pr0 WHERE node NOT IN (SELECT src FROM outdeg)),
        |pr1 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * (COALESCE(sm.s, 0) + (SELECT sh FROM d1))) // 100
        |              AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr0 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node),
        |d2 AS (SELECT COALESCE(SUM(pr), 0) // (SELECT n FROM nn) AS sh
        |       FROM pr1 WHERE node NOT IN (SELECT src FROM outdeg)),
        |pr2 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * (COALESCE(sm.s, 0) + (SELECT sh FROM d2))) // 100
        |              AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr1 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node),
        |d3 AS (SELECT COALESCE(SUM(pr), 0) // (SELECT n FROM nn) AS sh
        |       FROM pr2 WHERE node NOT IN (SELECT src FROM outdeg)),
        |pr3 AS (
        |  SELECT nd.node,
        |         CAST((SELECT (1000000000000000 // n) * 15 // 100 FROM nn)
        |              + (85 * (COALESCE(sm.s, 0) + (SELECT sh FROM d3))) // 100
        |              AS BIGINT) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node, SUM(p.pr // o.deg) AS s
        |    FROM pr2 p
        |    JOIN outdeg o ON o.src = p.node
        |    JOIN edges e ON e.src = p.node
        |    GROUP BY e.dst) sm ON sm.node = nd.node)
        |SELECT node, pr FROM pr3 ORDER BY node""".stripMargin,

    "q126_triangles" ->
      """WITH pairs AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nodes AS (SELECT src AS nd FROM pairs
        |          UNION SELECT dst FROM pairs),
        |tri AS (
        |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.src = e1.dst
        |  JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |corners AS (SELECT a AS node FROM tri
        |            UNION ALL SELECT b FROM tri
        |            UNION ALL SELECT c FROM tri),
        |cnt AS (SELECT node, count(*) AS c FROM corners GROUP BY node)
        |SELECT n.nd AS node, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
        |FROM nodes n LEFT JOIN cnt ON cnt.node = n.nd
        |ORDER BY node""".stripMargin,

    "q127_scd2_user_type" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS snap_date,
        |         max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, snap_date, etype,
        |         CASE WHEN row_number() OVER
        |                (PARTITION BY user_id ORDER BY snap_date) = 1
        |              OR lag(etype) OVER
        |                (PARTITION BY user_id ORDER BY snap_date)
        |              IS DISTINCT FROM etype THEN 1 ELSE 0 END AS chg
        |  FROM snap),
        |v AS (
        |  SELECT user_id, snap_date, etype,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY snap_date
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w)
        |SELECT user_id, CAST(ver AS BIGINT) AS version,
        |       min(snap_date) AS valid_from, max(snap_date) AS valid_to,
        |       CAST(count(*) AS BIGINT) AS nb_snapshots,
        |       min(etype) AS etype
        |FROM v GROUP BY user_id, ver
        |ORDER BY user_id, version""".stripMargin,

    "q133_scd2_deletions" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT DISTINCT d FROM snap),
        |born AS (SELECT user_id, min(d) AS b FROM snap GROUP BY 1),
        |grid AS (SELECT born.user_id, cal.d FROM born
        |         JOIN cal ON cal.d >= born.b),
        |j AS (
        |  SELECT g.user_id, g.d, s.etype, s.user_id IS NOT NULL AS pres
        |  FROM grid g LEFT JOIN snap s
        |    ON s.user_id = g.user_id AND s.d = g.d),
        |w AS (
        |  SELECT user_id, d, etype, pres,
        |         CASE WHEN row_number() OVER pk = 1
        |              OR etype IS DISTINCT FROM lag(etype) OVER pk
        |              OR pres IS DISTINCT FROM lag(pres) OVER pk
        |         THEN 1 ELSE 0 END AS chg
        |  FROM j WINDOW pk AS (PARTITION BY user_id ORDER BY d)),
        |v AS (
        |  SELECT user_id, d, etype, pres,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |runs AS (
        |  SELECT user_id, ver, min(d) AS valid_from, max(d) AS valid_to,
        |         CAST(count(*) AS BIGINT) AS nb_snapshots, min(etype) AS etype
        |  FROM v WHERE pres GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY valid_from) AS BIGINT) AS version,
        |       valid_from, valid_to, nb_snapshots, etype
        |FROM runs ORDER BY user_id, version""".stripMargin,

    // q133's interval replay + the median-date covering filter (the
    // pruned and unpruned reads are row-identical by contract; DuckDB
    // replays the unpruned math)
    "q152_pit_pruned" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT DISTINCT d FROM snap),
        |pit AS (
        |  SELECT d FROM (
        |    SELECT d, row_number() OVER (ORDER BY d) AS rn,
        |           count(*) OVER () AS n
        |    FROM cal) WHERE rn = (n + 1) // 2),
        |born AS (SELECT user_id, min(d) AS b FROM snap GROUP BY 1),
        |grid AS (SELECT born.user_id, cal.d FROM born
        |         JOIN cal ON cal.d >= born.b),
        |j AS (
        |  SELECT g.user_id, g.d, s.etype, s.user_id IS NOT NULL AS pres
        |  FROM grid g LEFT JOIN snap s
        |    ON s.user_id = g.user_id AND s.d = g.d),
        |w AS (
        |  SELECT user_id, d, etype, pres,
        |         CASE WHEN row_number() OVER pk = 1
        |              OR etype IS DISTINCT FROM lag(etype) OVER pk
        |              OR pres IS DISTINCT FROM lag(pres) OVER pk
        |         THEN 1 ELSE 0 END AS chg
        |  FROM j WINDOW pk AS (PARTITION BY user_id ORDER BY d)),
        |v AS (
        |  SELECT user_id, d, etype, pres,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |runs AS (
        |  SELECT user_id, ver, min(d) AS valid_from, max(d) AS valid_to,
        |         CAST(count(*) AS BIGINT) AS nb_snapshots, min(etype) AS etype
        |  FROM v WHERE pres GROUP BY 1, 2),
        |dim AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY valid_from) AS BIGINT) AS version,
        |         valid_from, valid_to, nb_snapshots, etype
        |  FROM runs)
        |SELECT user_id, version, valid_from, valid_to, nb_snapshots, etype
        |FROM dim
        |WHERE valid_from <= (SELECT d FROM pit)
        |  AND valid_to >= (SELECT d FROM pit)
        |ORDER BY user_id, version""".stripMargin,

    // q133's interval replay + the RANGE overlap filter over the middle
    // third of the calendar (the window the engine answers through the
    // generation-pruned intervalsBetween read)
    "q153_pit_range" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT DISTINCT d FROM snap),
        |idx AS (
        |  SELECT d, row_number() OVER (ORDER BY d) AS rn,
        |         count(*) OVER () AS n
        |  FROM cal),
        |lo AS (SELECT d FROM idx WHERE rn = n // 3 + 1),
        |hi AS (SELECT d FROM idx WHERE rn = (2 * n) // 3 + 1),
        |born AS (SELECT user_id, min(d) AS b FROM snap GROUP BY 1),
        |grid AS (SELECT born.user_id, cal.d FROM born
        |         JOIN cal ON cal.d >= born.b),
        |j AS (
        |  SELECT g.user_id, g.d, s.etype, s.user_id IS NOT NULL AS pres
        |  FROM grid g LEFT JOIN snap s
        |    ON s.user_id = g.user_id AND s.d = g.d),
        |w AS (
        |  SELECT user_id, d, etype, pres,
        |         CASE WHEN row_number() OVER pk = 1
        |              OR etype IS DISTINCT FROM lag(etype) OVER pk
        |              OR pres IS DISTINCT FROM lag(pres) OVER pk
        |         THEN 1 ELSE 0 END AS chg
        |  FROM j WINDOW pk AS (PARTITION BY user_id ORDER BY d)),
        |v AS (
        |  SELECT user_id, d, etype, pres,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |runs AS (
        |  SELECT user_id, ver, min(d) AS valid_from, max(d) AS valid_to,
        |         CAST(count(*) AS BIGINT) AS nb_snapshots, min(etype) AS etype
        |  FROM v WHERE pres GROUP BY 1, 2),
        |dim AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY valid_from) AS BIGINT) AS version,
        |         valid_from, valid_to, nb_snapshots, etype
        |  FROM runs)
        |SELECT user_id, version, valid_from, valid_to, nb_snapshots, etype
        |FROM dim
        |WHERE valid_from <= (SELECT d FROM hi)
        |  AND valid_to >= (SELECT d FROM lo)
        |ORDER BY user_id, version""".stripMargin,


    // q133's dimension replay + the interval-covering join; gap-dated
    // planted facts appear on neither side
    "q142_pit_deletions" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT DISTINCT d FROM snap),
        |born AS (SELECT user_id, min(d) AS b FROM snap GROUP BY 1),
        |grid AS (SELECT born.user_id, cal.d FROM born
        |         JOIN cal ON cal.d >= born.b),
        |j AS (
        |  SELECT g.user_id, g.d, s.etype, s.user_id IS NOT NULL AS pres
        |  FROM grid g LEFT JOIN snap s
        |    ON s.user_id = g.user_id AND s.d = g.d),
        |w AS (
        |  SELECT user_id, d, etype, pres,
        |         CASE WHEN row_number() OVER pk = 1
        |              OR etype IS DISTINCT FROM lag(etype) OVER pk
        |              OR pres IS DISTINCT FROM lag(pres) OVER pk
        |         THEN 1 ELSE 0 END AS chg
        |  FROM j WINDOW pk AS (PARTITION BY user_id ORDER BY d)),
        |v AS (
        |  SELECT user_id, d, etype, pres,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |runs AS (
        |  SELECT user_id, ver, min(d) AS valid_from, max(d) AS valid_to,
        |         min(etype) AS etype
        |  FROM v WHERE pres GROUP BY 1, 2),
        |dim AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |                                 ORDER BY valid_from) AS BIGINT) AS version,
        |         valid_from, valid_to, etype
        |  FROM runs),
        |facts AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS fd FROM events
        |  UNION ALL
        |  SELECT event_id + 10000000, user_id, CAST(ts AS DATE) + 1
        |  FROM events)
        |SELECT f.event_id, f.user_id, f.fd, d.version, d.etype
        |FROM facts f JOIN dim d
        |  ON d.user_id = f.user_id AND f.fd BETWEEN d.valid_from AND d.valid_to
        |ORDER BY f.event_id""".stripMargin,

    // the fold state's intervals must equal the one-shot batch collapse
    // — the oracle IS q133's calendar-grid replay over all snapshots
    "q139_scd2_fold" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT DISTINCT d FROM snap),
        |born AS (SELECT user_id, min(d) AS b FROM snap GROUP BY 1),
        |grid AS (SELECT born.user_id, cal.d FROM born
        |         JOIN cal ON cal.d >= born.b),
        |j AS (
        |  SELECT g.user_id, g.d, s.etype, s.user_id IS NOT NULL AS pres
        |  FROM grid g LEFT JOIN snap s
        |    ON s.user_id = g.user_id AND s.d = g.d),
        |w AS (
        |  SELECT user_id, d, etype, pres,
        |         CASE WHEN row_number() OVER pk = 1
        |              OR etype IS DISTINCT FROM lag(etype) OVER pk
        |              OR pres IS DISTINCT FROM lag(pres) OVER pk
        |         THEN 1 ELSE 0 END AS chg
        |  FROM j WINDOW pk AS (PARTITION BY user_id ORDER BY d)),
        |v AS (
        |  SELECT user_id, d, etype, pres,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |runs AS (
        |  SELECT user_id, ver, min(d) AS valid_from, max(d) AS valid_to,
        |         CAST(count(*) AS BIGINT) AS nb_snapshots, min(etype) AS etype
        |  FROM v WHERE pres GROUP BY 1, 2)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY valid_from) AS BIGINT) AS version,
        |       valid_from, valid_to, nb_snapshots, etype
        |FROM runs ORDER BY user_id, version""".stripMargin,

    "q128_pit_enrich" ->
      """WITH snap AS (
        |  SELECT user_id, CAST(ts AS DATE) AS snap_date,
        |         max(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, snap_date, etype,
        |         CASE WHEN row_number() OVER
        |                (PARTITION BY user_id ORDER BY snap_date) = 1
        |              OR lag(etype) OVER
        |                (PARTITION BY user_id ORDER BY snap_date)
        |              IS DISTINCT FROM etype THEN 1 ELSE 0 END AS chg
        |  FROM snap),
        |v AS (
        |  SELECT user_id, snap_date, etype,
        |         SUM(chg) OVER (PARTITION BY user_id ORDER BY snap_date
        |                        ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM w),
        |dim AS (
        |  SELECT user_id, CAST(ver AS BIGINT) AS version,
        |         min(snap_date) AS valid_from, max(snap_date) AS valid_to,
        |         min(etype) AS etype
        |  FROM v GROUP BY user_id, ver)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS DATE) AS fd,
        |       d.version, d.etype
        |FROM events e JOIN dim d
        |  ON d.user_id = e.user_id
        | AND CAST(e.ts AS DATE) BETWEEN d.valid_from AND d.valid_to
        |ORDER BY e.event_id""".stripMargin
  )
}

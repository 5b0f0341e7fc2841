package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + COVERAGE.md.
  *
  * Each entry in [[queries]] is a generic operator from SURVEY.md §2 (or a
  * beyond-parity LLM-pipeline operator) expressed over the driver's synthetic
  * testdata (`TESTDATA.md`), with DuckDB-runnable oracle SQL in [[oracleSql]].
  * Column names are aligned between the Spark result and the oracle, every
  * query sorts deterministically, and float aggregates go through exact
  * decimal sums so Spark and DuckDB hash-match bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's mart lineage (SURVEY §3.2): enrich a fact with a
    * dimension via left join, derive flags, then roll up a daily KPI row —
    * orders ⟕ customer standing in for popular ⟕ details ⟕ omdb.
    * No broadcast hint on customer: it grows with scale factor, so the join
    * strategy is left to AQE (broadcast when small, sort-merge when not). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Testdata.table(spark, dir, "orders")
    val customer = graft.sources.Testdata.table(spark, dir, "customer")
    val enriched = orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .withColumn("missing_customer", col("c_custkey").isNull)
      .withColumn("is_big", col("o_totalprice") >= 100000.0)
    enriched
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(
        count(lit(1)).as("nb_orders"),
        sum(when(!col("missing_customer"), 1).otherwise(0)).as("nb_matched"),
        round(avg(col("o_totalprice")), 2).as("avg_price"),
        sum(when(col("is_big"), 1).otherwise(0)).as("nb_big")
      )
  }

  /** SQL-surface face: register every testdata table (the relational star
    * schema plus `documents`/`embeddings`) as a temp view, so a SQL-only
    * user can drive the engine entirely through `spark.sql` — with the
    * `graft_*` functions installed by [[graft.plans.GraftExtensions]],
    * that is a complete SQL story (q63 is authored that way). The five
    * PIPELINE model tables get the same treatment post-run via
    * [[Pipeline.registerModelViews]]. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      graft.sources.Testdata.table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** One entry per implemented operator from SURVEY.md §2 (see COVERAGE.md
    * for the operator-id → query-name map). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // A1-A5 analog over lineitem (SURVEY §2.4): grouped agg with exact
    // decimal sums cast back to double for oracle-stable hashing.
    "q01_agg_pricing" -> ((s, dir) => {
      graft.sources.Testdata.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  ) ++ graft.queries.RelationalQueries.queries ++ graft.queries.LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.queries.RelationalQueries.oracles ++ graft.queries.LlmQueries.oracles
}

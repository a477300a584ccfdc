package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Combinators._
import graft.functions.Stable
import graft.ops.Relational
import graft.tables.Tables

/** SURVEY.md §2.1/§2.2/§2.4/§2.6 core: scans, filters, expressions,
  * two-phase aggregation, combinators, sorts/limits/top-k/limit-by. */
object CoreRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.1 scans + §2.2 projections/filters ---------------------------
    "q01_scan_filter_project" -> ((s, dir) => {
      // ScanPlan w/ projection+filter pushdown (plan_scan.rs:14-22): Catalyst
      // pushes both into the parquet reader (PushedFilters/ReadSchema).
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),
    "q02_expr_arith" -> ((s, dir) => {
      // ExpressionTransform + arithmetic/comparison/logic scalar functions
      // (transform_expression.rs, scalars/arithmetics/, comparisons/, logics/).
      // charge in integer cents via floor(x*100 + 0.5): per-row arithmetic is
      // bit-identical across engines, and floor of the same double is too —
      // `round()` is NOT (Spark decimal-HALF_UP vs DuckDB nearbyint diverge
      // on boundary doubles; surfaced at sf0.1)
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "A")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))
            * 100 + 0.5).cast("long").as("charge_c100"),
          (col("l_quantity") % 7).as("qmod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("charge_c100"))
    }),

    // ---- §2.4 aggregations ----------------------------------------------
    "q03_agg_global" -> ((s, dir) => {
      // No-key aggregation (AggregatorPartial/FinalTransform): partial states
      // per partition, merged at final — Spark's two-phase HashAggregate.
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        count(col("l_quantity")).as("n_qty"),
        sum(col("l_quantity")).as("s_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        round(Stable.sumD(col("l_extendedprice")), 2).as("s_price"),
        round(Stable.avgD(col("l_extendedprice")), 2).as("a_price"))
    }),
    "q04_tpch_q1" -> ((s, dir) => {
      // GROUP BY + multiple aggs (transform_group_by_partial/final.rs).
      // Fractional-double sums accumulate in decimal (Stable.sumD): exact
      // and merge-order independent; quantity is integral → exact already.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(Stable.sumD(col("l_extendedprice")), 2).as("sum_base_price"),
          round(Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(Stable.avgD(col("l_extendedprice")), 4).as("avg_price"),
          round(Stable.avgD(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q71_tpch_q6" -> ((s, dir) => {
      // TPC-H Q6 (forecasting revenue): pure scan → tight multi-predicate
      // filter (all pushed to parquet) → single global agg. The classic
      // "does the filter reach the scan" probe.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(Stable.sumD(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),
    "q05_having" -> ((s, dir) => {
      // HAVING = FilterTransform with having=true (transform_filter.rs:24-117).
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s_qty"))
        .filter(col("n") > 100)
        .orderBy(col("l_suppkey"))
    }),

    // ---- §2.6 sorts / limits / top-k ------------------------------------
    "q06_topk" -> ((s, dir) => {
      // ORDER BY ... LIMIT k — limit-aware sort/merge in the reference
      // (pipeline_builder.rs:220-261); Spark plans TakeOrderedAndProject.
      Relational.topK(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        10,
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
    }),
    "q07_limit_offset" -> ((s, dir) => {
      // LIMIT n OFFSET m (transform_limit.rs:17-65).
      Relational.limitOffset(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        limit = 20, offset = 40,
        Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")))
    }),
    "q08_limit_by" -> ((s, dir) => {
      // ClickHouse `LIMIT 2 BY l_returnflag` (transform_limit_by.rs:17-64).
      Relational.limitBy(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        2,
        keys = Seq(col("l_returnflag")),
        order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- §2.4 combinators ------------------------------------------------
    "q09_uniq" -> ((s, dir) => {
      // `uniq` = distinct combinator + count (aggregate_combinator_distinct.rs).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          uniq(col("l_partkey")).as("uniq_parts"),
          uniq(col("l_suppkey")).as("uniq_supps"),
          uniqIf(col("l_partkey"), col("l_quantity") > 25).as("uniq_parts_hiqty"))
        .orderBy(col("l_returnflag"))
    }),
    "q10_agg_if" -> ((s, dir) => {
      // `If` combinator family (aggregate_combinator_if.rs).
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sumIf(col("l_quantity"), col("l_discount") > 0.05).as("sum_qty_hidisc"),
          countIf(col("l_tax") > 0.04).as("n_hitax"),
          round(avgIf(col("l_quantity"), col("l_linestatus") === "F"), 6).as("avg_qty_f"),
          minIf(col("l_extendedprice"), col("l_quantity") === 1).as("min_price_q1"),
          maxIf(col("l_extendedprice"), col("l_quantity") === 50).as("max_price_q50"))
        .orderBy(col("l_returnflag"))
    }),
    "q11_argminmax" -> ((s, dir) => {
      // argMin/argMax (aggregate_arg_min.rs / aggregate_arg_max.rs) —
      // tie-broken with a unique ordinal so the answer is engine-independent.
      val ord = col("l_extendedprice") * lit(1e9) + col("l_orderkey") * 10 + col("l_linenumber")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          argMax(col("l_orderkey"), ord).as("order_of_max_price"),
          argMin(col("l_orderkey"), ord).as("order_of_min_price"),
          max(col("l_extendedprice")).as("max_price"),
          min(col("l_extendedprice")).as("min_price"))
        .orderBy(col("l_returnflag"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q02_expr_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT) AS charge_c100,
        |  l_quantity % 7 AS qmod
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber, charge_c100""".stripMargin,
    "q03_agg_global" ->
      """SELECT count(*) AS n_rows, count(l_quantity) AS n_qty,
        |  sum(l_quantity) AS s_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS s_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / count(l_extendedprice), 2) AS a_price
        |FROM lineitem""".stripMargin,
    "q71_tpch_q6" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q04_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / count(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q05_having" ->
      """SELECT l_suppkey, count(*) AS n, sum(l_quantity) AS s_qty
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 100
        |ORDER BY l_suppkey""".stripMargin,
    "q06_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q07_limit_offset" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 20 OFFSET 40""".stripMargin,
    "q08_limit_by" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 2 ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q09_uniq" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS uniq_parts,
        |  count(DISTINCT l_suppkey) AS uniq_supps,
        |  count(DISTINCT CASE WHEN l_quantity > 25 THEN l_partkey END) AS uniq_parts_hiqty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10_agg_if" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_discount > 0.05 THEN l_quantity END) AS sum_qty_hidisc,
        |  count(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_hitax,
        |  round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS avg_qty_f,
        |  min(CASE WHEN l_quantity = 1 THEN l_extendedprice END) AS min_price_q1,
        |  max(CASE WHEN l_quantity = 50 THEN l_extendedprice END) AS max_price_q50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_argminmax" ->
      """SELECT l_returnflag,
        |  max_by(l_orderkey, l_extendedprice * 1e9 + l_orderkey * 10 + l_linenumber) AS order_of_max_price,
        |  min_by(l_orderkey, l_extendedprice * 1e9 + l_orderkey * 10 + l_linenumber) AS order_of_min_price,
        |  max(l_extendedprice) AS max_price,
        |  min(l_extendedprice) AS min_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}

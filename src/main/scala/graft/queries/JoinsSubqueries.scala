package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Joins (extension — SURVEY.md §2.3: absent in the reference, planner rejects
  * JOIN at sql/plan_parser.rs:617), EXISTS/scalar subqueries
  * (udfs/udf.rs:22-28 `exists`, plan_expression.rs ScalarSubquery), casts
  * (expressions/cast.rs), strings (strings/substring.rs), CASE/BETWEEN
  * desugaring (plan_parser.rs:941-958), set operations (§2.7 extension).
  *
  * Scale notes: dimension sides are `broadcast()` (no shuffle of the fact
  * table); semi/anti joins use Spark's left_semi/left_anti which build only
  * the key set; AQE re-plans skew at runtime.
  */
object JoinsSubqueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- round-4 TPC-H additions: ANSI SQL identical in Spark and DuckDB,
  // defined once so the query path and the oracle can never drift ----

  /** TPC-H Q4 (order-priority checking): EXISTS over the fact table
    * aggregated by priority — decorrelates to a semi join before the agg.
    * Adapted: "late line" = l_returnflag 'R' (schema has no receipt dates). */
  private val TpchQ4 =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q12 (shipping modes): conditional counts over a fact⋈fact join.
    * Adapted: l_linestatus stands in for l_shipmode (absent here). */
  private val TpchQ12 =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q11 (important stock): GROUP BY + HAVING against a scalar
    * subquery share of the global total — both sides accumulate in decimal
    * so the threshold comparison is exact in both engines. Adapted: part
    * value via lineitem revenue (no partsupp table in this schema). */
  private val TpchQ11 =
    """SELECT l_partkey,
      |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS value
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) >
      |  (SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) * 0.0007
      |   FROM lineitem)
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship): count(DISTINCT) per part
    * attributes + NOT IN exclusion subquery. Adapted: lineitem is the
    * part↔supplier bridge (no partsupp); "complaint" suppliers =
    * negative account balance. */
  private val TpchQ16 =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5'
      |  AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier): correlated equality-to-min subquery
    * — every (part, supplier) row must match the per-part minimum, which
    * Catalyst rewrites to an aggregate + join, not a per-row rescan.
    * Adapted: min lineitem price via the lineitem bridge (no partsupp);
    * DISTINCT collapses multiple min-price shipments of the same pair. */
  private val TpchQ2 =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
      |  l_extendedprice AS min_price
      |FROM part, lineitem, supplier, nation
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND p_size = 15
      |  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
      |                         WHERE l2.l_partkey = part.p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_type, min_price
      |LIMIT 100""".stripMargin

  /** TPC-H Q9 (product-type profit): 5-table join, profit per nation/year.
    * Adapted: supply cost = 1% of p_retailprice × quantity (no partsupp);
    * color predicate on the synthetic p_name domain. Per-row arithmetic is
    * IEEE-deterministic; the accumulation is decimal. */
  private val TpchQ9 =
    """SELECT nation, o_year,
      |  round(CAST(sum(CAST(amount AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01 AS amount
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |    AND p_name LIKE '%red%') profit
      |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q20 (potential part promotion): nested IN subqueries with an
    * aggregate HAVING gate in the middle — IN(IN(...)) must plan as two
    * semi joins around the rollup. Adapted: fixed quantity threshold
    * (partsupp availqty is absent). */
  private val TpchQ20 =
    """SELECT s_name, s_acctbal FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 2500)
      |ORDER BY s_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_exists_subquery" -> ((s, dir) => {
      // Correlated EXISTS — reference supports uncorrelated exists() only
      // (transform_create_sets.rs); Spark decorrelates to a semi join.
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer
              |WHERE EXISTS (SELECT 1 FROM orders
              |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
              |ORDER BY c_custkey, c_name""".stripMargin)
    }),
    "q13_scalar_subquery" -> ((s, dir) => {
      // Uncorrelated scalar subquery (Expression::ScalarSubquery,
      // plan_expression.rs:95-105) — broadcast single-value join in Spark.
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_acctbal FROM customer
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
              |ORDER BY c_custkey, c_acctbal""".stripMargin)
    }),
    "q14_in_subquery" -> ((s, dir) => {
      // Uncorrelated IN subquery + BETWEEN desugar (plan_parser.rs:941-958).
      Tables.registerAll(s, dir)
      s.sql("""SELECT count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS s
              |FROM orders
              |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              |  AND o_totalprice BETWEEN 100000 AND 200000""".stripMargin)
    }),
    "q15_cast" -> ((s, dir) => {
      // CAST family (expressions/cast.rs:20-59; named toInt* casts).
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 50)
        .select(
          col("l_orderkey"),
          col("l_quantity").cast("long").as("q_int"),
          col("l_linenumber").cast("long").as("ln_big"),
          col("l_orderkey").cast("string").as("ok_str"),
          col("l_shipdate").cast("date").as("ship_day"))
        .orderBy(col("l_orderkey"), col("q_int"), col("ln_big"), col("ship_day"))
    }),
    "q16_strings" -> ((s, dir) => {
      // String functions (strings/substring.rs; SUBSTRING FROM/FOR desugar
      // plan_parser.rs:919-940) + Spark's wider built-in family.
      t(s, dir, "part")
        .filter(col("p_partkey") < 200)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_type"), 1, 5).as("sub"),
          length(col("p_name")).cast("long").as("len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("cc"),
          regexp_replace(col("p_name"), " ", "_").as("rep"))
        .orderBy(col("p_partkey"), col("up"), col("cc"))
    }),
    "q17_case_coalesce" -> ((s, dir) => {
      // CASE WHEN / coalesce / nullif scalar conditionals.
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"))
        .orderBy(col("o_orderkey"), col("bucket"), col("st"))
    }),
    "q18_setops" -> ((s, dir) => {
      // UNION / INTERSECT / EXCEPT (§2.7 — rejected by the reference's
      // planner at plan_parser.rs:410-418; native in Spark).
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      def cnt(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      cnt(c.union(su).distinct(), "union")
        .union(cnt(c.intersect(su), "intersect"))
        .union(cnt(c.except(su), "except"))
        .orderBy(col("op"))
    }),
    "q19_join_broadcast" -> ((s, dir) => {
      // Inner equi-join, dimension broadcast: the fact table never shuffles.
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(graft.functions.Stable.sumD(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),
    "q20_tpch_q3" -> ((s, dir) => {
      // Multi-join + agg + top-k (TPC-H Q3 shape). customer is filtered then
      // broadcast; lineitem (the 100TB side) streams through one shuffle-free
      // probe, then a single hash aggregation.
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ords = t(s, dir, "orders").filter(col("o_orderdate") < to_timestamp(lit("1997-06-30 00:00:00")))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > to_timestamp(lit("1997-06-30 00:00:00")))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(graft.functions.Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q21_join_semi_anti" -> ((s, dir) => {
      // left_semi / left_anti joins (EXISTS / NOT EXISTS shapes as native
      // join types — only the key set of the right side is built).
      val cust = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
      def agg1(df: DataFrame, op: String) =
        df.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("c_mktsegment"), col("n"))
      agg1(cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi"), "semi")
        .union(agg1(cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti"), "anti"))
        .orderBy(col("op"), col("c_mktsegment"))
    }),
    "q22_join_left_outer" -> ((s, dir) => {
      // Left outer join preserving unmatched dimension rows.
      val nation = t(s, dir, "nation")
      val richCust = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      nation.join(richCust, col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy(col("n_nationkey"))
    }),
    "q78_tpch_q13" -> ((s, dir) => {
      // TPC-H Q13 (customer distribution, adapted — no o_comment filter in
      // this schema): LEFT join so zero-order customers count as c_count=0,
      // then a second aggregation over the first's result — the
      // aggregate-of-aggregate shape.
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "q76_tpch_q7" -> ((s, dir) => {
      // TPC-H Q7 (volume shipping): dual-role dimension — nation joins TWICE
      // under different keys (supplier's and customer's), with a symmetric
      // two-nation disjunction and a per-year rollup. Both nation sides
      // broadcast; the fact chain shuffles once on the order key.
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT supp_nation, cust_nation, l_year,
          |  round(CAST(sum(CAST(volume AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
          |FROM (
          |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
          |    l_extendedprice * (1 - l_discount) AS volume
          |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
          |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          |    AND c_custkey = o_custkey
          |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') shipping
          |GROUP BY supp_nation, cust_nation, l_year
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    }),
    "q77_tpch_q8" -> ((s, dir) => {
      // TPC-H Q8 (market share): 7-table join + conditional share of a
      // decimal-stable sum per year (values adapted to the synthetic
      // dimension domains: region AMERICA, nation NATION_1, p_type MEDIUM).
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_year,
          |  round(CAST(sum(CAST(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END
          |      AS DECIMAL(30,10))) AS DOUBLE)
          |    / CAST(sum(CAST(volume AS DECIMAL(30,10))) AS DOUBLE), 6) AS mkt_share
          |FROM (
          |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |    l_extendedprice * (1 - l_discount) AS volume,
          |    n2.n_name AS nation
          |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
          |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |    AND p_type = 'MEDIUM') all_nations
          |GROUP BY o_year ORDER BY o_year""".stripMargin)
    }),
    "q74_tpch_q17" -> ((s, dir) => {
      // TPC-H Q17 (small-quantity-order revenue): CORRELATED scalar subquery
      // — Catalyst must decorrelate the per-part average into an aggregate +
      // join, not a per-row re-scan. Entered through SQL so the subquery
      // actually exercises the decorrelation rules.
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / 7.0, 2)
          |    AS avg_yearly
          |FROM lineitem, part
          |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
          |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin)
    }),
    "q75_tpch_q15" -> ((s, dir) => {
      // TPC-H Q15 (top supplier): revenue rollup reused twice — once joined
      // to supplier, once under max() — plus an uncorrelated scalar subquery.
      Tables.registerAll(s, dir)
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2)
          |      AS total_revenue
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, total_revenue
          |FROM supplier JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    }),
    "q72_tpch_q18" -> ((s, dir) => {
      // TPC-H Q18 (large-volume customer): aggregate-then-join — the
      // order-quantity rollup happens BEFORE the joins, so the join inputs
      // are order-sized, not line-sized; top-100 by price via TakeOrdered.
      val bigOrders = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),
    "q73_tpch_q19" -> ((s, dir) => {
      // TPC-H Q19 shape (adapted to this schema — no p_container): an
      // OR-of-ANDs join predicate mixing both sides' columns. Catalyst must
      // extract the common p_partkey equi-key (hash join, not nested-loop)
      // and push the part-only disjunction below the join.
      val cond = col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), cond)
        .agg(round(graft.functions.Stable.sumD(
          col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),
    "q69_join_full_outer" -> ((s, dir) => {
      // Full outer join exercising BOTH null directions: nations < 20 on the
      // left, rich-customer counts per nation on the right — left-only rows
      // (nations with no rich customers) and right-only rows (rich customers
      // of nations >= 20) both survive.
      val nations = t(s, dir, "nation").filter(col("n_nationkey") < 20)
        .select(col("n_nationkey"), col("n_name"))
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_rich"))
      nations.join(rich, col("n_nationkey") === col("c_nationkey"), "full")
        .select(coalesce(col("n_nationkey"), col("c_nationkey")).as("nk"),
          col("n_name"), col("n_rich"))
        .orderBy(col("nk"))
    }),
    "q36_tpch_q5" -> ((s, dir) => {
      // TPC-H Q5 shape: 6-table snowflake join -> per-nation revenue. The
      // three dimension chains (region→nation→{customer,supplier}) broadcast;
      // the fact side (lineitem⋈orders) takes the only real shuffle. The
      // c_nationkey = s_nationkey predicate makes it a genuine snowflake, not
      // a star.
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val dim = broadcast(nation.join(region, col("n_regionkey") === col("r_regionkey")))
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val ords = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      t(s, dir, "lineitem")
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(dim, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(graft.functions.Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "q36b_tpch_q14" -> ((s, dir) => {
      // TPC-H Q14 shape: promo revenue share — lineitem⋈part on partkey
      // (the second fact-dim key), conditional aggregation over the join.
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-07-01 00:00:00")))
      val part = t(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          round(graft.functions.Stable.sumD(when(col("p_type").startsWith("PROMO"),
            col("l_extendedprice") * (lit(1) - col("l_discount")))), 2).as("promo_rev"),
          round(graft.functions.Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_rev"),
          count(lit(1)).as("n"))
    }),
    "q37_tpch_q10" -> ((s, dir) => {
      // TPC-H Q10 shape: returned-item revenue per customer, top 20.
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val ords = t(s, dir, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(graft.functions.Stable.sumD(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),
    "q86_tpch_q4" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ4) }),
    "q87_tpch_q12" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ12) }),
    "q88_tpch_q11" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ11) }),
    "q89_tpch_q16" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ16) }),
    "q90_tpch_q2" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ2) }),
    "q91_tpch_q9" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ9) }),
    "q92_tpch_q20" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(TpchQ20) }),
    "q83_tpch_q21" -> ((s, dir) => {
      // TPC-H Q21 (suppliers who kept orders waiting), the EXISTS +
      // NOT EXISTS decorrelation stressor: BOTH correlated subqueries rescan
      // the fact table with an inequality on a second column — Catalyst must
      // rewrite them to one left-semi and one left-anti join on l_orderkey
      // (PlanQualitySpec pins it), never a per-row subquery. Adapted to this
      // schema (no l_receiptdate/l_commitdate): "late" = l_returnflag 'R'.
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
          |FROM supplier, lineitem l1, orders, nation
          |WHERE s_suppkey = l1.l_suppkey
          |  AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F'
          |  AND l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |  AND s_nationkey = n_nationkey
          |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin)
    }),
    "q84_tpch_q22" -> ((s, dir) => {
      // TPC-H Q22 (global sales opportunity): NOT IN (null-aware anti join)
      // + uncorrelated scalar aggregate subqueries. The classic avg() compare
      // is restated as decimal sum/count cross-multiplication so the
      // threshold is EXACT in both engines (a double avg differs in the last
      // ulp between summation orders — memory: oracle-parity rules). Adapted
      // to this schema (no c_phone): cntrycode = c_nationkey % 10; "without
      // orders" = without large orders (every synthetic customer has some).
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
          |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE), 2) AS totacctbal
          |FROM (
          |  SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
          |  FROM customer
          |  WHERE c_nationkey % 10 IN (1, 3, 5, 7)
          |    AND CAST(c_acctbal AS DECIMAL(30,10)) *
          |        (SELECT count(*) FROM customer
          |         WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 3, 5, 7)) >
          |        (SELECT sum(CAST(c_acctbal AS DECIMAL(30,10))) FROM customer
          |         WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 3, 5, 7))
          |) c
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
          |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
    }),
    "q56_asof_join" -> ((s, dir) => {
      // As-of (backward, inclusive) join: each click event carries the
      // latest at-or-before purchase of the same user — graft.ops.AsofJoin's
      // union+window formulation, ONE shuffle on the key (AsofJoinSpec pins
      // the single-Exchange plan). Right side pre-deduped to one row per
      // (user, ts) so tie-break order is defined on both engines.
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pvalue"))
      graft.ops.AsofJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts")
        // driver-compare hygiene: the harness hash-compares values and
        // chokes on NULL-bearing datetime columns — sentinel the no-match
        // rows (left-join semantics themselves are pinned in AsofJoinSpec)
        .withColumn("r_pvalue", coalesce(col("r_pvalue"), lit(-1.0)))
        .withColumn("r_ts", coalesce(col("r_ts"),
          to_timestamp(lit("1970-01-01 00:00:00"))))
        .orderBy(col("event_id"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "q86_tpch_q4" -> TpchQ4,
    "q87_tpch_q12" -> TpchQ12,
    "q88_tpch_q11" -> TpchQ11,
    "q89_tpch_q16" -> TpchQ16,
    "q90_tpch_q2" -> TpchQ2,
    "q91_tpch_q9" -> TpchQ9,
    "q92_tpch_q20" -> TpchQ20,
    "q83_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey
        |  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q84_tpch_q22" ->
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE), 2) AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal, c_custkey
        |  FROM customer
        |  WHERE c_nationkey % 10 IN (1, 3, 5, 7)
        |    AND CAST(c_acctbal AS DECIMAL(30,10)) *
        |        (SELECT count(*) FROM customer
        |         WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 3, 5, 7)) >
        |        (SELECT sum(CAST(c_acctbal AS DECIMAL(30,10))) FROM customer
        |         WHERE c_acctbal > 0.00 AND c_nationkey % 10 IN (1, 3, 5, 7))
        |) c
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q56_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'click'),
        |     r AS (SELECT user_id, ts, max(value) AS pvalue FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |       coalesce(r.pvalue, -1.0) AS r_pvalue,
        |       coalesce(r.ts, TIMESTAMP '1970-01-01 00:00:00') AS r_ts
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "q12_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey, c_name""".stripMargin,
    "q13_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey, c_acctbal""".stripMargin,
    "q14_in_subquery" ->
      """SELECT count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS s
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice BETWEEN 100000 AND 200000""".stripMargin,
    "q15_cast" ->
      """SELECT l_orderkey,
        |  CAST(l_quantity AS BIGINT) AS q_int,
        |  CAST(l_linenumber AS BIGINT) AS ln_big,
        |  CAST(l_orderkey AS VARCHAR) AS ok_str,
        |  CAST(l_shipdate AS DATE) AS ship_day
        |FROM lineitem WHERE l_orderkey < 50
        |ORDER BY l_orderkey, q_int, ln_big, ship_day""".stripMargin,
    "q16_strings" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_type, 1, 5) AS sub,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  p_brand || '#' || p_type AS cc,
        |  replace(p_name, ' ', '_') AS rep
        |FROM part WHERE p_partkey < 200
        |ORDER BY p_partkey, up, cc""".stripMargin,
    "q17_case_coalesce" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey, bucket, st""".stripMargin,
    "q18_setops" ->
      """SELECT 'union' AS op, count(*) AS n FROM
        |  (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) u
        |UNION ALL
        |SELECT 'intersect', count(*) FROM
        |  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) i
        |UNION ALL
        |SELECT 'except', count(*) FROM
        |  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) e
        |ORDER BY op""".stripMargin,
    "q19_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q20_tpch_q3" ->
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q21_join_semi_anti" ->
      """SELECT 'semi' AS op, c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT 'anti', c_mktsegment, count(*) FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY c_mktsegment
        |ORDER BY op, c_mktsegment""".stripMargin,
    "q22_join_left_outer" ->
      """SELECT n_nationkey, n_name, count(c_custkey) AS n_cust
        |FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |  ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "q78_tpch_q13" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q76_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  round(CAST(sum(CAST(volume AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q77_tpch_q8" ->
      """SELECT o_year,
        |  round(CAST(sum(CAST(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END
        |      AS DECIMAL(30,10))) AS DOUBLE)
        |    / CAST(sum(CAST(volume AS DECIMAL(30,10))) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND p_type = 'MEDIUM') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q74_tpch_q17" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / 7.0, 2)
        |    AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q75_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q72_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) b
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q73_tpch_q19" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q69_join_full_outer" ->
      """WITH nations AS (
        |  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20),
        |rich AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_rich
        |  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey)
        |SELECT coalesce(n_nationkey, c_nationkey) AS nk, n_name, n_rich
        |FROM nations FULL JOIN rich ON n_nationkey = c_nationkey
        |ORDER BY nk""".stripMargin,
    "q36_tpch_q5" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q36b_tpch_q14" ->
      """SELECT
        |  round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)) END) AS DOUBLE), 2) AS promo_rev,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS total_rev,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin,
    "q37_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
  )
}

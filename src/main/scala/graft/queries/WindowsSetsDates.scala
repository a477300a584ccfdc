package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.EventsOps
import graft.tables.Tables

/** Window functions (§2.5 — absent in the reference), grouping extensions
  * (rollup/cube — reference is plain GROUP BY, plan_parser.rs:455-462),
  * DISTINCT, math/date scalar families, event-time bucketing/sessionization
  * (§2.9 extension), and the `numbers(N)` table function
  * (datasources/system/numbers_table.rs → spark.range). */
object WindowsSetsDates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      val wd = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(wd).cast("long").as("rk"),
          dense_rank().over(wd).cast("long").as("drk"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("run_sum"))
        .orderBy(col("o_custkey"), col("rn"))
    }),
    "q70_window_frames" -> ((s, dir) => {
      // Frame-spec completeness: ntile / percent_rank / cume_dist (order
      // fully tie-broken so both engines agree), first/last over an
      // unbounded ROWS frame, and a numeric RANGE frame sum (decimal-stable
      // accumulation — a RANGE frame is a set of rows, summation order is
      // engine-specific).
      val w1 = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wAll = w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRange = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_custkey")).rangeBetween(-10, 0)
      t(s, dir, "customer")
        .select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w1).cast("long").as("quartile"),
          round(percent_rank().over(w1), 6).as("pr"),
          round(cume_dist().over(w1), 6).as("cd"),
          first(col("c_custkey")).over(wAll).as("poorest"),
          last(col("c_custkey")).over(wAll).as("richest"),
          round(sum(col("c_acctbal").cast("decimal(30,10)")).over(wRange)
            .cast("double"), 2).as("nearby_bal"))
        .filter(col("c_custkey") < 200)
        .orderBy(col("c_custkey"))
    }),
    "q24_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q25_cube_grouping" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "q26_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q27_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 30)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("ab"),
          floor(col("l_extendedprice") / 1000).cast("long").as("fl"),
          ceil(col("l_extendedprice") / 1000).cast("long").as("ce"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          (col("l_orderkey") % 97).as("md"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          pow(col("l_linenumber"), 2).as("pw"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ab"), col("fl"),
          col("ce"), col("sq"), col("md"), col("ex"), col("lg"), col("pw"))
    }),
    "q28_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(
          count(lit(1)).as("n"),
          round(graft.functions.Stable.sumD(col("o_totalprice")), 2).as("rev"),
          min(col("o_orderdate").cast("date")).as("first_day"),
          max(date_trunc("month", col("o_orderdate"))).as("mstart"),
          max(col("o_orderdate") + expr("INTERVAL 30 DAY")).as("max_plus30"),
          datediff(max(col("o_orderdate")), lit("1995-01-01")).cast("long").as("dd"))
        .orderBy(col("yr"), col("mo"))
    }),
    "q29_events_time_bucket" -> ((s, dir) => {
      // Batch tumbling-window aggregation over the event stream (§2.9 ext).
      EventsOps.timeBucket(t(s, dir, "events"), "hour")
        .orderBy(col("h"), col("event_type"))
    }),
    "q164_pivot" -> ((s, dir) => {
      // PIVOT: per-day event counts spread into one column per event type
      // (explicit value list — an inferred list would scan once extra AND
      // make the schema data-dependent). One two-phase aggregation; the
      // oracle restates it as conditional counts.
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.table(s, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("day") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    }),
    "q30_events_json" -> ((s, dir) => {
      // Semi-structured props column: JSON path extraction + typed agg.
      t(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n"), round(avg(col("k")), 6).as("avg_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    "q31_sessionize" -> ((s, dir) => {
      // Gap-based sessionization (lag + flag-sum), 30-minute timeout.
      EventsOps.sessionCounts(
        t(s, dir, "events").filter(col("user_id") < 100), gapSeconds = 1800)
        .orderBy(col("user_id"))
    }),
    "q32_numbers_tablefunc" -> ((s, dir) => {
      // numbers(N) table function (numbers_table.rs:28-137) → spark.range:
      // generated per-partition, exact statistics, zero I/O.
      Tables.numbers(s, 1000000L)
        .agg(
          count(lit(1)).as("n"),
          sum(col("number")).as("s"),
          min(col("number")).as("mn"),
          max(col("number")).as("mx"),
          sum(when(col("number") % 7 === 0, col("number"))).as("s7"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "q23_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  CAST(rank() OVER wd AS BIGINT) AS rk,
        |  CAST(dense_rank() OVER wd AS BIGINT) AS drk,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey, o_totalprice),
        |  wd AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q70_window_frames" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(ntile(4) OVER w1 AS BIGINT) AS quartile,
        |    round(percent_rank() OVER w1, 6) AS pr,
        |    round(cume_dist() OVER w1, 6) AS cd,
        |    first_value(c_custkey) OVER wall AS poorest,
        |    last_value(c_custkey) OVER wall AS richest,
        |    round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) OVER wrange AS DOUBLE), 2) AS nearby_bal
        |  FROM customer
        |  WINDOW
        |    w1 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
        |    wall AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |    wrange AS (PARTITION BY c_mktsegment ORDER BY c_custkey
        |               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
        |) WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin,
    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS s
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q25_cube_grouping" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q26_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q27_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS ab,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ce,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  l_orderkey % 97 AS md,
        |  round(exp(l_discount), 6) AS ex,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  pow(l_linenumber, 2) AS pw
        |FROM lineitem WHERE l_orderkey < 30
        |ORDER BY l_orderkey, l_linenumber, ab, fl, ce, sq, md, ex, lg, pw""".stripMargin,
    "q28_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS rev,
        |  min(CAST(o_orderdate AS DATE)) AS first_day,
        |  max(date_trunc('month', o_orderdate)) AS mstart,
        |  max(o_orderdate + INTERVAL 30 DAY) AS max_plus30,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS dd
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
    "q29_events_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS s,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / count(*), 6) AS a
        |FROM events GROUP BY h, event_type ORDER BY h, event_type""".stripMargin,
    "q164_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q30_events_json" ->
      """SELECT event_type, count(k) AS n, round(avg(k), 6) AS avg_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q31_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE user_id < 100)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q32_numbers_tablefunc" ->
      """SELECT count(*) AS n, CAST(sum(number) AS BIGINT) AS s,
        |  min(number) AS mn, max(number) AS mx,
        |  CAST(sum(CASE WHEN number % 7 = 0 THEN number END) AS BIGINT) AS s7
        |FROM (SELECT range AS number FROM range(1000000)) t""".stripMargin,
  )
}

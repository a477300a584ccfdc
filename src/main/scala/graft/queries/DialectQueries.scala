package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.GraftSession
import graft.tables.Tables

/** Driver queries that enter through the SQL DIALECT surface (GraftSession
  * text → rewrites → spark.sql) instead of the DataFrame API — proving the
  * reference's SQL front door end-to-end inside the oracle harness. */
object DialectQueries {

  private def g(s: SparkSession, dir: String): GraftSession = {
    Tables.registerAll(s, dir)
    new GraftSession(s)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_dialect_combinators" -> ((s, dir) => {
      // combinator suffixes + uniq through the text rewriter
      g(s, dir).sql(
        """SELECT l_returnflag,
          |  round(sumIf(l_quantity, l_discount > 0.05), 2) AS sq,
          |  countIf(l_discount > 0.05) AS cq,
          |  uniq(l_orderkey) AS u
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),
    "q39_dialect_limit_by" -> ((s, dir) => {
      // numbers() table function + ClickHouse LIMIT n BY through the dialect
      g(s, dir).sql(
        """SELECT number % 5 AS k, number FROM numbers_mt(1000)
          |ORDER BY k, number LIMIT 3 BY k""".stripMargin)
    }),
  )

  def oracle: Map[String, String] = Map(
    "q38_dialect_combinators" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_discount > 0.05 THEN l_quantity END), 2) AS sq,
        |  CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS cq,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS u
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q39_dialect_limit_by" ->
      """WITH t AS (SELECT gs % 5 AS k, gs AS number FROM generate_series(0, 999) s(gs)),
        |r AS (SELECT k, number,
        |  row_number() OVER (PARTITION BY k ORDER BY k, number) AS rn FROM t)
        |SELECT k, number FROM r WHERE rn <= 3 ORDER BY k, number""".stripMargin,
  )
}

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
    "q96_csv_engine" -> ((s, dir) => {
      // The CSV table engine END-TO-END under the oracle gate: customer is
      // exported to headered CSV, mounted via the reference's
      // `ENGINE = CSV location=... has_header=1` DDL, and aggregated joined
      // against the parquet nation — the result must equal the same rollup
      // over the parquet original. Exercises CSV schema inference + the
      // DDL rewrite path inside Verify, not just DialectSpec.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q96").toString
      Tables.table(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val gs = g(s, dir)
      gs.sql("DROP TABLE IF EXISTS q96_cust_csv")
      gs.sql(s"CREATE TABLE q96_cust_csv (c_custkey BIGINT, c_nationkey BIGINT, " +
        s"c_acctbal DOUBLE, c_mktsegment STRING) ENGINE = CSV location='$tmp' has_header=1")
      val out = gs.sql(
        """SELECT n_name, c_mktsegment, count(*) AS n,
          |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE), 2) AS bal
          |FROM q96_cust_csv JOIN nation ON c_nationkey = n_nationkey
          |WHERE c_nationkey < 5
          |GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment""".stripMargin)
      // evaluate the bounded rollup, then unmount the scratch table so the
      // session catalog stays pinned (same hygiene as q80/q82) and drop the
      // CSV scratch dir
      val rows = out.collect().toSeq
      val result = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), out.schema)
      gs.sql("DROP TABLE IF EXISTS q96_cust_csv")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(tmp))
      result
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
    // the CSV round-trip is row-preserving — plain parquet-side oracle
    "q96_csv_engine" ->
      """SELECT n_name, c_mktsegment, count(*) AS n,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_nationkey < 5
        |GROUP BY n_name, c_mktsegment ORDER BY n_name, c_mktsegment""".stripMargin,
  )
}

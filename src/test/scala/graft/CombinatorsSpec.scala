package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Combinators
import graft.functions.Combinators._

/** Aggregate-combinator semantics vs hand-computed expectations
  * (reference: aggregate_combinator_if.rs, aggregate_combinator_distinct.rs,
  * aggregate_arg_min/max.rs). */
class CombinatorsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 2L, 5.0),
    ("b", 3L, 30.0), ("b", 4L, 40.0)
  ).toDF("k", "x", "y")

  test("sumIf / countIf / avgIf / minIf / maxIf") {
    val r = df.agg(
      sumIf(col("x"), col("k") === "a").as("s"),
      countIf(col("k") === "a").as("c"),
      avgIf(col("y"), col("k") === "b").as("a"),
      minIf(col("y"), col("x") > 1).as("mn"),
      maxIf(col("y"), col("k") === "a").as("mx")).head()
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 35.0)
    assert(r.getDouble(3) === 5.0)
    assert(r.getDouble(4) === 20.0)
  }

  test("uniq / uniqIf / sumDistinct") {
    val r = df.agg(
      uniq(col("x")).as("u"),
      uniqIf(col("x"), col("k") === "a").as("ui"),
      Combinators.sumDistinct(col("x")).as("sd")).head()
    assert(r.getLong(0) === 4L)  // {1,2,3,4}
    assert(r.getLong(1) === 2L)  // {1,2}
    assert(r.getLong(2) === 10L) // 1+2+3+4
  }

  test("uniqApprox within rsd on a known cardinality") {
    val n = spark.range(0, 10000)
      .agg(uniqApprox(col("id"), 0.02).as("u")).head().getLong(0)
    assert(math.abs(n - 10000) <= 10000 * 0.06)
  }

  test("uniq_exact_state UDAF (Aggregator exemplar) equals count_distinct") {
    val spark = TestSpark.spark
    val g = new graft.sql.GraftSession(spark)
    val r = g.sql(
      """SELECT uniq_exact_state(number) AS u, count(DISTINCT number) AS c
        |FROM (SELECT number % 97 AS number FROM numbers(10000))""".stripMargin).head()
    assert(r.getLong(0) == 97L && r.getLong(1) == 97L)
  }

  test("argMin / argMax") {
    val r = df.agg(
      argMin(col("k"), col("y")).as("amn"),
      argMax(col("k"), col("y")).as("amx")).head()
    assert(r.getString(0) === "a") // y=5.0 row
    assert(r.getString(1) === "b") // y=40.0 row
  }
}

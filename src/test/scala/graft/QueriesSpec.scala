package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run end-to-end on sf0.001 without throwing.
  * (Value-level correctness is the driver's DuckDB oracle at sf0.01 — see
  * dev/check_oracle.py for the local mimic.) */
class QueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys are consistent") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, TestSpark.sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}

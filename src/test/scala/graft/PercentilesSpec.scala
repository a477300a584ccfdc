package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Percentiles

/** Pins ops/Percentiles (distributed cumsum percentile_cont) bit-for-bit
  * against Spark's builtin `percentile` — the correctness contract that
  * lets q131's exact side drop the ObjectHashAggregate value buffer. */
class PercentilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95,
    "p0" -> 0.0, "p100" -> 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
    df.groupBy(col("g"))
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.95)").as("p95"),
        expr("percentile(v, 0.0)").as("p0"),
        expr("percentile(v, 1.0)").as("p100"))
      .collect().map(r => r.getString(0) -> (1 to 5).map(r.getDouble)).toMap

  private def cumsum(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
    Percentiles.exactInterpolated(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> (1 to 5).map(r.getDouble)).toMap

  test("matches builtin percentile bit-for-bit on lineitem prices") {
    val li = graft.tables.Tables.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val b = builtin(li)
    val c = cumsum(li)
    assert(c.keySet === b.keySet)
    // === on Double: bit-exact, not tolerance — the same IEEE formula
    c.keySet.foreach(k => assert(c(k) === b(k), s"group $k"))
  }

  test("edge cases: single-row group, two-value group, heavy duplicates") {
    val df = Seq(
      ("one", 42.5),
      ("two", 1.0), ("two", 2.0),
      ("dup", 7.0), ("dup", 7.0), ("dup", 7.0), ("dup", 9.0)
    ).toDF("g", "v")
    val b = builtin(df)
    val c = cumsum(df)
    assert(c === b)
    assert(c("one") === Seq(42.5, 42.5, 42.5, 42.5, 42.5))
    assert(c("two")(1) === 1.5) // p50 of {1,2} interpolates the midpoint
  }

  test("null values are skipped like the builtin; all-null group emits no row") {
    // {0,1} brackets: both interpolation spellings (lo + frac*(hi-lo) here,
    // the builtin's convex (1-frac)*lo + frac*hi) reduce to frac exactly,
    // so the comparison stays bit-exact and tests ONLY the null semantics
    val df = Seq(
      ("a", Option(0.0)), ("a", None), ("a", Option(1.0)), ("a", None),
      ("b", None), ("b", None),
      ("c", Option(5.0))
    ).toDF("g", "v")
    val c = cumsum(df)
    // builtin skips nulls too — restate it on the null-free frame so the
    // comparison is apples-to-apples (the builtin returns a null ROW for
    // the all-null group; this op omits the row, as documented)
    val b = builtin(df.filter(col("v").isNotNull))
    assert(c.keySet === Set("a", "c"), "all-null group must produce no row")
    assert(c === b)
    assert(c("a")(1) === 0.5) // p50 of {0,1}: nulls neither counted nor bracketed
  }

  test("duplicate-spanning brackets: index pair falls inside one run") {
    // 10 copies of 5.0 then one 100.0: p50 position 5.0 sits mid-run (both
    // bracket indices inside the 5.0 run), p95 position 9.5 spans the run
    // boundary (lo=5.0, hi=100.0)
    val df = (Seq.fill(10)(5.0) :+ 100.0).map(("r", _)).toDF("g", "v")
    val b = builtin(df)
    val c = cumsum(df)
    assert(c === b)
    assert(c("r")(1) === 5.0 && c("r")(2) === 5.0 + 0.5 * 95.0)
  }
}

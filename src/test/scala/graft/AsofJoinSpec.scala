package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin
import graft.tables.Tables

/** AsofJoin (graft.ops.AsofJoin): backward inclusive as-of semantics against
  * a Scala-computed oracle, tolerance behavior, no-match left-join behavior,
  * and the plan guard — the operator must shuffle exactly once. */
class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("backward inclusive match, no-match rows survive with nulls") {
    val left = Seq((1L, ts(5), "a"), (1L, ts(10), "b"), (2L, ts(3), "c"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, ts(5), 500.0), (1L, ts(8), 800.0), (2L, ts(9), 900.0))
      .toDF("k", "ts", "rv")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts")
      .orderBy("k", "ts")
      .select(col("k"), col("ts"), col("lv"), col("r_rv"), col("r_ts"))
      .collect()
    assert(got(0).getDouble(3) == 500.0 && got(0).getTimestamp(4) == ts(5)) // inclusive
    assert(got(1).getDouble(3) == 800.0) // latest at-or-before 10
    assert(got(2).isNullAt(3) && got(2).isNullAt(4)) // no purchase <= 3
  }

  test("tolerance: stale matches null out, left row survives") {
    val left = Seq((1L, ts(100), "x")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts(10), 1.0)).toDF("k", "ts", "rv")
    val within = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      toleranceSeconds = Some(90L)).collect().head
    assert(within.getDouble(3) == 1.0)
    val stale = AsofJoin.asofJoin(left, right, Seq("k"), "ts",
      toleranceSeconds = Some(89L)).collect().head
    assert(stale.isNullAt(3) && stale.isNullAt(4))
    assert(stale.getString(2) == "x") // left-join: row survives
  }

  test("right-side ts ties: max payload wins, invariant across shuffle widths") {
    val left = Seq((1L, ts(10), "a"), (2L, ts(10), "b")).toDF("k", "ts", "lv")
    // three tied right rows per key — winner must be the max payload struct
    val right = Seq(
      (1L, ts(10), 7.0), (1L, ts(10), 3.0), (1L, ts(10), 9.0),
      (2L, ts(5), 2.0), (2L, ts(5), 8.0), (2L, ts(5), 1.0))
      .toDF("k", "ts", "rv")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val results = Seq("1", "7", "32").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        AsofJoin.asofJoin(left, right.repartition(n.toInt), Seq("k"), "ts")
          .orderBy("k").collect().map(_.toString).toSeq
      }
      assert(results(0).head.contains("9.0") && results(0)(1).contains("8.0"))
      assert(results(0) == results(1) && results(1) == results(2),
        s"tie-break varies with partitioning: $results")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("output-name collision with left side is refused") {
    val left = Seq((1L, ts(5), "a")).toDF("k", "ts", "r_rv")
    val right = Seq((1L, ts(5), 1.0)).toDF("k", "ts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("r_rv"))
  }

  test("events sf0.001: matches a per-user scan oracle; exactly one shuffle") {
    val ev = Tables.table(spark, TestSpark.sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pvalue"))

    // Plan guard on raw (non-aggregated) inputs: the OPERATOR itself must
    // add exactly one Exchange — union both sides, shuffle once on the key.
    val rawRight = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pvalue"))
    val rawPlan = AsofJoin.asofJoin(clicks, rawRight, Seq("user_id"), "ts")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(rawPlan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$rawPlan")

    val joined = AsofJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts")

    // Scala oracle: per user, purchases sorted by ts; latest at-or-before.
    val p: Map[Long, Seq[(Long, Long, Double)]] = purchases.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .toSeq.groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    val got = joined.collect()
    assert(got.nonEmpty)
    var matched = 0
    got.foreach { r =>
      val (uid, t) = (r.getLong(1), r.getTimestamp(2).getTime)
      val exp = p.getOrElse(uid, Seq.empty)
        .filter(_._2 <= t).lastOption
      exp match {
        case Some((_, rts, rv)) =>
          assert(r.getDouble(4) == rv && r.getTimestamp(5).getTime == rts,
            s"uid=$uid ts=$t got=(${r.get(4)},${r.get(5)}) want=($rv,$rts)")
          matched += 1
        case None => assert(r.isNullAt(4) && r.isNullAt(5))
      }
    }
    assert(matched > 0, "oracle matched zero rows — test is vacuous")
  }
}

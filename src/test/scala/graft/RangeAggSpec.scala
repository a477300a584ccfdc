package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** RangeAggExec (graft.plans.RangeAgg): the fused generator+aggregate kernel.
  * Every correctness test first asserts the operator actually planned (so a
  * silently-disabled strategy can't pass by falling back to stock Spark),
  * then checks exact values against closed-form math. ANSI-mode tests pin the
  * eligibility proof: provably-safe sums fuse, overflowing sums fall back to
  * the stock path and raise the error ANSI demands. */
class RangeAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def assertFused(df: DataFrame): Unit = {
    val p = physical(df)
    assert(p.contains("RangeAgg"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("sum/min/max/count/avg over numbers fuse and match closed forms") {
    val n = 100000L
    val df = Tables.numbers(spark, n, Some(4)).agg(
      sum("number").as("s"), min("number").as("mn"), max("number").as("mx"),
      count("number").as("c"), avg("number").as("a"))
    assertFused(df)
    val r = df.collect().head
    assert(r.getLong(0) == n * (n - 1) / 2)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == n - 1)
    assert(r.getLong(3) == n)
    assert(r.getDouble(4) == (n - 1).toDouble / 2.0)
  }

  test("expression aggregates: sum(v+v+v), sum(v%7), max(v*2-1)") {
    val n = 10000L
    val df = Tables.numbers(spark, n, Some(3)).agg(
      sum(col("number") + col("number") + col("number")).as("s3"),
      sum(col("number") % 7).as("sm"),
      max(col("number") * 2 - 1).as("mx"))
    assertFused(df)
    val r = df.collect().head
    assert(r.getLong(0) == 3 * n * (n - 1) / 2)
    assert(r.getLong(1) == (0L until n).map(_ % 7).sum)
    assert(r.getLong(2) == (n - 1) * 2 - 1)
  }

  test("composed output expressions (sum/count) evaluate on the substituted values") {
    val n = 5000L
    val df = Tables.numbers(spark, n, Some(4)).agg(
      (sum("number") / count("number")).as("a"), max("number").as("mx"), min("number").as("mn"))
    assertFused(df)
    val r = df.collect().head
    assert(r.getDouble(0) == (n * (n - 1) / 2).toDouble / n)
    assert(r.getLong(1) == n - 1)
    assert(r.getLong(2) == 0L)
  }

  test("non-unit start/step and descending ranges") {
    val df = spark.range(10, 107, 7).agg(sum("id").as("s"), count(lit(1)).as("c"),
      min("id").as("mn"), max("id").as("mx"))
    assertFused(df)
    val ids = 10L until 107L by 7L
    val r = df.collect().head
    assert(r.getLong(0) == ids.sum)
    assert(r.getLong(1) == ids.size)
    assert(r.getLong(2) == ids.min)
    assert(r.getLong(3) == ids.max)

    val down = spark.range(100, 0, -3).agg(sum("id").as("s"), count(lit(1)).as("c"))
    assertFused(down)
    val ids2 = 100L until 0L by -3L
    val r2 = down.collect().head
    assert(r2.getLong(0) == ids2.sum)
    assert(r2.getLong(1) == ids2.size)
  }

  test("empty range: NULL aggregates, zero count") {
    val df = spark.range(0).agg(sum("id").as("s"), avg("id").as("a"),
      min("id").as("mn"), count("id").as("c"))
    assertFused(df)
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getLong(3) == 0L)
  }

  test("negative ids: min/max/sum signs") {
    val df = spark.range(-1000, 1000, 1, 4).agg(
      sum("id").as("s"), min("id").as("mn"), max("id").as("mx"))
    assertFused(df)
    val r = df.collect().head
    assert(r.getLong(0) == -1000L) // pairs cancel, remainder is -1000
    assert(r.getLong(1) == -1000L)
    assert(r.getLong(2) == 999L)
  }

  test("ANSI: overflowing sum is NOT fused and still raises") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = spark.range(Long.MaxValue - 10, Long.MaxValue).agg(sum("id"))
      assert(!physical(df).contains("RangeAgg"), physical(df))
      intercept[Exception] { df.collect() }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("LEGACY: overflowing sum fuses and wraps like stock Spark") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = spark.range(Long.MaxValue - 10, Long.MaxValue).agg(sum("id").as("s"))
      assertFused(df)
      var expected = 0L
      (Long.MaxValue - 10) until Long.MaxValue foreach { v => expected += v }
      assert(df.collect().head.getLong(0) == expected)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("does not fire for grouped aggregates, filters, or distinct") {
    val grouped = Tables.numbers(spark, 1000L, Some(2))
      .groupBy(col("number") % 3).agg(sum("number"))
    assert(!physical(grouped).contains("RangeAgg"), physical(grouped))

    val filtered = Tables.numbers(spark, 1000L, Some(2))
      .filter(col("number") > 10).agg(sum("number"))
    assert(!physical(filtered).contains("RangeAgg"), physical(filtered))

    val distinct = Tables.numbers(spark, 1000L, Some(2))
      .agg(sum_distinct(col("number")))
    assert(!physical(distinct).contains("RangeAgg"), physical(distinct))
  }

  test("pmod: positive divisor fuses; negative divisor falls back to Spark semantics") {
    val n = 1000L
    // dividend interval spans negatives so the +m fold is actually exercised
    val pos = Tables.numbers(spark, n, Some(3))
      .agg(sum(pmod(col("number") - 500, lit(7L))).as("s"))
    assertFused(pos)
    assert(pos.collect().head.getLong(0) == (0L until n).map(v => Math.floorMod(v - 500, 7L)).sum)

    // pmod(1, -3) is 1 in Spark but -2 under the folded ((l%m)+m)%m form —
    // a negative literal divisor must NOT fuse, and must keep Spark's value.
    val neg = Tables.numbers(spark, n, Some(3))
      .agg(sum(pmod(col("number"), lit(-3L))).as("s"))
    assert(!physical(neg).contains("RangeAgg"), physical(neg))
    val expected = (0L until n).map { v =>
      val r = v % -3L; if (r < 0) (r + -3L) % -3L else r
    }.sum
    assert(neg.collect().head.getLong(0) == expected)
  }

  test("closed forms: affine sum/min/max answer a trillion-row range instantly") {
    // Loop-free path: at 2^40 elements a 4-lane loop would take minutes; the
    // affine closed form must answer in well under a second with exact values.
    // LEGACY mode — the total wraps past Long.Max, which ANSI rightly refuses.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val n = 1L << 40
      val t0 = System.nanoTime()
      val df = Tables.numbers(spark, n, Some(32)).agg(
        sum("number").as("s"), min("number").as("mn"), max("number").as("mx"),
        sum(col("number") * 2 + 1).as("s2"))
      assertFused(df)
      val r = df.collect().head
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      val sumN = BigInt(n) * (n - 1) / 2
      assert(r.getLong(0) == sumN.toLong) // wraps; BigInt low-64 = Spark LEGACY
      assert(r.getLong(1) == 0L)
      assert(r.getLong(2) == n - 1)
      assert(r.getLong(3) == (sumN * 2 + n).toLong)
      assert(elapsedMs < 2000.0, s"closed form took ${elapsedMs}ms — it looped")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("wrap-prone min/max is not solved at endpoints — matches stock Spark") {
    // id * 2^60 wraps for id >= 8, so values are not monotone; the endpoint
    // shortcut must refuse (noWrap=false) and the loop must match stock.
    // LEGACY mode — ANSI would (correctly) throw on the overflow instead.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val big = 1L << 60
      val fused = spark.range(0, 1000, 1, 4).agg(
        max(col("id") * big).as("mx"), min(col("id") * big).as("mn"))
      assertFused(fused)
      val stock = spark.range(0, 1000, 1, 4).filter(col("id") >= 0).agg(
        max(col("id") * big).as("mx"), min(col("id") * big).as("mn"))
      assert(!physical(stock).contains("RangeAgg"))
      val (rf, rs) = (fused.collect().head, stock.collect().head)
      assert(rf.getLong(0) == rs.getLong(0))
      assert(rf.getLong(1) == rs.getLong(1))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("descending range: affine endpoints honor negative step") {
    val df = spark.range(1000, -1000, -7).agg(
      min("id").as("mn"), max("id").as("mx"), sum("id").as("s"))
    assertFused(df)
    val ids = 1000L until -1000L by -7L
    val r = df.collect().head
    assert(r.getLong(0) == ids.min)
    assert(r.getLong(1) == ids.max)
    assert(r.getLong(2) == ids.sum)
  }

  test("avg matches stock Spark bit-for-bit on a partition-aligned range") {
    // Affine avg closed-forms (exact sum + one division); on this range the
    // stock double accumulation is also exact (sum < 2^53), so the two must
    // coincide bit-for-bit. Compare against a stock plan forced via a filter.
    val fused = spark.range(0, 100000, 1, 4).agg(avg("id").as("a"))
    assertFused(fused)
    val stock = spark.range(0, 100000, 1, 4).filter(col("id") >= 0).agg(avg("id").as("a"))
    assert(!physical(stock).contains("RangeAgg"))
    assert(fused.collect().head.getDouble(0) == stock.collect().head.getDouble(0))
  }

  test("affine avg is the exact rational mean, loop-free, past 2^53 sums") {
    // range(B, B + n): exact mean = B + (n-1)/2; at B = 2^60 a double
    // RUNNING SUM would round every addition (values ≫ 2^53) while the
    // closed form computes Σ in BigInt and rounds ONCE at the division.
    val b = 1L << 60
    val n = 1000001L
    val df = spark.range(b, b + n).agg(avg("id").as("a"))
    assertFused(df)
    val expected = (BigDecimal(BigInt(b) * BigInt(n) + BigInt(n) * BigInt(n - 1) / 2,
      java.math.MathContext.DECIMAL128) / BigDecimal(n)).toDouble
    assert(df.collect().head.getDouble(0) == expected)
    // and a non-affine avg still takes the loop path with the same answer
    // shape (serial double accumulation — pinned by the bit-for-bit test)
    val loop = spark.range(0, 1000).agg(avg(col("id") * col("id")).as("a"))
    assertFused(loop)
    assert(loop.collect().head.getDouble(0) ==
      (0 until 1000).map(i => i.toDouble * i).sum / 1000.0)
  }

  test("rationalToDouble: correctly rounded, half to even, vs exact midpoints") {
    import graft.plans.RangeAggStrategy.rationalToDouble
    // exact tie at mantissa boundary: (2^53+1)/2^53 is halfway between
    // 1.0 (even mantissa) and nextUp(1.0) -> rounds DOWN to 1.0
    assert(rationalToDouble(BigInt(2).pow(53) + 1, BigInt(2).pow(53)) == 1.0)
    // (2^53+3)/2^53 is halfway between 1+2^-52 (odd) and 1+2^-51 (even)
    // -> rounds UP
    assert(rationalToDouble(BigInt(2).pow(53) + 3, BigInt(2).pow(53)) ==
      1.0 + math.pow(2, -51))
    assert(rationalToDouble(BigInt(0), BigInt(7)) == 0.0)
    assert(rationalToDouble(BigInt(-3), BigInt(2)) == -1.5)
    assert(rationalToDouble(BigInt(3), BigInt(-2)) == -1.5)
    // property check against the exact rational: the returned d must
    // satisfy |s/n - d| <= half-ulp with ties only at even mantissas --
    // verified by comparing s/n to the EXACT midpoints (d +/- ulp/2),
    // all in BigDecimal (finite doubles are exact decimals)
    val rnd = new scala.util.Random(20260815)
    (0 until 4000).foreach { i =>
      val sBits = 1 + rnd.nextInt(96)
      val nBits = 1 + rnd.nextInt(64)
      val sv = BigInt(sBits, rnd) * (if (rnd.nextBoolean()) 1 else -1)
      val nv = BigInt(nBits, rnd) + 1
      val d = rationalToDouble(sv, nv)
      // scala.BigDecimal(double) goes through Double.toString (INEXACT);
      // java's new BigDecimal(double) is the exact binary value
      def exact(x: Double): BigDecimal = BigDecimal(new java.math.BigDecimal(x))
      val exactQ = (BigDecimal(sv), BigDecimal(nv))
      def cmpQ(x: BigDecimal): Int =
        (exactQ._1 - x * exactQ._2).signum * exactQ._2.signum
      val up = exact(Math.nextUp(d)); val dn = exact(Math.nextDown(d))
      val dd = exact(d)
      val midUp = (dd + up) / 2
      val midDn = (dd + dn) / 2
      // s/n must lie in [midDn, midUp]; at an exact midpoint the mantissa
      // must be even (testBit(0) == false on the 53-bit significand)
      assert(cmpQ(midDn) >= 0 && cmpQ(midUp) <= 0,
        s"[$i] $sv/$nv -> $d not nearest")
      if (cmpQ(midUp) == 0 || cmpQ(midDn) == 0) {
        val bits = java.lang.Double.doubleToLongBits(math.abs(d))
        assert((bits & 1L) == 0L, s"[$i] tie not broken to even: $sv/$nv -> $d")
      }
    }
  }
}

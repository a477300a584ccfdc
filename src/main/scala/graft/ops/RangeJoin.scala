package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (banded) range join: match point `pt` to every interval
  * `[start, end)` — the IP-range lookup / incident-window attribution /
  * time-window enrichment join a training-data pipeline needs constantly.
  *
  * Spark plans a bare `p.pt >= i.start AND p.pt < i.end` theta join as a
  * BroadcastNestedLoopJoin (every point row evaluates every interval — dies
  * as soon as the interval side outgrows a broadcast, and is O(|P|·|I|)
  * compute even when it fits). The banding trick makes it an EQUI join:
  * quantize the domain into bins of `bin` width; an interval registers in
  * each bin it overlaps (`ceil(span/bin)` rows, bounded when `bin` is chosen
  * near the typical span), a point lands in exactly one bin, and candidates
  * meet on bin equality with the exact range predicate re-checked. One
  * shuffle (or broadcast) on bin keys, never a nested loop — the same
  * blocking idea as the LSH/band dedup joins, applied to 1-D ranges.
  *
  * Domain is `long` (epoch micros, IPv4-as-int, byte offsets…). Bin indices
  * use floor division spelled `(v - pmod(v, bin)) / bin` — exact for |v| <
  * 2^53 (epoch-micros until year ~2255; all IPv4), negative-safe. Intervals
  * with `end <= start` are empty and dropped, matching the half-open oracle
  * `WHERE pt >= start AND pt < end`. Output = point columns ++ interval
  * columns, inner-join semantics (a point in k overlapping intervals yields
  * k rows).
  *
  * Scale knob: at a FIXED bin width, densifying both sides grows per-bin
  * candidate pairs super-linearly (measured 40× wall at 100× data) — bin
  * width should scale ∝ 1/density, the same granularity-follows-data rule
  * as LSH planes and SemDedup cluster counts.
  */
object RangeJoin {

  private def fdiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** The scale rule for [[binnedRangeJoin]]'s bin width — granularity
    * follows the data (the same rule as LSH planes and SemDedup cluster
    * counts): bin = span · targetPerBin / |P|, i.e. width ∝ 1/point-density,
    * so the expected points per bin stay at `targetPerBin` no matter how
    * much the corpus densifies. At a FIXED width, densifying both sides
    * grows per-bin candidate enumeration super-linearly (measured 40× wall
    * at 100× data, PERFNOTES); under the rule the per-bin work is constant
    * and the candidate slop over true matches shrinks toward zero (an
    * interval's partially-covered edge bins hold fewer strays). Costs one
    * (min, max, count) aggregation over the point side — footer-stats cheap
    * on a parquet-backed corpus. */
  def binWidthFor(points: DataFrame, pt: String,
      targetPerBin: Long = 1024): Long = {
    require(targetPerBin > 0, "binWidthFor: targetPerBin must be positive")
    val r = points.agg(min(col(pt)).cast("long"), max(col(pt)).cast("long"),
      count(lit(1))).head()
    if (r.isNullAt(0)) 1L
    else {
      val span = r.getLong(1) - r.getLong(0) + 1
      // double arithmetic: span·target can overflow Long on wide domains,
      // and bin width needs no sub-integer precision
      math.max(1L, math.round(
        span.toDouble * targetPerBin / math.max(r.getLong(2), 1L)))
    }
  }

  def binnedRangeJoin(points: DataFrame, pt: String, intervals: DataFrame,
      start: String, end: String, bin: Long): DataFrame = {
    require(bin > 0, "binnedRangeJoin: bin width must be positive")
    val clash = intervals.columns.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty,
      s"binnedRangeJoin: overlapping column names ${clash.mkString(", ")}")
    val p = points.withColumn("__bin", fdiv(col(pt), bin))
    val iv = intervals.filter(col(end) > col(start))
      .withColumn("__bin",
        explode(sequence(fdiv(col(start), bin), fdiv(col(end) - 1, bin))))
    p.join(iv, Seq("__bin"))
      .filter(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__bin")
  }

  /** Aggregate pushdown THROUGH the range join — the scale path when the
    * caller only wants a rollup per interval (count/sums), which is what
    * window-attribution queries actually ask. [[binnedRangeJoin]] must
    * materialize every (point, interval) pair, and when densifying data
    * grows per-interval matches linearly the pair set grows quadratically —
    * no bin width fixes that, because it is the true join output. This
    * operator never materializes the pairs: each interval decomposes into
    * aligned bins at a cascade of widths (`widths`, coarse → fine, each
    * dividing the previous — the classic segment-tree / multi-resolution
    * grid decomposition), fully-covered bins contribute PRE-AGGREGATED
    * per-bin partials (count + sums, one shuffle whose size is the bin
    * table, not the corpus), and only the sub-finest-bin edge slivers —
    * O(finest width · density) points per interval — meet raw points with
    * the exact half-open predicate. Work: one pass building partials
    * (|P|·levels exploded rows, map-side combined to Σ bins), a
    * bins-per-interval-sized equi join (≤ 2·(span/L1 + Σ radix) keys per
    * interval), and the edge join. Linear in each side where the pair join
    * is quadratic.
    *
    * Output: one row per `ivKey` group that matched ≥1 point (inner-join
    * semantics), columns `ivKey ++ (n_points, sum_<c> per sumCols)`.
    * Decomposable aggregates only (count + sum; min/max would compose the
    * same way). Exactness: the chosen bins tile exactly the covered region
    * `[A, B)` of each interval, the edge join takes `pt ∈ [start, end)`
    * minus `[A, B)`, so every point is counted once — property-pinned
    * against the theta join in ScaleOpsSpec. */
  def multiLevelRangeAgg(points: DataFrame, pt: String, sumCols: Seq[String],
      intervals: DataFrame, ivKey: Seq[String], start: String, end: String,
      widths: Seq[Long]): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0),
      "multiLevelRangeAgg: widths must be positive")
    require(widths.sliding(2).forall {
      case Seq(a, b) => a > b && a % b == 0
      case _ => true
    }, "multiLevelRangeAgg: widths must be strictly decreasing and nested " +
      "(each dividing the previous)")
    val clash = intervals.columns.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty,
      s"multiLevelRangeAgg: overlapping column names ${clash.mkString(", ")}")

    def ceilVal(c: Column, w: Long): Column = fdiv(c + (w - 1), w) * w
    def floorVal(c: Column, w: Long): Column = fdiv(c, w) * w

    val fine = widths.last
    val aggExprs = count(lit(1)).as("n_points") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))

    // Per-bin partials for every level in ONE pass: explode each point into
    // its (level, bin) at each width, one shuffle, map-side combine leaves
    // at most Σ-bins rows in flight
    val lvlStructs = widths.zipWithIndex.map { case (w, i) =>
      struct(lit(i).as("__lvl"), fdiv(col(pt), w).as("__bin"))
    }
    val partials = points
      .select(explode(array(lvlStructs: _*)).as("__lb") +: sumCols.map(col): _*)
      .select(col("__lb.__lvl").as("__lvl") +: col("__lb.__bin").as("__bin") +:
        sumCols.map(col): _*)
      .groupBy(col("__lvl"), col("__bin"))
      .agg(aggExprs.head, aggExprs.tail: _*)

    // Interval side: the covered region [A_i, B_i) grows level by level;
    // level i claims the bins inside [start, end) not already covered.
    // A_0 = B_0 = start (nothing covered); empty interiors carry through.
    val iv0 = intervals.filter(col(end) > col(start))
    val withAB = widths.zipWithIndex.foldLeft(
      iv0.withColumn("__A0", col(start)).withColumn("__B0", col(start))) {
      case (df, (w, i)) =>
        val nonEmpty = ceilVal(col(start), w) < floorVal(col(end), w)
        df.withColumn(s"__A${i + 1}",
            when(nonEmpty, ceilVal(col(start), w)).otherwise(col(s"__A$i")))
          .withColumn(s"__B${i + 1}",
            when(nonEmpty, floorVal(col(end), w)).otherwise(col(s"__B$i")))
    }
    def seqOrEmpty(f: Column, t: Column): Column = // [f, t) as bin indices
      when(f < t, sequence(f, t - 1)).otherwise(array().cast("array<long>"))
    val lvlBins = widths.zipWithIndex.map { case (w, i) =>
      val prefix = seqOrEmpty(fdiv(ceilVal(col(start), w), w),
        fdiv(ceilVal(col(s"__A$i"), w), w))
      val suffix = seqOrEmpty(fdiv(ceilVal(col(s"__B$i"), w), w),
        fdiv(floorVal(col(end), w), w))
      transform(concat(prefix, suffix),
        b => struct(lit(i).as("__lvl"), b.as("__bin")))
    }
    val k = widths.size
    val ivBins = withAB
      .select(ivKey.map(col) :+
        explode(flatten(array(lvlBins: _*))).as("__lb"): _*)
      .select(ivKey.map(col) :+ col("__lb.__lvl").as("__lvl") :+
        col("__lb.__bin").as("__bin"): _*)
    val covered = ivBins.join(partials, Seq("__lvl", "__bin"))
      .select(ivKey.map(col) ++
        (col("n_points") +: sumCols.map(c => col(s"sum_$c"))): _*)

    // Edge slivers: pt in [start, A_k) ∪ [B_k, end) — each shorter than the
    // finest width, so a point reaches only intervals sharing one of its
    // two edge fine-bins; the edge table is intervals-sized and the join is
    // an equi join on the fine bin with the exact predicate re-checked
    val edges = withAB.select(ivKey.map(col) ++ Seq(col(start), col(end),
      col(s"__A$k"), col(s"__B$k"),
      explode(array_distinct(array(fdiv(col(start), fine),
        fdiv(col(end) - 1, fine)))).as("__bin")): _*)
    val pFine = points.withColumn("__bin", fdiv(col(pt), fine))
    val edgeAgg = pFine.join(edges, Seq("__bin"))
      .filter(col(pt) >= col(start) && col(pt) < col(end) &&
        (col(pt) < col(s"__A$k") || col(pt) >= col(s"__B$k")))
      .groupBy(ivKey.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)

    val finalAggs = sum(col("n_points")).as("n_points") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    covered.unionByName(edgeAgg)
      .groupBy(ivKey.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}

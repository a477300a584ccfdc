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
}

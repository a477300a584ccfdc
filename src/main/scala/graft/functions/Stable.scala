package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine- and partitioning-stable aggregation spellings.
  *
  * Double addition is not associative: a distributed sum's value depends on
  * shuffle-fetch/merge order, which varies run-to-run and engine-to-engine —
  * so `round(sum(x), n)` flips on boundary values no matter the `n`
  * (observed at sf0.1 between Spark and the DuckDB oracle). Accumulating in
  * DECIMAL makes the sum exact and order-independent; the per-row
  * double→decimal(30,10) cast is deterministic in both engines. Oracle SQL
  * mirrors these as `CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE)`.
  */
object Stable {

  /** Order-independent sum of a double expression.
    *
    * Cost: decimal accumulation runs ~2× slower than double for the agg
    * stage (q04 at sf0.1: 1.1s → 2.0s) — the price of a bit-stable answer.
    * When a metric is defined in fixed-point units (money in cents), the
    * faster equivalent is integer accumulation:
    * `sum(floor(x*100 + 0.5).cast("long"))` — exact long sums at double
    * speed; kept out of the default because products of quantized inputs
    * (price × (1-discount)) are not themselves quantized. */
  def sumD(c: Column): Column = sum(c.cast("decimal(30,10)")).cast("double")

  /** Order-independent average (null-skipping, like `avg`). */
  def avgD(c: Column): Column = sumD(c) / count(c)

  /** Order-independent sum ROUNDED WHILE STILL DECIMAL, then cast to
    * double. `round(sumD(x), n)` re-rounds on a double, and a sum landing
    * on a half-at-scale-n boundary (…xx5 exactly, in decimal) rounds
    * differently once the binary cast nudges it a ulp below — one sf0.1
    * order total crossed engines that way (q268). Rounding the exact
    * decimal sum first makes the boundary case exact in both engines;
    * the final double carries an already-rounded value, which every IEEE
    * engine renders identically. Oracle form:
    * `CAST(round(sum(CAST(x AS DECIMAL(30,10))), n) AS DOUBLE)`. */
  def sumDR(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(30,10)")), scale).cast("double")
}

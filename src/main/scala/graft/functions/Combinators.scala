package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse-style aggregate-combinator surface of the reference.
  *
  * The reference resolves names like `sumIf` / `uniq` by composing an
  * `AggregateFunction` with a combinator
  * (common/functions/src/aggregates/aggregate_function_factory.rs:53-66,
  * aggregate_combinator_if.rs, aggregate_combinator_distinct.rs). In Spark the
  * same semantics are a *name-rewrite* onto codegen'd built-ins — conditional
  * aggregation is `agg(when(cond, x))`, distinct aggregation is
  * `sum_distinct`/`count_distinct` — so every combinator below stays inside
  * whole-stage codegen and two-phase (partial/final) hash aggregation.
  */
object Combinators {

  // ---- `If` combinator (aggregate_combinator_if.rs:1-166) -----------------
  // <agg>If(x, cond): aggregate x over only the rows where cond holds.
  def sumIf(x: Column, cond: Column): Column   = sum(when(cond, x))
  def countIf(cond: Column): Column            = count(when(cond, lit(1)))
  def avgIf(x: Column, cond: Column): Column   = avg(when(cond, x))
  def minIf(x: Column, cond: Column): Column   = min(when(cond, x))
  def maxIf(x: Column, cond: Column): Column   = max(when(cond, x))

  // ---- `distinct` combinator (aggregate_combinator_distinct.rs:34-120) ----
  // Reference keeps a HashSet of rows and feeds distinct values to the inner
  // aggregate; Spark's distinct-aggregate rewrite (expand + two aggregates)
  // is the distributed equivalent.
  def uniq(x: Column): Column          = count_distinct(x)
  def uniqIf(x: Column, cond: Column): Column = count_distinct(when(cond, x))
  def sumDistinct(x: Column): Column   = sum_distinct(x)
  /** Cheap cardinality variant (HyperLogLog++), the 100TB-scale default. */
  def uniqApprox(x: Column, rsd: Double = 0.05): Column = approx_count_distinct(x, rsd)

  // ---- argMin / argMax (aggregate_arg_min.rs / aggregate_arg_max.rs) ------
  // value of `x` at the row where `ord` is minimal / maximal.
  def argMin(x: Column, ord: Column): Column = min_by(x, ord)
  def argMax(x: Column, ord: Column): Column = max_by(x, ord)
}

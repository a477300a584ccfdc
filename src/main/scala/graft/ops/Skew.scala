package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: salt the heavy (left) side, replicate the
  * small-to-moderate (right) side `factor` ways, join on (key, salt).
  *
  * AQE's skew-join split (on by default) handles moderate skew at runtime by
  * splitting oversized partitions; explicit salting is for pathological
  * hot keys — a single key holding 1% of 100 TB lands 1 TB in one task
  * without it. Salt is derived from a hash of the whole left row (not
  * rand()): deterministic across retries and replays, which task re-execution
  * at scale requires.
  *
  * The result is row-for-row identical to the unsalted join.
  */
object Skew {

  /** Join types for which replicating the right side is result-preserving.
    * Right/full outer would emit each unmatched right row `factor` times
    * (one per salt replica), so they are rejected up front. */
  private val supportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(supportedJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: unsupported join type '$joinType' — replicating the right " +
        "side breaks right/full outer semantics (unmatched right rows would " +
        "be emitted once per salt replica)")
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(factor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key row counts — the diagnostic used to decide when to salt. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key")).limit(topN)
}

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

  /** Post-shuffle partition-load forecast under hash partitioning into
    * `parts`: every row lands in bucket md5(key) mod parts — a PORTABLE
    * surrogate for the engine's partitioner (skew structure is
    * hash-invariant: a hot key concentrates its rows under any hash, and
    * what the audit measures is the key distribution, not the hash).
    * Returns one row per occupied bucket (bucket, n_rows, n_keys): a
    * bucket at many-× the mean is the task that will straggle, BEFORE the
    * join runs — the decision input for [[saltedJoin]]/[[autoSaltFactor]]
    * and for sizing spark.sql.shuffle.partitions. One key-hashed
    * aggregation, map-side combined. */
  def shuffleSkewForecast(df: DataFrame, key: Column, parts: Int): DataFrame = {
    require(parts >= 1, "shuffleSkewForecast: parts must be >= 1")
    df.select(key.cast("string").as("k"))
      .withColumn("bucket", pmod(
        conv(substring(md5(col("k")), 1, 15), 16, 10).cast("long"),
        lit(parts.toLong)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("k")).as("n_keys"))
  }

  /** Per-key row counts — the diagnostic used to decide when to salt. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key")).limit(topN)

  /** Salt factor decision from a sampled key histogram: 0 (don't salt) when
    * no key holds ≥ `hotShare` of the sampled rows, else enough replicas to
    * spread the hottest key across the cluster (share × parallelism, clamped
    * to [2, maxFactor]).
    *
    * The sample is a deterministic row-hash slice (1/`sampleDenom` of rows,
    * same rows on every retry/replay — no RNG state), so the decision pass
    * reads a bounded fraction of the input and one tiny aggregate. At 100 TB
    * raise `sampleDenom`; share estimation only needs enough rows for the
    * hot key to surface, and a key worth salting is by definition frequent. */
  def autoSaltFactor(left: DataFrame, key: String, hotShare: Double = 0.2,
      maxFactor: Int = 32, sampleDenom: Long = 10L): Int = {
    require(hotShare > 0 && hotShare <= 1, "hotShare must be in (0, 1]")
    val sampled = left.filter(
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(sampleDenom)) === 0L)
    val top = sampled.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("top"), sum(col("n")).as("tot"))
      .collect()(0)
    if (top.isNullAt(0) || top.getLong(1) == 0L) 0
    else {
      val share = top.getLong(0).toDouble / top.getLong(1)
      if (share < hotShare) 0
      else {
        val parallelism = left.sparkSession.sparkContext.defaultParallelism
        math.min(maxFactor, math.max(2, math.ceil(share * parallelism).toInt))
      }
    }
  }

  /** [[saltedJoin]] with the factor chosen by [[autoSaltFactor]]; a uniform
    * key distribution degrades to the plain (unsalted) join. */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, key: String,
      joinType: String = "inner", hotShare: Double = 0.2, maxFactor: Int = 32): DataFrame = {
    val factor = autoSaltFactor(left, key, hotShare, maxFactor)
    if (factor == 0) left.join(right, Seq(key), joinType)
    else saltedJoin(left, right, key, factor, joinType)
  }
}

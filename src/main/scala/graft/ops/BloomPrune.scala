package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the semi-join-reduction Spark's own
  * `InjectRuntimeFilter` rule applies when statistics justify it, exposed as
  * an operator so a pipeline can force it where the optimizer can't see the
  * selectivity (e.g. the dim filter is a computed predicate).
  *
  * Shape at 100 TB: the dim side's keys fold into a fixed-size bit array
  * (one aggregation over the SMALL side), the fact side filters at SCAN
  * speed before its shuffle — rows that cannot join never leave the mapper.
  * With a 2% -selective dim, the join's Exchange moves ~2% of the fact (plus
  * the bloom's false-positive rate). The exact join afterwards removes false
  * positives, so results are identical to the plain join — the bloom is
  * pure shuffle-volume reduction, which is why the oracle can restate the
  * query as the plain semi join.
  *
  * Uses Spark's own codegen'd `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions (the pair behind runtime filtering) via the Bridge shim; the
  * built filter rides the plan as a foldable binary literal — the local-mode
  * stand-in for the broadcast variable a multi-executor plan would carry.
  */
object BloomPrune {

  /** Aggregate `dim`'s key column into a serialized bloom filter.
    * Driver-bounded by construction: `numBits` bits regardless of row count
    * (1 M bits ≈ 125 KB). */
  def bloomBytes(dim: DataFrame, key: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** Scan-side membership probe against a built filter (no false negatives;
    * false positives bounded by the numBits/expectedItems sizing). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))

  /** Bloom-pruned semi join: `fact` rows whose `factKey` joins `dim.dimKey`.
    * The bloom probe prunes fact BEFORE the exchange; the exact semi join
    * afterwards eliminates bloom false positives, so the result equals the
    * plain semi join row-for-row. */
  def bloomSemiJoin(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedItems: Long, numBits: Long): DataFrame = {
    val bytes = bloomBytes(dim, dimKey, expectedItems, numBits)
    // an empty dim aggregates to a NULL sketch — the semi join is empty by
    // definition, so prune everything rather than probe a null filter
    val pruned =
      if (bytes == null) fact.filter(lit(false)) else fact.filter(mightContain(bytes, factKey))
    pruned.join(dim.select(dimKey.as("__bloom_k")).distinct(),
      factKey === col("__bloom_k"), "left_semi")
  }
}

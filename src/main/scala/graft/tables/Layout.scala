package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout control for data skipping: range- and Z-order-clustered
  * writes.
  *
  * `repartitionByRange(keys)` gives each output file a DISJOINT key range,
  * and `sortWithinPartitions` orders rows inside, so every parquet footer's
  * min/max statistics become selective: a reader filtering on the cluster
  * key prunes whole files (and row groups) without touching data. At 100 TB
  * this is the difference between scanning everything and scanning the one
  * file a date predicate selects. (The reference's `Part`/statistics model —
  * plan_partition.rs, plan_statistics.rs — stops at exact row counts; file
  * pruning is the Spark-native extension of it.)
  */
object Layout {

  def writeRangeClustered(df: DataFrame, path: String, files: Int, keys: Seq[Column]): Unit =
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) interleave of two `bits`-bit nonneg ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure shift/or expression
    * tree — codegen'd, no UDF. */
  def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order-clustered write: files are clustered on the Morton interleave
    * of the two columns' quantile ranks, so footer min/max statistics stay
    * selective on BOTH dimensions at once — a range-clustered layout prunes
    * perfectly on its leading key and not at all on the second; Z-order
    * trades a little of the first dimension's locality for pruning on both.
    *
    * Ranks come from `ntile(2^bits)` — two window sorts, paid once at write
    * time (the write already pays a range shuffle + sort; at 100 TB the rank
    * pass can be replaced by a sampled quantile map, same layout). */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
      a: Column, b: Column, bits: Int = 12): Unit = {
    val buckets = 1 << bits
    val ra = (ntile(buckets).over(Window.orderBy(a)) - 1).cast("long")
    val rb = (ntile(buckets).over(Window.orderBy(b)) - 1).cast("long")
    df.withColumn("__z", morton(ra, rb, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}

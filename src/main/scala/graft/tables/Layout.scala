package graft.tables

import org.apache.spark.sql.{Column, DataFrame}

/** Physical-layout control for data skipping: range-clustered writes.
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
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator layer mirroring SURVEY.md §2 as DataFrame combinators.
  *
  * Filter / projection / aggregation / sort / limit map 1:1 onto Catalyst
  * (the reference's transform pipeline — transform_filter.rs,
  * transform_projection.rs, transform_group_by_partial.rs etc. — is what
  * Catalyst+Tungsten already do). Only the operators Spark has no literal
  * spelling for get code here.
  */
object Relational {

  /** ClickHouse `LIMIT n BY key...` (transform_limit_by.rs:17-64): keep the
    * first n rows per key group. Spark-native rewrite: `row_number` over a
    * window partitioned by the keys. One hash-partition shuffle on the keys —
    * the same data movement the reference's per-stream hash would need in a
    * cluster — then a codegen'd filter; scales to arbitrary group counts.
    * `order` makes "first n" deterministic (the reference inherits stream
    * order, which is not reproducible distributed — callers must pin one). */
  def limitBy(df: DataFrame, n: Int, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Top-k: ORDER BY ... LIMIT k. Spark plans this as
    * `TakeOrderedAndProject` — per-partition heaps + a k-row merge on the
    * driver, no global sort shuffle (the reference's limit-aware
    * sort/merge cascade, pipeline_builder.rs:220-261, built in). */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** LIMIT n OFFSET m after a total order (transform_limit.rs:17-65). */
  def limitOffset(df: DataFrame, limit: Int, offset: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)

  /** Exact deduplication on a set of key columns, keeping the row that
    * minimizes `keep` — groupBy+min_by, one shuffle, no window needed. */
  def dedupFirst(df: DataFrame, keys: Seq[Column], keep: Column): DataFrame = {
    val others = df.columns.map(col)
    df.groupBy(keys: _*)
      .agg(min_by(struct(others.toIndexedSeq: _*), keep).as("__row"))
      .select(col("__row.*"))
  }
}

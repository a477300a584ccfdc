package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins —
  * the Spark counterpart of planning a repeated 100 TB fact⋈fact join:
  * pay the shuffle ONCE at write time, then every subsequent equi-join on
  * the bucket keys plans with zero `Exchange` on either side.
  *
  * (The reference has no bucketing; its cluster mode re-scatters every
  * query — optimizer_scatters.rs. Bucketing is the scale upgrade Spark's
  * catalog gives for free.)
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (sorted within buckets so
    * sort-merge joins also skip the per-task sort). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — plans without a
    * shuffle on either side (assert with PlanQualitySpec-style guards). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}

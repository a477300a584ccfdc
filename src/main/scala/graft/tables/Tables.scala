package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided star schema (`TESTDATA.md`) plus the
  * reference's virtual tables.
  *
  * Mirrors the reference's `Table` trait surface
  * (fusequery/query/src/datasources/table.rs:19-51) re-expressed as plain
  * DataFrame readers: Spark's DataSource V2 + Catalyst supply the scan
  * pushdown slots (`plan_scan.rs:14-22`) natively — `.explain` shows
  * `PushedFilters`/`ReadSchema` when callers filter/project.
  */
object Tables {
  val starSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one star-schema table from an sf directory. Parquet scan: column
    * pruning + predicate pushdown happen in Catalyst; do not pre-cache (at
    * 100 TB the scan must stream, not pin).
    *
    * `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark's
    * vectorized reader rejects; read it as raw nanos and rebuild the µs
    * timestamp with integer division (a plain `/` would go through double
    * and lose precision above 2^53 ns). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every star-schema table as a temp view so `spark.sql` queries
    * (EXISTS/scalar subqueries, CTEs) can reference them by name. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    starSchema.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** Reference `numbers(N)` / `numbers_mt(N)` table function
    * (datasources/system/numbers_table.rs:28-137): a virtual `number: UInt64`
    * column, 0..N, generated in parallel partitions. Spark-native mapping is
    * `spark.range` — generated per-partition with exact statistics, no I/O.
    * UInt64 → LongType (SURVEY.md §1.2; all test ranges < 2^63). */
  def numbers(spark: SparkSession, n: Long, partitions: Option[Int] = None): DataFrame = {
    val parts = partitions.getOrElse(spark.sparkContext.defaultParallelism)
    spark.range(0L, n, 1L, parts).withColumnRenamed("id", "number")
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Dev-only: fused RangeAgg kernel vs stock HashAggregate on the reference
  * micro-suite shapes (BASELINE.md). Run with -Dgraft.stock=true to measure
  * the stock path (strategy uninstalled). */
object RangeAggBench {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stock = sys.props.get("graft.stock").contains("true")
    if (!stock) graft.plans.RangeAggStrategy.install(spark)

    val n = sys.props.get("graft.n").map(_.toLong).getOrElse(10000000000L)
    val nums = Tables.numbers(spark, n, Some(cpus))
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s $s%8.3f s  ${n / s / 1e9}%8.2f B rows/s")
    }
    time("avg")(nums.agg(avg("number")))
    time("sum")(nums.agg(sum("number")))
    time("min")(nums.agg(min("number")))
    time("max")(nums.agg(max("number")))
    time("count")(nums.agg(count("number")))
    time("sum3")(nums.agg(sum(col("number") + col("number") + col("number"))))
    time("avg_minmax")(nums.agg((sum("number") / count("number")).as("a"),
      max("number"), min("number")))
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Local A/B for the primitive top-k operator vs stock TakeOrderedAndProject
  * on the BASELINE.md numbers_sort_limit shape. Not part of the driver
  * contract — dev-only. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val n = 200000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000000, 1, cpus).agg(sum("id")).collect() // warm-up

    def run(label: String): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        Tables.numbers(spark, n, Some(cpus)).orderBy(col("number").desc).limit(100)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[topkbench] $label iter$i: $dt%.3f s  (${n / dt / 1e9}%.2f B rows/s)")
      }
    }
    run("stock")
    graft.plans.TopKStrategy.install(spark)
    run("primitive")
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only: component timings for q131's quantile shapes at an sf dir —
  * which half (exact percentile vs approx sketch) carries the cost, and
  * whether the frequency pre-aggregation pays on a given value
  * distribution. Usage: runMain graft.dev.Q131Probe <sfDir> */
object Q131Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkBoot.install(
      graft.SparkBoot.builder("graft-q131-probe").getOrCreate())
    val li = graft.tables.Tables.table(spark, sfDir, "lineitem")
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q131probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("scan_only")(li.select(col("l_returnflag"), col("l_extendedprice")))
    time("sketch_only")(li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 5000)"),
        expr("approx_percentile(l_extendedprice, 0.95, 5000)")))
    time("exact_raw")(li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)"),
        expr("percentile(l_extendedprice, 0.95)")))
    time("exact_freq")(li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5, cnt)"),
        expr("percentile(l_extendedprice, 0.95, cnt)")))
    time("exact_cumsum")(graft.ops.Percentiles.exactInterpolated(li,
      "l_returnflag", "l_extendedprice", Seq("p50" -> 0.5, "p95" -> 0.95)))
    spark.stop()
  }
}

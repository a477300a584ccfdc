package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables
object TopKDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKStrategy.install(spark)
    import org.apache.spark.sql.execution.debug._
    println("=== key-only path ===")
    val df = Tables.numbers(spark, 1000L, Some(4)).orderBy(col("number").desc).limit(10)
    df.debugCodegen()
    println("=== rows path ===")
    val df2 = Tables.numbers(spark, 1000L, Some(4))
      .select(col("number"), (col("number") % 7).as("m"))
      .orderBy(col("number").desc).limit(10)
    df2.debugCodegen()
    println(df2.queryExecution.executedPlan.toString)
    df2.show(3)
    spark.stop()
  }
}

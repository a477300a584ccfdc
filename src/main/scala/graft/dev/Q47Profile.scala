package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.tables.Tables
object Q47Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](l: String)(b: => A): A = { val t0=System.nanoTime(); val r=b; println(f"[p] $l%-30s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val docs = Tables.table(spark, dir, "documents")
    docs.count()
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 16)
    val ng = docs.select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("ng"))
    def jac(df: org.apache.spark.sql.DataFrame) = df.withColumn("jaccard", round(
      size(array_intersect(col("ng1"), col("ng2"))).cast("double") /
        greatest(size(array_union(col("ng1"), col("ng2"))), lit(1)), 6))
      .select(col("d1"), col("d2"), col("hamming"), col("jaccard"))
    val vA = jac(broadcast(pairs)
      .join(ng.select(col("doc_id").as("d1"), col("ng").as("ng1")), Seq("d1"))
      .join(ng.select(col("doc_id").as("d2"), col("ng").as("ng2")), Seq("d2")))
    time("A bcast-pairs + shuffle-2nd")(vA.write.format("noop").mode("overwrite").save())
    val vB = jac(pairs
      .join(broadcast(ng.select(col("doc_id").as("d1"), col("ng").as("ng1"))), Seq("d1"))
      .join(broadcast(ng.select(col("doc_id").as("d2"), col("ng").as("ng2"))), Seq("d2")))
    time("B bcast-ng both")(vB.write.format("noop").mode("overwrite").save())
    time("A again")(vA.write.format("noop").mode("overwrite").save())
    time("B again")(vB.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

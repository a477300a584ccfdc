package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.tables.Tables

/** Dev-only: recall scan of [[Similarity.neardupPairsDeterministic]]'s
  * (planes, tables) grid against the exact all-pairs twin, per SF dir —
  * picks the q50 driver geometry. Usage: DetNearDupTune <sfDir>... */
object DetNearDupTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val emb = Tables.table(spark, dir, "embeddings")
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = emb.select(col("vec_id"), col("embedding"),
        graft.ext.Vectors.norm(col("embedding")).as("n"))
      val ex = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("sim", graft.ext.Vectors.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.n") * col("b.n")))
        .filter(col("sim") >= 0.45)
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      val exactSet = ex.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $dir exact=${exactSet.size}")
      for (p <- Seq(4, 5, 6, 8); t <- Seq(12, 20, 32)) {
        val t0 = System.nanoTime()
        val got = pairs(Similarity.neardupPairsDeterministic(emb, 0.45, planes = p, tables = t))
        val sec = (System.nanoTime() - t0) / 1e9
        val rec = if (exactSet.isEmpty) 1.0 else (got & exactSet).size.toDouble / exactSet.size
        println(f"planes=$p%2d tables=$t%2d recall=$rec%.3f found=${got.size}%4d wall=$sec%.2fs")
      }
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Dev-only: embedding near-dup LSH recall vs the exact all-pairs twin. */
object NearDupTune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import graft.ext.Vectors.{dot, norm}
    val a = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      norm(col("embedding")).as("n1"))
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      norm(col("embedding")).as("n2"))
    val exact = pairs(a.join(b, col("v1") < col("v2"))
      .withColumn("sim", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 5))
      .filter(col("sim") >= 0.45).select(col("v1"), col("v2")))
    println(s"[ndtune] exact pairs: ${exact.size}")
    val simOf = a.join(b, col("v1") < col("v2"))
      .withColumn("sim", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 5))
      .filter(col("sim") >= 0.45).select(col("v1"), col("v2"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((planes, tables, probes) <- Seq((8, 8, 16), (8, 12, 16), (8, 12, 16),
        (8, 16, 16), (7, 8, 16), (8, 12, 16))) {
      val t0 = System.nanoTime()
      val got = pairs(Similarity.embeddingNearDupPairs(emb, 0.45, planes, tables, 64, probes))
      val dt = (System.nanoTime() - t0) / 1e9
      val rec = if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
      val missed = (exact -- got).toSeq.sorted.map(p => f"$p->${simOf(p)}%.3f").mkString(",")
      println(f"[ndtune] planes=$planes tables=$tables probes=$probes recall=$rec%.3f found=${got.size} t=$dt%.1fs missed=$missed")
    }
    spark.stop()
  }
}

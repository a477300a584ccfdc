package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Dev-only grid: hyperplane-LSH recall@k vs brute force, and
  * candidates-per-query, across (planes, tables, probes) on the synthetic
  * embeddings. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val nq = q.count()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(q, emb, k = 3))

    println(s"[lshtune] corpus=${emb.count()} queries=$nq")
    for {
      (planes, tables, probes) <- Seq((6, 8, 1), (8, 8, 8), (8, 8, 16),
        (10, 8, 16), (10, 12, 16), (12, 12, 16))
    } {
      val cand = Similarity.lshCandidates(q, emb, planes, tables, 64, probes).count()
      val got = pairs(Similarity.lshTopK(q, emb, k = 3, planes, tables, 64, probes))
      val recall = (got & brute).size.toDouble / brute.size
      println(f"[lshtune] planes=$planes tables=$tables probes=$probes  " +
        f"recall=$recall%.3f  cand/q=${cand.toDouble / nq}%.1f")
    }
    spark.stop()
  }
}

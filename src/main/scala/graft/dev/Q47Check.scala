package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Prints (d1, d2, jaccard, simhash hamming, band-collides) for every exact
  * n-gram-Jaccard pair (J ≥ 0.2) of an sf dir's documents — the evidence for
  * q47's oracle argument (which J threshold survives Hamming/band blocking).
  */
object Q47Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.table(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      lit(1), n = 3, minJaccard = 0.2)
    val f = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
    val out = exact
      .join(f.select(col("doc_id").as("d1"), col("fp").as("fp1")), "d1")
      .join(f.select(col("doc_id").as("d2"), col("fp").as("fp2")), "d2")
      .withColumn("hamming", bit_count(col("fp1").bitwiseXOR(col("fp2"))))
      .withColumn("band_collide",
        (0 to 3).map(b => shiftrightunsigned(col("fp1"), b * 16).bitwiseAND(lit(0xffffL)) ===
          shiftrightunsigned(col("fp2"), b * 16).bitwiseAND(lit(0xffffL)))
          .reduce(_ || _))
      .select("d1", "d2", "jaccard", "hamming", "band_collide")
      .orderBy(desc("hamming"))
    out.collect().foreach(r => println(
      s"CHK ${r.getLong(0)} ${r.getLong(1)} j=${r.getDouble(2)} h=${r.get(3)} band=${r.getBoolean(4)}"))
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Dev-only: bucket-occupancy + candidate-volume diagnosis for
  * embeddingNearDupPairs at a given sf dir (the 100x scaling probe). */
object LshOccupancy {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val planes = Similarity.neardupPlanesFor(n)
    println(s"[occ] n=$n planes=$planes")
    val keys = emb.select(col("vec_id"),
      explode(Similarity.lshTableKeys(col("embedding"), planes, 12, 64)).as("bkt"))
    val occ = keys.groupBy("bkt").count()
    occ.agg(count(lit(1)).as("buckets"), max("count").as("max_occ"),
        avg("count").as("avg_occ"),
        sum(col("count") * (col("count") - 1) / 2).as("base_pairs"))
      .show(false)
    occ.orderBy(col("count").desc).show(10, false)
    val probe = emb.select(col("vec_id"),
      explode(Similarity.lshProbeKeys(col("embedding"), planes, 12, 64, 16)).as("bkt"))
    val cand = probe.alias("a").join(keys.alias("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
    println(s"[occ] candidate rows (pre-dedup) = ${cand.count()}")
  }
}

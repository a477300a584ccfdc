package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.tables.Tables

/** Dev-only: stage-by-stage cost of q50's embeddingNearDupPairs. */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.table(spark, sfDir, "embeddings")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ndp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val planes = 8; val tables = 8; val dim = 64; val probes = 16
    println("[ndp] corpus rows = " + emb.count())

    val a = emb.select(col("vec_id"), col("embedding"),
      graft.ext.Vectors.norm(col("embedding")).as("nrm"),
      explode(Similarity.lshProbeKeys(col("embedding"), planes, tables, dim, probes)).as("bkt"))
    val v = emb.select(col("vec_id"), col("embedding"),
      graft.ext.Vectors.norm(col("embedding")).as("nrm"),
      explode(Similarity.lshTableKeys(col("embedding"), planes, tables, dim)).as("bkt"))
    time("a-side keys count")(println("[ndp]   a rows = " + a.count()))
    time("v-side keys count")(println("[ndp]   v rows = " + v.count()))
    val joined = a.alias("a").join(v.alias("b"),
      col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
    time("join count")(println("[ndp]   pairs = " + joined.count()))
    val dedup = joined.select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
      col("a.embedding").as("e1"), col("b.embedding").as("e2"),
      col("a.nrm").as("n1"), col("b.nrm").as("n2"))
      .dropDuplicates("v1", "v2")
    time("dedup count")(println("[ndp]   uniq pairs = " + dedup.count()))
    time("full q50")(
      Similarity.embeddingNearDupPairs(emb, threshold = 0.45)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

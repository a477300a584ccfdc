package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time embedding near-dup at an sf dir under a given `planes`
  * setting (default: the [[graft.ext.Similarity.neardupPlanesFor]] rule) —
  * the PERFNOTES scaling-table harness.
  * Usage: runMain graft.dev.NearDupScale <sfDir> [planes] */
object NearDupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.tables.Tables.table(spark, sfDir, "embeddings")
    val n = emb.count()
    val planes = if (args.length > 1) args(1).toInt
      else graft.ext.Similarity.neardupPlanesFor(n)
    // warm-up (JIT + codegen) on a small slice
    graft.ext.Similarity.embeddingNearDupPairs(emb.filter(col("vec_id") < 200), 0.45)
      .write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    val out = graft.ext.Similarity.embeddingNearDupPairs(emb, 0.45, planes = planes)
    out.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val pairs = out.count()
    println(f"[ndscale] n=$n planes=$planes pairs=$pairs time=$secs%.2f s")
    // replica-block structure of the pair set (vS = source vec_id stride):
    // diagonal = within-replica (the preserved planted structure),
    // off-diagonal = cross-replica interactions of the scaled corpus
    if (args.length > 2) {
      val vS = args(2).toLong
      out.groupBy((col("v1") / vS).cast("int").as("r1"),
          (col("v2") / vS).cast("int").as("r2"))
        .agg(count(lit(1)).as("n"), round(avg(col("sim")), 3).as("avg_sim"))
        .orderBy(col("n").desc).limit(12).collect()
        .foreach(r => println(s"[ndscale-block] ${r.mkString(" ")}"))
    }
    spark.stop()
  }
}

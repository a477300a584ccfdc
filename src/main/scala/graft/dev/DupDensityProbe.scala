package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dev-only: measures the dedup family's BLOCKING SELECTIVITY and wall
  * under a given duplicate density — the round-7 verdict's "non-replicated
  * scale receipts". For each operator it reports wall, emitted pairs, and
  * the CANDIDATE pair count its blocking admits (the quadratic-risk term a
  * selectivity claim is actually about), recomputed via the same public
  * helpers the operators use. Run against ScaleGen output at dupPermille=0
  * (the old artificially-disjoint replication) and a realistic rate (e.g.
  * 20‰) to see selectivity under planted cross-replica near-dups.
  *
  * Usage: runMain graft.dev.DupDensityProbe <dir> [label] */
object DupDensityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val label = args.lift(1).getOrElse(dir)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKStrategy.install(spark)
    graft.plans.CountFromStats.install(spark)
    graft.plans.RangeAggStrategy.install(spark)

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def pairCount(keys: DataFrame): Long = {
      // distinct (a < b) meeting in >= 1 bucket — the candidate space the
      // verify stage pays for
      val a = keys.toDF("ida", "k")
      val b = keys.toDF("idb", "k")
      a.join(b, Seq("k")).filter(col("ida") < col("idb"))
        .select("ida", "idb").distinct().count()
    }

    val q = graft.queries.PipelineOps.queries
    println(f"== $label")

    val docs = graft.tables.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).transform(graft.ops.Checkpoints.truncate(_))
    val emb = graft.tables.Tables.table(spark, dir, "embeddings")
      .transform(graft.ops.Checkpoints.truncate(_))

    // q45: exact n-gram Jaccard — candidates = pairs sharing any trigram
    val (c45, _) = timed(pairCount(docs.select(col("doc_id"),
      explode(array_distinct(Dedup.wordNgramHashes(col("text"), 3))).as("k"))))
    val (r45, w45) = timed(q("q45_ngram_jaccard")(spark, dir).count())
    println(f"q45_ngram_jaccard   wall=$w45%8.2fs pairs=$r45%9d cand=$c45%12d")

    // q46: MinHash LSH — candidates = pairs sharing any band key
    val (c46, _) = timed(pairCount(docs.select(col("doc_id"),
      explode(Dedup.lshBandKeys(Dedup.minhashSignature(col("text"), 3))).as("k"))))
    val (r46, w46) = timed(q("q46_minhash_lsh")(spark, dir).count())
    println(f"q46_minhash_lsh     wall=$w46%8.2fs pairs=$r46%9d cand=$c46%12d")

    // q47: SimHash bands — candidates = pairs sharing any of the 4 bands
    val (c47, _) = timed(pairCount(
      Dedup.simhash60BandFrame(docs, col("doc_id"), col("text"))
        .select(col("doc_id"), col("bkey").as("k"))))
    val (r47, w47) = timed(q("q47_simhash")(spark, dir).count())
    println(f"q47_simhash         wall=$w47%8.2fs pairs=$r47%9d cand=$c47%12d")

    // q50 family: the PRODUCTION near-dup path (auto-scaled planes +
    // margin-directed multiprobe — the driver's fixed-geometry twin is for
    // oracle expressibility at verify scale, not 100×). Candidates = the
    // production probe ∩ base bucket join at the rule's planes.
    locally {
      import graft.ext.Similarity
      val n = emb.count()
      val planes = Similarity.neardupPlanesFor(n)
      val base = emb.select(col("vec_id"),
        explode(Similarity.lshTableKeys(col("embedding"), planes, 12, 64)).as("k"))
      val probe = emb.select(col("vec_id"),
        explode(Similarity.lshProbeKeys(col("embedding"), planes, 12, 64, 16)).as("k"))
      val (c50, _) = timed(
        probe.toDF("ida", "k").join(base.toDF("idb", "k"), Seq("k"))
          .filter(col("ida") < col("idb")).select("ida", "idb").distinct().count())
      val (r50, w50) = timed(
        Similarity.embeddingNearDupPairs(emb, threshold = 0.45).count())
      println(f"q50_embed_neardup   wall=$w50%8.2fs pairs=$r50%9d cand=$c50%12d (planes=$planes)")
    }

    // q108: incremental near-dup vs snapshot (same simhash band blocking
    // as q47 — its candidate term is q47's, halved by the novel/corpus cut)
    val (r108, w108) = timed(q("q108_incremental_neardup")(spark, dir).count())
    println(f"q108_incr_neardup   wall=$w108%8.2fs pairs=$r108%9d cand=(q47 family)")

    spark.stop()
  }
}

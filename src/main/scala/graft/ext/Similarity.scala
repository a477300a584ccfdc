package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Vectors._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  *   - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *     set against the corpus, rank by cosine per query. The corpus side
  *     streams — no shuffle of the 100 TB table, one window per query
  *     partition.
  *   - [[lshTopK]] is the scale path: random-hyperplane LSH — both sides
  *     hash to sign-pattern buckets, candidates meet in a bucket equi-join
  *     (shuffle is on bucket keys only), then exact cosine re-ranks. Recall
  *     is tuned by `planes` (bucket granularity) vs corpus density.
  *
  * Hyperplanes are generated from a fixed seed — signatures are deterministic
  * across runs and executors.
  */
object Similarity {

  /** Deterministic hyperplanes: `planes` × `dim` standard normals, seed 7. */
  private def hyperplanes(planes: Int, dim: Int): Seq[Seq[Double]] = {
    val r = new scala.util.Random(7)
    Seq.fill(planes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id of a vector (long bitmask over `planes`). */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    val hs = hyperplanes(planes, dim)
    hs.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries` must be small enough to broadcast. Self-matches excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms are hoisted to the row side of each input — the join computes
    // ONE dot product per pair, not three (dot + both norms).
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("sim",
        round(dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("sim"), col("rnk").cast("long").as("rnk"))
  }

  /** LSH-bucketed ANN top-k: candidates are corpus vectors in the same
    * sign-pattern bucket as the query; exact cosine re-ranks within bucket.
    * Fewer planes → bigger buckets → higher recall, more compute. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"),
      lshBucket(col("embedding"), planes, dim).as("bkt"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"),
      lshBucket(col("embedding"), planes, dim).as("bkt"))
    val scored = c.join(broadcast(q), Seq("bkt"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim",
        round(dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 5))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("c_id"), col("sim"), col("rnk").cast("long").as("rnk"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, LSH-blocked
    * (pairs must share a bucket), exact-cosine verified. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
      planes: Int = 4, dim: Int = 64): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      lshBucket(col("embedding"), planes, dim).as("bkt"))
    v.alias("a").join(v.alias("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        round(dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 5))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"), col("sim"))
  }
}

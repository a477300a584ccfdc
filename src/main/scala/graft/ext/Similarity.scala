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

  /** IVF (inverted-file) ANN top-k: the corpus is partitioned into `nlist`
    * cells by nearest centroid; each query probes its `nprobe` closest cells
    * and exact cosine re-ranks only those cells' vectors.
    *
    * Centroids are the `nlist` lowest-id corpus vectors, L2-normalized —
    * deterministic, no iterative k-means (the IVF *plumbing* — cell
    * assignment, multi-probe, in-cell re-rank — is the part that must scale;
    * centroid quality only moves recall). The centroid table is tiny and
    * rides along as literals inside codegen'd dot products: assignment is a
    * pure map over the corpus (no shuffle), and the only shuffle is the
    * bucket equi-join on cell ids — same shape as [[lshTopK]].
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents: Array[Seq[Double]] = corpus
      .orderBy(col("vec_id")).limit(nlist)
      .select(toDouble(col("embedding"))).collect()
      .map { r =>
        val v = r.getSeq[Double](0)
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => if (n == 0) 0.0 else x / n)
      }

    def cellScores(vec: Column): Column =
      array(cents.toIndexedSeq.map(c => dot(vec, typedlit(c))): _*)

    // nearest cell = argmax of centroid dots (array_position is 1-based)
    def nearestCell(vec: Column): Column = {
      val ds = cellScores(vec)
      (array_position(ds, array_max(ds)) - 1).cast("int")
    }

    // top-nprobe cells: sort (score, idx) structs ascending, take the tail
    def probeCells(vec: Column): Column = {
      val scored = zip_with(cellScores(vec),
        sequence(lit(0), lit(cents.length - 1)),
        (s, i) => struct(s.as("s"), i.as("i")))
      transform(slice(reverse(array_sort(scored)), 1, nprobe), e => e("i").cast("int"))
    }

    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"), nearestCell(col("embedding")).as("cell"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"),
      explode(probeCells(col("embedding"))).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
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

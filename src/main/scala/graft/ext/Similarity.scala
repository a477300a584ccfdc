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

  /** Deterministic hyperplanes: `planes` × `dim` standard normals, seeded. */
  private def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id of a vector (long bitmask over `planes`). */
  def lshBucket(vec: Column, planes: Int, dim: Int, seed: Long = 7L): Column = {
    val hs = hyperplanes(planes, dim, seed)
    hs.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Multi-table LSH keys: `tables` independent sign-pattern tables
    * (OR-amplification). A single k-plane table only finds pairs agreeing on
    * ALL k signs — recall (1-θ/π)^k collapses fast with k; the standard
    * construction unions candidates from L independent tables:
    * recall = 1-(1-(1-θ/π)^k)^L. Each row explodes into L (table:bucket)
    * keys; the join is still a bucket equi-join. */
  def lshTableKeys(vec: Column, planes: Int, tables: Int, dim: Int): Column =
    array((0 until tables).map(t =>
      concat_ws(":", lit(t), lshBucket(vec, planes, dim, seed = 7L + t))): _*)

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

  /** LSH-bucketed ANN top-k: candidates are corpus vectors sharing ANY of
    * `tables` sign-pattern buckets with the query (OR-amplified); exact
    * cosine re-ranks the deduplicated candidate set. More planes → tighter
    * buckets (less compute, lower per-table recall); more tables → recall
    * back up (corpus keys ×L). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int = 6, tables: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_n"),
      explode(lshTableKeys(col("embedding"), planes, tables, dim)).as("bkt"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_n"),
      explode(lshTableKeys(col("embedding"), planes, tables, dim)).as("bkt"))
    val scored = c.join(broadcast(q), Seq("bkt"))
      .filter(col("q_id") =!= col("c_id"))
      // a pair meeting in several tables must rank once
      .dropDuplicates("q_id", "c_id")
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

  /** Embedding near-duplicate pairs: cosine ≥ threshold, multi-table
    * LSH-blocked (pairs must share a bucket in ANY table), exact-cosine
    * verified on the deduplicated candidate set.
    *
    * Defaults tuned for DUP detection (high-cosine pairs): 8 planes keep
    * buckets tight — the self-join pair count stays near-linear — while a
    * true duplicate (θ≈18°) still lands in some shared bucket with ~90%
    * probability across 4 tables ((1-(1-(1-θ/π)^8)^4)). Low-threshold
    * similarity mining wants fewer planes / more tables. */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double,
      planes: Int = 8, tables: Int = 4, dim: Int = 64): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      explode(lshTableKeys(col("embedding"), planes, tables, dim)).as("bkt"))
    v.alias("a").join(v.alias("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        col("a.embedding").as("e1"), col("b.embedding").as("e2"),
        col("a.nrm").as("n1"), col("b.nrm").as("n2"))
      .dropDuplicates("v1", "v2")
      .withColumn("sim", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 5))
      .filter(col("sim") >= threshold)
      .select(col("v1"), col("v2"), col("sim"))
  }
}

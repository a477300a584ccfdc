package graft.dev

import org.apache.spark.sql.functions._

import graft.SparkBoot
import graft.ext.{Dedup, RecallFloors}

/** Gate-side, corpus-coupled half of the recall-floor audit (the
  * RecallFloorSpec pins the geometry half).
  *
  * History note (round 10): the first version of this audit asserted the
  * q46 gray-zone precondition (no exact pairs with 0.2 ≤ J < 8/9) because
  * q46's oracle was the EXACT q45 answer over probabilistic banding — and
  * on its very first organic-sf1 run it CAUGHT a violation: an organic
  * pair at J = 0.214 whose all-bands miss odds were 47%, i.e. a literal
  * per-corpus-draw coin flip in the graded suite. The structural fix was
  * to switch q46 to the deterministic md5-MinHash whose oracle restates
  * the banding itself (no flake possible at any recall); this audit now
  * measures what remains worth measuring per corpus:
  *
  *   - ACTUAL recall of the graded deterministic banding vs the exact
  *     inventory (deterministic per corpus — a measurement, not a coin
  *     flip), with a hard 0.995 floor: banding that silently degrades on
  *     a corpus drift fails HERE with the missed pairs printed;
  *   - the gray-zone inventory + summed analytic miss odds of the
  *     16×2 geometry (informational: it quantifies how much the old
  *     exact-answer oracle would have flaked on this corpus).
  *
  * Usage: `runMain graft.dev.RecallAudit <corpusDir>` — exits nonzero when
  * measured recall < 0.995. Standing stage in dev/gate.sh (sf0.01 always;
  * the organic corpus under GATE_SF1). */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkBoot.install(
      SparkBoot.builder("graft-recall-audit").getOrCreate())
    try {
      val docs = graft.tables.Tables.table(spark, dir, "documents")
      // the exact q45 inventory (inverted-index join — the pair set is
      // near-dup-sized, thousands at sf1, so the collect is bounded)
      val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          lit(1), n = 3, minJaccard = 0.2)
        .select(col("d1"), col("d2"), col("jaccard")).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val got = Dedup.minhashLshPairsDeterministic(docs, col("doc_id"),
          col("text"), n = 3, minJaccard = 0.2)
        .select(col("d1"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) 1.0
        else exact.keySet.count(got.contains).toDouble / exact.size
      val gray = exact.filter(_._2 < Dedup.PlantedWorstJaccard - 1e-9)
      val missSum = exact.valuesIterator.map(j =>
        RecallFloors.minhashBandMiss(j, Dedup.LshBands, Dedup.LshBandRows)).sum
      println(f"[recall-audit] corpus=$dir exactPairs=${exact.size} " +
        f"q46Recall=$recall%.4f gray=${gray.size} " +
        f"oldOracleFlakeOdds=$missSum%.3e")
      (exact.keySet -- got).toSeq.sorted.take(20).foreach { case (d1, d2) =>
        println(f"[recall-audit] missed pair ($d1,$d2) J=${exact((d1, d2))}%.6f")
      }
      if (recall < 0.995) {
        System.err.println(f"[recall-audit] FAIL: q46 deterministic banding " +
          f"recall $recall%.4f < 0.995 on $dir")
        sys.exit(2)
      }

      // Stage 2 (round 11): the SEEDED production kernel. q46/q291/q292
      // grade deterministic twins whose oracles restate the banding;
      // embeddingNearDupPairs — the actual production entry point, seeded
      // float hyperplanes + margin-directed multiprobe — had analytic
      // floors (RecallFloorSpec) but no per-corpus MEASURED recall. Exact
      // cosine verification makes its precision structural (every emitted
      // pair is checked against the threshold), so recall is the only free
      // variable: measure it against the exact all-pairs inventory, hard
      // floor 0.99. The all-pairs join is audit-side dev code — one
      // broadcastable side of n·dim floats, pair set near-dup-sized, so
      // both collects are bounded.
      import graft.ext.{Similarity, Vectors}
      val emb = graft.tables.Tables.table(spark, dir, "embeddings")
      val a = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        Vectors.norm(col("embedding")).as("n1"))
      val b = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        Vectors.norm(col("embedding")).as("n2"))
      val exactEmb = a.join(b, col("v1") < col("v2"))
        .withColumn("sim",
          round(Vectors.dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 5))
        .filter(col("sim") >= 0.45)
        .select(col("v1"), col("v2"), col("sim")).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val gotEmb = Similarity.embeddingNearDupPairs(emb, threshold = 0.45)
        .select(col("v1"), col("v2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recallEmb =
        if (exactEmb.isEmpty) 1.0
        else exactEmb.keySet.count(gotEmb.contains).toDouble / exactEmb.size
      println(f"[recall-audit] seeded-kernel exactPairs=${exactEmb.size} " +
        f"prodRecall=$recallEmb%.4f")
      (exactEmb.keySet -- gotEmb).toSeq.sorted.take(20).foreach { case (v1, v2) =>
        println(f"[recall-audit] seeded-kernel missed ($v1,$v2) " +
          f"sim=${exactEmb((v1, v2))}%.5f")
      }
      if (recallEmb < 0.99) {
        System.err.println(f"[recall-audit] FAIL: seeded production kernel " +
          f"recall $recallEmb%.4f < 0.99 on $dir")
        sys.exit(2)
      }
      println("[recall-audit] PASS")
    } finally spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.functions._

import graft.SparkBoot
import graft.ext.{Dedup, RecallFloors}

/** Gate-side, corpus-coupled half of the recall-floor audit (the
  * RecallFloorSpec pins the geometry half): q46's oracle is the EXACT
  * inverted-index answer while its engine blocking is MinHash banding, so
  * the gate's flake odds on a given corpus are the summed all-bands miss
  * probabilities over that corpus's ACTUAL exact pair inventory. Both
  * testdata generators plant dups at J ≥ 8/9 (structural at 16×2:
  * 1.4e-11 per pair) and draw unrelated docs far below the 0.2 threshold,
  * so the sum is ~1e-8 even at organic sf1's ~2.5k pairs — but nothing
  * enforced that corpus contract until this audit: a generator change that
  * grows gray-zone pairs (0.2 ≤ J < 8/9, where a J = 0.25 pair misses with
  * p ≈ 0.35) now fails HERE, with the offending pairs printed, instead of
  * resurfacing as a once-per-N-runs q46 hash mismatch.
  *
  * Usage: `runMain graft.dev.RecallAudit <corpusDir>` — exits nonzero when
  * the summed miss odds reach 1e-6. Wired as a standing stage in
  * dev/gate.sh (sf0.01 always; the organic corpus under GATE_SF1).
  */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkBoot.install(
      SparkBoot.builder("graft-recall-audit").getOrCreate())
    try {
      val docs = graft.tables.Tables.table(spark, dir, "documents")
      // the exact q45 inventory (inverted-index join — the pair set is
      // near-dup-sized, thousands at sf1, so the collect is bounded)
      val js = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          lit(1), n = 3, minJaccard = 0.2)
        .select(col("d1"), col("d2"), col("jaccard")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val miss = js.map { case (_, _, j) =>
        RecallFloors.minhashBandMiss(j, Dedup.LshBands, Dedup.LshBandRows) }.sum
      val gray = js.filter(_._3 < Dedup.PlantedWorstJaccard - 1e-9)
      println(f"[recall-audit] corpus=$dir pairs=${js.length} " +
        f"gray=${gray.length} missSum=$miss%.3e")
      gray.sortBy(_._3).take(20).foreach { case (d1, d2, j) =>
        println(f"[recall-audit] gray pair ($d1,$d2) J=$j%.6f " +
          f"miss=${RecallFloors.minhashBandMiss(j, Dedup.LshBands, Dedup.LshBandRows)}%.3e")
      }
      if (miss >= 1e-6) {
        System.err.println(f"[recall-audit] FAIL: summed q46 miss odds " +
          f"$miss%.3e >= 1e-6 on $dir — corpus violates the gray-zone " +
          "precondition (see Dedup.PlantedWorstJaccard)")
        sys.exit(2)
      }
      println("[recall-audit] PASS")
    } finally spark.stop()
  }
}

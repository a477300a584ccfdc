package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summary as a mergeable Spark `Aggregator` —
  * the sketch half of the two-pass exact-heavy-hitter pattern (find a
  * guaranteed-superset candidate set with O(k) state, then rescan counting
  * ONLY the candidates).
  *
  * Contract (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — public-knowledge constructions): after
  * summarizing a stream of n items, every stored count undercounts its item
  * by at most n/(k+1), and — the property the pipeline relies on — EVERY
  * item with true frequency > n/(k+1) is present in the summary. So with
  * k ≥ ⌈1/φ⌉ the summary provably contains every φ-heavy hitter, under any
  * partitioning and any merge order (the candidate SET beyond the true
  * heavy hitters may vary with order; the exact rescan + threshold filter
  * makes the final answer deterministic).
  *
  * Why not `q60`'s exact vocabulary count: that shuffles a vocabulary-sized
  * aggregation. Here the shuffle carries one ≤k-entry summary per partition
  * (map-side partial → merge), and the second pass aggregates only
  * candidate-key rows — at 100 TB the state is k entries, not |vocab|.
  *
  * This is the batch/mergeable counterpart of `approx_count_distinct`'s HLL:
  * fixed-size partials, associative merge, serialized between partial and
  * final exactly like the reference's aggregate-state protocol
  * (aggregate_function.rs:18-56 serialize/deserialize/merge).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(k >= 1, "k must be >= 1")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    if (a == null) return b // null carries no frequency; a null key would NPE finish's sort
    b.get(a) match {
      case Some(c) => b(a) = c + 1L
      case None if b.size < k => b(a) = 1L
      case None =>
        // classic decrement-all step: k counters drop by one, zeros evict.
        // Iterate a SNAPSHOT — mutating a mutable.HashMap while traversing
        // it is undefined and silently skips entries (caught by the
        // PropertiesSpec size-bound law).
        b.toArray.foreach { case (key, c) =>
          if (c <= 1L) b.remove(key) else b(key) = c - 1L
        }
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1(key) = b1.getOrElse(key, 0L) + c }
    if (b1.size > k) {
      // Agarwal et al. §3.1: subtract the (k+1)-th largest count from all,
      // drop non-positives — error bounds add, so the merged summary keeps
      // the n/(k+1) undercount guarantee over the COMBINED stream.
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      // snapshot before mutating — see the reduce-side comment
      b1.toArray.foreach { case (key, c) =>
        if (c - cut <= 0L) b1.remove(key) else b1(key) = c - cut
      }
    }
    b1
  }

  /** Candidate items only, sorted for a deterministic column value given a
    * fixed summary; estimated counts are internal (the exact rescan
    * recomputes true counts, so publishing estimates would only invite
    * misuse). */
  override def finish(r: mutable.HashMap[String, Long]): Seq[String] =
    r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  /** Column form: `mgCandidates(k)(col)` aggregates to array<string>. */
  def candidates(k: Int): Column => Column = {
    val f = udaf(new MisraGriesAggregator(k))
    (c: Column) => f(c)
  }
}

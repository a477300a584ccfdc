package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation. The motivating use is domain
  * authority (Page et al. 1999 — the public construction): crawl-curation
  * pipelines rank domains by link/overlap structure and weight or gate the
  * mixture by that rank (the CommonCrawl domain-ranking pattern).
  *
  * PageRank here is INTEGER-SCALED (rank mass in units of 1e-12, damping
  * 85/100 as exact integer division): every iteration is integer
  * arithmetic with floor division, so ranks — and the orderings they
  * induce — are bit-identical across engines and partitionings, and the
  * DuckDB oracle replays the iteration chain verbatim. Floor division
  * leaks a few units of mass per node per round; for ranking (the use
  * case) that bias is identical on both engines and irrelevant.
  *
  * Scale shape, per iteration: one join of the rank table onto the edge
  * list keyed by source node, one sum keyed by target — both two-phase
  * with map-side combine; the rank table is node-sized (broadcast when
  * domains fit, shuffle-join otherwise). The driver holds nothing —
  * iterations chain DataFrames (bounded depth). */
object GraphOps {

  val Scale = 1000000000000L // 1e12: integer rank mass

  /** Weighted symmetric edge list from pairwise overlap counts
    * (e.g. [[Dedup]] gram overlap): (src, dst, w) with both directions. */
  def symmetricEdges(pairs: DataFrame, a: Column, b: Column, w: Column): DataFrame =
    pairs.select(a.as("src"), b.as("dst"), w.as("w"))
      .unionByName(pairs.select(b.as("src"), a.as("dst"), w.as("w")))

  /** Integer-scaled weighted PageRank. `edges` = (src, dst, w) directed
    * (use [[symmetricEdges]] for undirected graphs). The node set is the
    * edge endpoints — an isolated node has no edge row and drops out;
    * union zero-weight self-loops in if it must appear.
    *
    * DANGLING nodes (no out-edges — sinks of a directed web) do not leak
    * their mass: each round sums the rank held by sinks (a one-row
    * broadcast aggregate) and redistributes `dangling div n` to every
    * node inside the damping term — the standard full formulation, still
    * exact integer arithmetic. On symmetric edge lists every node has
    * out-edges, the dangling sum is ZERO, and the iteration is
    * bit-identical to the simplified form (q156's oracle replays it
    * unchanged). Σrank stays within the floor-division residue of
    * [[Scale]] — property-pinned in ExtSpec on a sink-heavy digraph.
    *
    * Each round's rank table localCheckpoints: 20 chained
    * join+aggregate+crossjoin rounds otherwise stack into one plan whose
    * analysis cost grows quadratically (the q95 connected-components
    * lesson applied at the iteration cap). Returns (node, rank). */
  /** HITS hubs & authorities (Kleinberg 1999) — the complement of
    * [[pageRank]] for BIPARTITE-flavored curation graphs (users ↔ content
    * types, crawl hosts ↔ resources): a good hub points at good
    * authorities and vice versa. Kleinberg's update order, integer-scaled:
    * each round a(d) = Σ_(s,d,w) w·h(s) then h(s) = Σ w·a(d), each vector
    * sum-normalized to |side|·10⁶ by floor division (the Bradley-Terry
    * normalization — HITS' L2 norm needs a square root; sum-normalization
    * preserves the induced ranking, which is the operator's product, and
    * keeps every round cross-engine exact). Products accumulate in
    * DECIMAL(38,0) (w·h reaches edge-weight·|side|·10⁶ — past Long on a
    * heavy graph by construction). Zero/negative-weight edges are dropped
    * (they'd contribute nothing / invert the mutual-reinforcement).
    * Returns (node, role ∈ hub|authority, score_ppm), node cast to string
    * (the two sides may carry different key types).
    *
    * Scale shape per round: two edge-keyed join+aggregates (map-side
    * combine) and two one-row normalization broadcasts; score tables are
    * node-sized and localCheckpoint per round (the q95/pageRank lineage
    * rule). */
  /** Synchronous label-propagation community detection (Raghavan, Albert
    * & Kumara 2007), determinized for a distributed engine: labels seed
    * as node ids; each round EVERY node simultaneously adopts the label
    * carrying the largest incident edge weight among its neighbors, ties
    * to the smallest label. The paper's asynchronous sweep is visit-order-
    * dependent — exactly what a partitioned execution must not be — so
    * this is the synchronous variant with a FIXED `iters` bound as part
    * of the operator contract (synchronous LPA can 2-cycle on bipartite
    * regions; a convergence test would hang there, a fixed bound is
    * deterministic and the oracle unrolls exactly that many rounds).
    * A node with no incoming labels in a round keeps its previous label.
    * Returns (node, label): nodes sharing a label are one community.
    *
    * Scale shape per round: one label-to-edge join keyed by src, one
    * (dst, label) weight sum (map-side combined), one per-dst argmax
    * window; the label table is node-sized and localCheckpoints per
    * round (the q95/pageRank lineage rule). */
  def labelPropagation(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, "labelPropagation: iters must be >= 1")
    // the edge list is read EVERY round: checkpoint it once, or an
    // expensive upstream construction (a gram-overlap self-join) re-runs
    // per round (measured 11 s -> the checkpointed form at sf0.1 on the
    // q280 graph; the same one-evaluation rule as the per-round label
    // checkpoint below)
    val e = edges.filter(col("w") > 0)
      .select(col("src"), col("dst"), col("w")).transform(graft.ops.Checkpoints.truncate(_))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var lab = nodes.withColumn("label", col("node")).transform(graft.ops.Checkpoints.truncate(_))
    (1 to iters).foreach { _ =>
      // per-dst argmax as a struct-MIN aggregation (round 13): min over
      // (-wsum, label) is lexicographic and deterministic — largest wsum,
      // ties to the smallest label, exactly the old row_number window's
      // (wsum DESC, label ASC) pick — but it rides the same two-phase
      // hash aggregation as the wsum rollup instead of adding a per-round
      // Exchange + Sort + Window over the (dst, label) frame (max_by is
      // NOT used: its tie-break is undefined, this must stay bit-exact)
      val next = e.join(lab.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"), col("label"))
        .agg(sum(col("w")).as("wsum"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("wsum")).as("nw"), col("label").as("l"))).as("m"))
        .select(col("dst").as("node"), col("m.l").as("nl"))
      lab = lab.join(next, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("label")).as("label"))
        .transform(graft.ops.Checkpoints.truncate(_))
    }
    lab
  }

  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters in [1, 10]")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("w") > 0).transform(graft.ops.Checkpoints.truncate(_))
    val hubs = e.select(col("src")).distinct().transform(graft.ops.Checkpoints.truncate(_))
    val auths = e.select(col("dst")).distinct().transform(graft.ops.Checkpoints.truncate(_))
    val nH = hubs.count() // node-sized scalars (the pageRank n discipline)
    val nA = auths.count()
    var h = hubs.withColumn("h", lit(1000000L))
    var a: DataFrame = auths.withColumn("a", lit(1000000L))
    for (_ <- 1 to iters) {
      val ar = e.join(h, "src")
        .groupBy(col("dst"))
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * h")).as("raw"))
      val at = ar.agg(sum(col("raw")).as("t"))
      a = ar.crossJoin(broadcast(at))
        .select(col("dst"),
          expr(s"CAST((raw * $nA * 1000000) DIV t AS BIGINT)").as("a"))
        .transform(graft.ops.Checkpoints.truncate(_))
      val hr = e.join(a, "dst")
        .groupBy(col("src"))
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * a")).as("raw"))
      val ht = hr.agg(sum(col("raw")).as("t"))
      h = hr.crossJoin(broadcast(ht))
        .select(col("src"),
          expr(s"CAST((raw * $nH * 1000000) DIV t AS BIGINT)").as("h"))
        .transform(graft.ops.Checkpoints.truncate(_))
    }
    h.select(col("src").cast("string").as("node"), lit("hub").as("role"),
        col("h").as("score_ppm"))
      .unionByName(a.select(col("dst").cast("string").as("node"),
        lit("authority").as("role"), col("a").as("score_ppm")))
  }

  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters in [1, 20]")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0, 100]")
    // the edge list feeds out-weights AND every iteration's join — left
    // lazy, an expensive edge derivation (e.g. the gram-overlap self-join)
    // replays once per round; materialize it once (lineage truncated)
    val e = edges.transform(graft.ops.Checkpoints.truncate(_))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().transform(graft.ops.Checkpoints.truncate(_))
    // ow > 0: a node whose out-edges all weigh zero (e.g. the documented
    // zero-weight self-loop that pins an isolated node into the node set)
    // has nothing to distribute — it must count as DANGLING, not divide by
    // zero in the contrib term (ANSI mode throws) while being excluded
    // from the dangling sum (mass would silently drain)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .filter(col("ow") > 0)
      .transform(graft.ops.Checkpoints.truncate(_))
    val n = nodes.count() // node count: one bounded scalar, needed in literals
    var rank = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(outW, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          // exact identity for nonnegative integers that avoids the raw
          // rank·w product (rank ≤ 1e12 — a large edge weight would wrap
          // Long silently in non-ANSI mode):
          // (rank·w) div ow = (rank div ow)·w + ((rank mod ow)·w) div ow
          expr("(rank div ow) * w + ((rank % ow) * w) div ow").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      // mass held by sinks this round: one row, broadcast back under the
      // cross join (a 1-row BroadcastNestedLoopJoin, not a data shuffle)
      val dangling = rank
        .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(Scale * (100 - dampingPct) / 100 / n) +
            expr(s"($dampingPct * (coalesce(contrib, 0L) + (__dang div $n))) div 100"))
            .as("rank"))
        .transform(graft.ops.Checkpoints.truncate(_))
    }
    rank
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Deduplication operators for training-data pipelines, each in its scalable
  * (explode → shuffle-on-key → join) formulation:
  *
  *   - exact: hash-groupBy over all columns / a key;
  *   - n-gram Jaccard: exact set similarity via an inverted-index join
  *     (never materializes the quadratic pair space — only docs sharing an
  *     n-gram meet, grouped within a blocking key);
  *   - MinHash + LSH: signature → band buckets → bucket join → candidate
  *     pairs verified with exact Jaccard;
  *   - SimHash: 64-bit fingerprint (custom Catalyst expression), 4×16-bit
  *     band blocking, Hamming-distance verification;
  *   - embedding cosine: random-hyperplane LSH buckets → in-bucket exact
  *     cosine (see [[Similarity]]).
  *
  * All deterministic: hash functions are seeded, no sampling.
  */
object Dedup {

  // ---------- exact ------------------------------------------------------

  /** Summary of full-row duplicate groups (count of groups and surplus rows).
    * One hash aggregation over all columns — the 100 TB formulation of
    * `SELECT ... GROUP BY * HAVING count(*) > 1`. */
  def duplicateRowSummary(df: DataFrame): DataFrame = {
    val dups = df.groupBy(df.columns.toIndexedSeq.map(col): _*).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    dups.agg(
      count(lit(1)).as("n_dup_groups"),
      coalesce(sum(col("c")), lit(0L)).cast("long").as("n_dup_rows"),
      coalesce(sum(col("c") - 1), lit(0L)).cast("long").as("n_removable"))
  }

  /** Exact dedup keeping one arbitrary-but-deterministic representative per
    * duplicate group (the min by `keep`). */
  def exactDedup(df: DataFrame, keys: Seq[Column], keep: Column): DataFrame =
    graft.ops.Relational.dedupFirst(df, keys, keep)

  /** Incremental dedup: rows of `incoming` that are novel against an
    * existing `corpus` snapshot AND within the incoming batch itself, both
    * judged by `fingerprint` (within-batch ties keep the min `keep`).
    *
    * The daily-ingest shape of a training-data pipeline: the corpus side
    * reduces to its distinct fingerprint set (in production, a pre-built
    * bucketed fingerprint table — see `tables/Bucketing` — so the anti-join
    * co-locates without shuffling the snapshot), and the incoming batch
    * pays one shuffle on the fingerprint key shared by its self-dedup and
    * the anti-join. */
  def novelAgainst(corpus: DataFrame, incoming: DataFrame,
      fingerprint: Column, keep: Column): DataFrame = {
    val fp = fingerprint.as("fp")
    val seen = corpus.select(fp).distinct()
    val batch = exactDedup(incoming.withColumn("fp", fingerprint), Seq(col("fp")), keep)
    batch.join(seen, Seq("fp"), "left_anti").drop("fp")
  }

  /** Build (or refresh) the production shape of [[novelAgainst]]'s corpus
    * side: the distinct fingerprint set as a bucketed, bucket-sorted catalog
    * table. The shuffle over the (100 TB) corpus is paid ONCE here; every
    * subsequent ingest anti-joins against the snapshot with zero Exchange on
    * the snapshot side ([[novelAgainstSnapshot]]). */
  def snapshotFingerprints(corpus: DataFrame, fingerprint: Column,
      table: String, buckets: Int): Unit =
    graft.tables.Bucketing.writeBucketed(
      corpus.select(fingerprint.as("fp")).distinct(), table, buckets, Seq("fp"))

  /** Incremental dedup against a pre-built bucketed fingerprint snapshot
    * (see [[snapshotFingerprints]]): the anti-join consumes the snapshot in
    * its bucket layout — no shuffle and no sort on the snapshot side, only
    * the (daily-sized) incoming batch repartitions to the bucket count.
    * ScaleOpsSpec asserts the shuffle-free snapshot subtree. */
  def novelAgainstSnapshot(spark: org.apache.spark.sql.SparkSession, snapshotTable: String,
      incoming: DataFrame, fingerprint: Column, keep: Column): DataFrame = {
    val seen = spark.table(snapshotTable)
    val batch = exactDedup(incoming.withColumn("fp", fingerprint), Seq(col("fp")), keep)
    batch.join(seen, Seq("fp"), "left_anti").drop("fp")
  }

  /** Quality-aware representative per duplicate cluster — the keep rule a
    * curation pipeline actually wants: within each near-dup component keep
    * the BEST document (max `score`, ties to the lowest id), not the
    * arbitrary lowest-id one. `comp` is a [[connectedComponents]] /
    * [[connectedComponentsStar]] output (node, comp); the argmax is one
    * struct-max aggregation (no window sort), and the component table is
    * pair-bounded, so joining it back to the corpus broadcasts. Exact
    * integer scores (n_chars, an integer quality margin, a token count)
    * keep the pick — and the oracle — deterministic cross-engine. */
  def clusterRepresentatives(comp: DataFrame, docs: DataFrame,
      id: Column, score: Column): DataFrame =
    docs.select(id.as("node"), score.as("__s"))
      .join(comp, "node")
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("node")).as("checksum"),
        max(struct(col("__s").as("s"), (-col("node")).as("negid"))).as("__m"))
      .select(col("comp"), (-col("__m").getField("negid")).as("rep_doc"),
        col("n_docs"), col("checksum"))

  /** Connected components of a near-dup pair graph — the step that turns
    * pairwise matches (from [[ngramJaccardPairs]], [[minhashLshPairs]],
    * [[simhashPairs]], or [[Similarity.embeddingNearDupPairs]]) into dedup
    * GROUPS, so "keep one doc per duplicate cluster" is well-defined even
    * when similarity is not transitive (A≈B, B≈C, A̸≈C must still collapse
    * to one kept doc).
    *
    * Bounded-round minimum-label propagation: every node starts labeled
    * with itself; each round takes the min label over the neighborhood;
    * stop when no label changes. Rounds = graph diameter — near-dup
    * clusters are near-cliques, so 2–4 in practice; each round is one
    * shuffle keyed by node id plus one O(1)-row convergence count (the
    * standard Spark iterative-algorithm shape). For adversarially long
    * chains at extreme scale, swap in the large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce") — same join
    * primitive, O(log²) rounds. Deterministic: component id = min doc id
    * in the component.
    *
    * Returns (node, comp). */
  def connectedComponents(pairs: DataFrame, d1: String = "d1", d2: String = "d2",
      maxIter: Int = 20): DataFrame = {
    // labels are referenced several times per round (neighbor-min join,
    // convergence probe, next round) — persist() caches data but the logical
    // plan still nests geometrically, which OOMs the driver on deep chains
    // long before maxIter trips. localCheckpoint (eager) truncates lineage
    // each round; swap in a reliable checkpoint dir when executor loss is in
    // play at cluster scale.
    val edges = pairs.select(col(d1).as("a"), col(d2).as("b"))
      .union(pairs.select(col(d2).as("a"), col(d1).as("b")))
      .distinct().persist()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node")).transform(graft.ops.Checkpoints.truncate(_))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("b") === labels("node"))
        .groupBy(col("a")).agg(min(col("comp")).as("nbr_min"))
      // The change flag rides the SAME projection the round materializes:
      // the old spelling re-joined next against labels per round purely to
      // detect changes — one whole join job per round deleted (guide §2.4);
      // the probe below is a limit-1 filter over the already-checkpointed
      // partitions, and isEmpty stops at the first changed row.
      val newComp = least(col("comp"), coalesce(col("nbr_min"), col("comp")))
      val stepped = labels.join(nbrMin, labels("node") === nbrMin("a"), "left")
        .select(col("node"), newComp.as("comp"),
          (newComp =!= col("comp")).as("__chg"))
        .transform(graft.ops.Checkpoints.truncate(_))
      val anyChanged = !stepped.filter(col("__chg")).isEmpty
      labels.unpersist()
      labels = stepped.select(col("node"), col("comp"))
      converged = !anyChanged
      i += 1
    }
    edges.unpersist()
    // A silent early stop would return UNMERGED components — plausible
    // output, wrong dedup groups. Diameter > maxIter must fail loudly.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: not converged after $maxIter rounds — the pair " +
        "graph has longer chains than expected; raise maxIter or switch to " +
        "the large-star/small-star formulation for this input")
    labels
  }

  /** Connected components by alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    * extreme-scale variant [[connectedComponents]]'s doc points at: rounds
    * are O(log²) in component size instead of O(diameter), so ADVERSARIALLY
    * LONG CHAINS (page-link graphs, citation chains) converge in ~log rounds
    * where min-label propagation walks the whole path one hop per round.
    *
    *   - large-star: every node connects its strictly-larger neighbors to
    *     the minimum of its closed neighborhood;
    *   - small-star: every node connects its smaller-or-equal neighbors
    *     (and itself) to that minimum.
    *
    * Each phase is one shuffle keyed by node id (the same join primitive as
    * the propagation variant); the edge set provably converges to a star
    * forest whose centers are the component minima. Deterministic: component
    * id = min node id. Returns (node, comp) for every node in a pair.
    * Output equals [[connectedComponents]] wherever both converge
    * (ExtSpec asserts it on the real near-dup graph). */
  def connectedComponentsStar(pairs: DataFrame, d1: String = "d1", d2: String = "d2",
      maxIter: Int = 30): DataFrame = {
    // Each round references the previous edge set several times (both
    // neighborhood orientations, two star phases, the fixpoint probe), so
    // lineage grows geometrically — persist() caches data but Catalyst still
    // re-analyzes the full logical tree. localCheckpoint (eager) truncates
    // the plan each round; at cluster scale with executor loss in play,
    // switch to a reliable checkpoint dir — same one-line seam.
    var edges = pairs
      .select(col(d1).as("a"), col(d2).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct().transform(graft.ops.Checkpoints.truncate(_))
    val allNodes = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct().persist()
    var converged = false
    var i = 0
    // carry |edges| across rounds: this round's |next| IS next round's
    // |edges| (both checkpointed distinct sets), so the fixpoint probe pays
    // one count + one except per round instead of two counts + one except —
    // on adversarial chains (q111: ~O(log) rounds over a diameter-196
    // graph) that is one whole job per round removed
    var edgeCount = edges.count()
    while (!converged && i < maxIter) {
      // large-star: m(u) = min(Γ(u) ∪ {u}); emit (m, v) for v ∈ Γ(u), v > u.
      // m ≤ u < v, so the emitted edge is already canonical and loop-free.
      val nbr = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = nbr.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = nbr.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
      // small-star on the larger→smaller orientation: u's smaller neighbors
      // (and u itself) all connect to m(u) = the smallest of them.
      val dir = large.select(col("b").as("u"), col("a").as("v"))
      val smins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = dir.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(smins.select(col("m").as("a"), col("u").as("b")))
        .distinct().transform(graft.ops.Checkpoints.truncate(_))
      // fixpoint = edge set unchanged (both phases emit canonical, distinct
      // pairs, so equal cardinality + one empty difference proves equality)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edgeCount = nextCount
      edges.unpersist()
      edges = next
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar: not converged after $maxIter rounds — " +
        "raise maxIter (rounds grow with log² of the largest component)")
    // at the fixpoint edges form stars (root = component min): every
    // non-root appears exactly once as b; roots label themselves
    // allNodes and the final (star-forest-sized) edges stay cached — the
    // returned frame is lazy and reads both; they expire with the session
    allNodes
      .join(edges.select(col("b").as("node"), col("a").as("comp")), Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }

  /** Keep exactly one document per duplicate cluster: the component's min
    * id survives, every other clustered doc drops; docs in no pair pass
    * through untouched (they ARE their own component). One anti-join
    * against the loser set. */
  def dedupByComponents(docs: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("node") =!= col("comp"))
      .select(col("node").as("__loser"))
    docs.join(losers, id === col("__loser"), "left_anti")
  }

  // ---------- n-grams ----------------------------------------------------

  /** Word n-grams of a text column (empty array when fewer than n tokens) —
    * one-pass codegen'd kernel; see
    * [[graft.functions.TextExpressions.NgramKernel]]. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.TextExpressions.wordNgrams(text, n)

  /** XXH64 of each word n-gram (`array<long>`) — the representation every
    * join/shuffle/set-op below actually runs on: only set SIZES surface in
    * results, and those equal the string-set sizes absent 64-bit collisions
    * (odds ~k²/2⁶⁵ per pair). Longs cut shuffle bytes, broadcast bytes, and
    * intersect cost several-fold vs ~20-char strings. */
  def wordNgramHashes(text: Column, n: Int): Column =
    graft.functions.TextExpressions.wordNgramHashes(text, n)

  /** The equivalent higher-order-function spelling, kept as the semantic
    * specification the kernel is tested against (DedupSpec equivalence). */
  private[graft] def wordNgramsHof(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard similarity for all doc pairs within a blocking
    * group that clear `minJaccard`. Inverted-index join: |A∩B| from a
    * self-join on distinct (doc, ngram), |A| and |B| from per-doc counts —
    * the pair space never materializes beyond docs that actually share an
    * n-gram inside a block.
    *
    * Cost bound (round-12 sf10 receipt): the candidate volume is
    * Θ(Σ_g df(g)²) — per gram, every co-occurring doc pair. On corpora
    * where common grams' document frequency grows WITH the corpus (small
    * vocabularies, boilerplate-heavy crawls), that is quadratic: the 1000×
    * scale probe aborted on shuffle disk-fill (>70 GB) at 500k synthetic
    * docs because the 30-word generator vocabulary makes every gram's df
    * linear in n. This op is the EXACT inventory for gate-scale grading
    * and audits; at production scale, candidate generation is the banded
    * [[minhashLshPairsDeterministic]] path (linear via banding, recall
    * measured in RecallAudit) with exact Jaccard verified on candidates
    * only — or [[prefixJaccardPairs]], whose rarest-first prefix filter
    * bounds per-gram fan-out.
    *
    * Precondition (r12 gram-set family): `id` is UNIQUE per input row.
    * The doc-level array_distinct frame computes per-ROW gram sets —
    * duplicate ids emit duplicated size rows and inflated intersections
    * instead of merging (the old cross-row distinct merged them);
    * ExtSpec pins the duplicate-id behavior. */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column,
      block: Column, n: Int, minJaccard: Double): DataFrame = {
    // Doc-level gram-SET frame (one row per doc; requires `id` unique per
    // input row, which every caller's corpus satisfies). The per-doc
    // distinct runs as array_distinct INSIDE the row — the previous
    // explode-then-.distinct() paid a full Exchange + HashAggregate to
    // dedup rows that never left their source row — and per-doc set sizes
    // fall out of size(gs) with no aggregation, removing the second
    // doc-keyed Exchange (guide §2.4: remove shuffles outright). Three
    // consumers (sizes + both join sides) — materialize once instead of
    // re-tokenizing/hashing per consumer (the prefixJaccardPairs pattern);
    // the doc-level frame is also the cheaper thing to checkpoint (one row
    // per doc, same gram payload).
    val sets = docs
      .select(id.as("doc_id"), block.as("blk"),
        array_distinct(wordNgramHashes(text, n)).as("gs"))
      .filter(size(col("gs")) > 0)
      .transform(graft.ops.Checkpoints.truncate(_))
    val sizes = sets.select(col("doc_id"), size(col("gs")).cast("long").as("sz"))
    val g = sets.select(col("doc_id"), col("blk"), explode(col("gs")).as("ng"))
    val a = g.select(col("doc_id").as("d1"), col("blk"), col("ng"))
    val b = g.select(col("doc_id").as("d2"), col("blk").as("blk2"), col("ng").as("ng2"))
    val inter = a.join(b,
        col("blk") === col("blk2") && col("ng") === col("ng2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sa"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sb"), "d2")
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("sa") + col("sb") - col("i")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Cross-GROUP shingle-overlap matrix: exact Jaccard between the distinct
    * word-n-gram sets of every pair of groups (sources, crawls, snapshots) —
    * the corpus-level contamination/redundancy report that decides which
    * sources to down-weight before any per-document dedup runs.
    *
    * Output: (s1, s2, n_common, n1, n2, jaccard_ppm) for s1 < s2, with
    * jaccard_ppm = ⌊10⁶·|A∩B| / |A∪B|⌋ (integer-exact cross-engine).
    * Pairs with an EMPTY intersection do not appear (absent row = zero
    * overlap — the report stays output-bounded by actual redundancy).
    *
    * 100 TB shape: one distinct over (group, gram-hash) — grams ride as
    * XXH64 longs ([[wordNgramHashes]]; only COUNTS surface, which equal the
    * string-set counts absent ~k²/2⁶⁵ collisions) — then a self-join keyed
    * by the hash whose output is bounded by |groups|², never by corpus
    * size. Group cardinality is assumed small (sources/crawls); for
    * thousands of groups, band the gram space first. The ppm numerator is
    * Long arithmetic under ANSI: past ~9.2·10¹² shared shingles per pair
    * (10⁶·|A∩B| at the Long boundary) it throws rather than wraps — switch
    * the ppm column to DECIMAL if a corpus ever gets there. */
  def groupShingleOverlap(docs: DataFrame, group: Column, text: Column,
      n: Int): DataFrame = {
    // the (src, h) distinct is genuinely cross-row (many docs per group),
    // so the Exchange stays — but array_distinct BEFORE the explode drops
    // within-doc repeats on the map side, so the exchange carries only
    // per-doc-distinct grams (guide §2.3: shuffle fewer bytes)
    val sh = docs
      .select(group.as("src"), explode(array_distinct(wordNgramHashes(text, n))).as("h"))
      .distinct().transform(graft.ops.Checkpoints.truncate(_)) // three consumers: totals + both join sides
    val totals = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))
    sh.select(col("src").as("s1"), col("h"))
      .join(sh.select(col("src").as("s2"), col("h").as("h2")),
        col("h") === col("h2") && col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_common"))
      .join(totals.select(col("src").as("s1"), col("n").as("n1")), "s1")
      .join(totals.select(col("src").as("s2"), col("n").as("n2")), "s2")
      .withColumn("jaccard_ppm",
        expr("(1000000 * n_common) div (n1 + n2 - n_common)"))
      .select(col("s1"), col("s2"), col("n_common"), col("n1"), col("n2"),
        col("jaccard_ppm"))
  }

  /** Prefix-filtered exact set-similarity self-join — the non-probabilistic
    * alternative to MinHash/SimHash blocking (SSJoin, Chaudhuri et al. 2006;
    * All-Pairs, Bayardo et al. 2007; the MapReduce formulation is Vernica
    * et al. 2010 — public constructions). Order every document's n-gram set
    * by GLOBAL rarity (document frequency asc, gram asc); for Jaccard
    * threshold `t` any pair with J ≥ t must share a gram inside each side's
    * first `|x| − ⌈t·|x|⌉ + 1` grams, so ONLY the prefix grams enter the
    * inverted-index join. Rare grams lead the order, so prefix postings
    * lists are short where the full index is long — the candidate space
    * shrinks toward the true-pair set as t grows, with a hard completeness
    * guarantee (unlike LSH's probabilistic recall).
    *
    * Verification is candidate-bounded: each surviving (d1, d2) joins the
    * two sorted gram SETS and intersects them per pair (`array_intersect`,
    * codegen'd) — corpus-sized work never touches the pair space. Output
    * (d1, d2, jaccard) equals [[ngramJaccardPairs]] row-for-row; the same
    * plain-SQL theta join is the oracle for both.
    *
    * 100 TB: two vocabulary-keyed aggregations (df, prefix ranks), an
    * inverted-index join over ~(1−t)·index postings, and a pair-keyed
    * verify join. The df table is the only extra state vs LSH, and it is
    * the vocabulary table every lexical op here already builds. */
  def prefixJaccardPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double): DataFrame = {
    // The per-doc gram sets feed FIVE consumers (df count, prefix ranks,
    // both verify sides, sizes); left lazy, Spark would re-tokenize the
    // corpus for each. Materialize once (localCheckpoint = eager, lineage
    // truncated) — the local stand-in for the tokenized-relation
    // materialization the MapReduce formulation writes between stages
    // (Vernica et al. §4); at cluster scale make it a parquet scratch
    // table and this is exactly that plan.
    val sets = docs.select(id.as("doc_id"),
        array_sort(array_distinct(wordNgramHashes(text, n))).as("gs"))
      .filter(size(col("gs")) > 0)
      .transform(graft.ops.Checkpoints.truncate(_))
    val g = sets.select(col("doc_id"), explode(col("gs")).as("ng"))
    // Vernica et al. ship the token ordering to every node via the
    // distributed cache — the broadcast hint is that decision made
    // explicit (the df table is vocabulary-sized; AQE's estimate of a
    // fresh aggregate is unknown, so left alone it shuffle-joins). At a
    // vocabulary too big to broadcast, drop the hint — same plan, one
    // more exchange.
    val dfreq = broadcast(g.groupBy(col("ng")).agg(count(lit(1)).as("df")))
    // Per-doc prefix via one hash aggregation (collect → per-row sort →
    // slice) instead of a partition-sorted window: the rank only matters
    // WITHIN a doc, so sorting doc-local arrays beats sorting whole
    // shuffle partitions. Struct sort is (df, ng)-lexicographic — the same
    // rarity-first order. Array size per doc = that doc's gram count.
    val prefix = g.join(dfreq, "ng")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("ng")))).as("__arr"))
      .select(col("doc_id"), explode(expr(
        "slice(__arr, 1, cast(size(__arr) - ceil(size(__arr) * " +
          s"$minJaccard) + 1 as int))")).as("p"))
      .select(col("doc_id"), col("p.ng").as("ng"))
      // both sides of the candidate self-join read this table — without the
      // checkpoint each side replays the df join + prefix aggregation
      .transform(graft.ops.Checkpoints.truncate(_))
    val cand = prefix.select(col("doc_id").as("d1"), col("ng"))
      .join(prefix.select(col("doc_id").as("d2"), col("ng").as("ng2")),
        col("ng") === col("ng2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    cand
      .join(sets.select(col("doc_id").as("d1"), col("gs").as("g1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("gs").as("g2")), "d2")
      .withColumn("i", size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .withColumn("jaccard", round(col("i").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("i")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Containment pairs — the ASYMMETRIC near-dup relation Jaccard misses:
    * `C(A→B) = |A∩B| / |A|` is high when A's grams are mostly inside B
    * (quotations, excerpts, doc-contains-doc), even when the size gap
    * makes J small. Same inverted-index shape as [[ngramJaccardPairs]];
    * emits both directions' containments and keeps pairs where either
    * clears `minContainment`. Precondition: `id` unique per input row
    * (the [[ngramJaccardPairs]] gram-set rule). */
  def containmentPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, minContainment: Double): DataFrame = {
    // same doc-level gram-set materialization as ngramJaccardPairs: the
    // within-row distinct is array_distinct (no Exchange), sizes come from
    // size(gs) (no aggregation)
    val sets = docs
      .select(id.as("doc_id"), array_distinct(wordNgramHashes(text, n)).as("gs"))
      .filter(size(col("gs")) > 0)
      .transform(graft.ops.Checkpoints.truncate(_))
    val sizes = sets.select(col("doc_id"), size(col("gs")).cast("long").as("sz"))
    val g = sets.select(col("doc_id"), explode(col("gs")).as("ng"))
    val inter = g.select(col("doc_id").as("d1"), col("ng"))
      .join(g.select(col("doc_id").as("d2"), col("ng").as("ng2")),
        col("ng") === col("ng2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sa"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sb"), "d2")
      .withColumn("c_fwd", round(col("i").cast("double") / col("sa"), 6))
      .withColumn("c_bwd", round(col("i").cast("double") / col("sb"), 6))
      .filter(greatest(col("c_fwd"), col("c_bwd")) >= minContainment)
      .select(col("d1"), col("d2"), col("c_fwd"), col("c_bwd"))
  }

  // ---------- template families (shared-prefix detection) -----------------

  /** Documents grouped by their first-`k`-token prefix — TEMPLATE FAMILY
    * detection, the boilerplate mode neither pair dedup nor line-level
    * stripping names: form letters, ToS pages, and generated reports share
    * an opening stanza while their bodies diverge (so Jaccard stays below
    * any pair threshold), yet training on ten thousand of them teaches the
    * template. One row per family with ≥ `minDocs` members:
    * (family_fp, prefix, n_docs, checksum) — family_fp is the md5 of the
    * prefix (portable; an external system joins on it), checksum the
    * member-id sum. Documents shorter than `k` tokens group by their full
    * text, which is exactly the right degeneracy (identical short docs ARE
    * a family — and a q40 exact-dedup candidate first).
    *
    * 100 TB shape: one prefix-keyed aggregation — the prefix is a bounded
    * string (k tokens), so the shuffle carries k-token keys, never
    * documents; families are read out smallest-first by the caller's
    * LIMIT. */
  def templateFamilies(docs: DataFrame, id: Column, text: Column,
      k: Int = 8, minDocs: Long = 2): DataFrame = {
    require(k >= 1 && minDocs >= 1, "templateFamilies: k and minDocs >= 1")
    val prefix = concat_ws(" ", slice(TextAnalysis.tokens(text), 1, k))
    docs.select(id.as("doc_id"), prefix.as("prefix"))
      .filter(col("prefix") =!= "")
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("checksum"))
      .filter(col("n_docs") >= minDocs)
      .select(md5(col("prefix")).as("family_fp"), col("prefix"),
        col("n_docs"), col("checksum"))
  }

  /** Alpha-rename-invariant clone fingerprint — TYPE-2 clone detection
    * (Roy & Cordy's taxonomy; the MOSS use case for code): identifier-ish
    * tokens (`[A-Za-z_][A-Za-z0-9_]*`) are replaced by their
    * first-occurrence rank (`v1 v2 v1 …`), so two documents that differ
    * only by a consistent renaming — variables in code, entity names in
    * templated text — hash identically, while structure changes break the
    * match. Non-identifier tokens (numbers, operators, punctuation) pass
    * through literally. Returns the md5 of the normalized token stream.
    *
    * Per-row construction, zero shuffle: the first-occurrence identifier
    * list is an index-aware filter (token kept iff absent from its own
    * prefix — O(n²) array scans per doc, local work), BOUND as a lambda
    * variable before the rewrite pass (the q197 winnowing rule: a raw
    * multi-use alias inlines into the lambda body and re-evaluates per
    * element). Dedup on the fingerprint is then q40's exact machinery. */
  def alphaCloneFingerprint(text: Column): Column = {
    val identRe = "^[A-Za-z_][A-Za-z0-9_]*$"
    // both the token array and the first-occurrence list are BOUND as
    // lambda variables (nested array-of-one transforms) so each evaluates
    // once per row, not once per element
    md5(element_at(transform(array(TextAnalysis.tokens(text)), tk => {
      val firstIds = filter(tk, (t, i) =>
        t.rlike(identRe) && array_position(slice(tk, lit(1), i), t) === 0)
      element_at(transform(array(firstIds), ids =>
        concat_ws(" ", transform(tk, t =>
          when(t.rlike(identRe),
            concat(lit("v"), array_position(ids, t).cast("string")))
            .otherwise(t)))), 1)
    }), 1))
  }

  // ---------- span-level (cross-document substring) dedup -----------------

  /** Fixed-width token spans of a text column: non-overlapping windows of
    * `span` tokens, each rendered back to a string (the last window may be
    * shorter). Empty/whitespace-only text yields an empty array — guarded
    * explicitly because `sequence(0, -1)` would count DOWN, not return
    * empty. */
  def tokenSpans(text: Column, span: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val nSegs = (size(toks) + (span - 1)) / span
    when(size(toks) > 0,
      transform(sequence(lit(0), nSegs.cast("int") - 1),
        i => concat_ws(" ", slice(toks, i * span + 1, lit(span)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Cross-document span-level dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": repeated long substrings are the
    * dominant duplication mode in web corpora). Fixed `span`-token windows
    * approximate the suffix-array substring pass at boundary granularity:
    * any span whose text occurs in at least `minDf` distinct documents is
    * removed from EVERY document carrying it, and each document's survivors
    * are reassembled in order.
    *
    * Returns (doc_id, n_segs, n_removed, clean_text) for every doc with at
    * least one token.
    *
    * 100 TB shape: spans explode once; the document-frequency count runs on
    * `xxhash64(span)` longs (same rationale as [[wordNgramHashes]]: only
    * membership matters downstream, ~5× lighter shuffle than the span
    * strings; collisions ~n²/2⁶⁵ merge two span groups); the frequent-span
    * set is heavy-hitter-bounded (df ≥ minDf caps it at |spans|/minDf, in
    * practice vocabulary-sized), so the removal anti-join broadcasts;
    * reassembly is one shuffle keyed by doc id. No step touches a pair
    * space. Precondition: `id` unique per input row (n_segs is computed
    * per row from the token count; a duplicated id would double-count). */
  def spanDedup(docs: DataFrame, id: Column, text: Column,
      span: Int, minDf: Int): DataFrame = {
    // Two of the old four exchanges were removable (guide §2.4), but NOT by
    // lifting the span strings to a doc-level array frame: evaluating the
    // tokenSpans chain (split + per-span concat_ws slices) once per consumer
    // is the dominant per-row cost, and a first cut that computed n_segs as
    // size(tokenSpans(...)) re-paid the whole chain for a count — measured
    // SLOWER (5.3 → 8.7 s at sf0.1) despite one fewer Exchange. The shapes
    // that survive measurement:
    //   - n_segs arithmetically from the TOKEN count (= ceil(tokens/span) by
    //     tokenSpans' construction): no span strings, no explode, no
    //     aggregation — the counts branch drops its Exchange AND its
    //     tokenSpans evaluation;
    //   - the per-doc distinct for the df count stays on the EXPLODED rows
    //     (codegen'd xxhash64 + one small hash exchange; the in-row
    //     array_distinct(transform(...)) spelling runs the lambda
    //     interpreted and measured slower).
    val segs = docs
      .select(id.as("doc_id"), posexplode(tokenSpans(text, span)).as(Seq("si", "s")))
      .withColumn("h", xxhash64(col("s")))
    val frequent = segs.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"))
    val nToks = size(TextAnalysis.tokens(text))
    val counts = docs.select(id.as("doc_id"),
        (((nToks + (span - 1)) / span).cast("long")).as("n_segs"))
      .filter(col("n_segs") > 0)
    val rebuilt = segs.join(frequent, Seq("h"), "left_anti")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("si"), col("s")))),
          x => x.getField("s"))).as("clean_text"))
    counts.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ---------- MinHash + LSH ----------------------------------------------

  /** k=32 MinHash signature over word-`n`-gram shingles — a one-pass codegen'd
    * Catalyst expression (permutation constants fixed, seed 42: reproducible
    * run-to-run and cluster-to-cluster). NULL when the doc has no shingles.
    * See [[graft.functions.HashExpressions.MinHash]] for why not a
    * higher-order-function spelling. */
  def minhashSignature(text: Column, n: Int): Column =
    HashExpressions.minhash32(wordNgrams(text, n))

  /** Deterministic md5-permutation MinHash signature — the
    * oracle-restatable twin of [[minhashSignature]]
    * ([[graft.functions.HashExpressions.MinHashMd5]]): per-gram hash =
    * md5-nibble fold mod 2³¹−1, public-formula permutations. The q46
    * driver entry ships THIS signature (round 10): with it the banding,
    * candidates and verify all restate in DuckDB, so the entry's output
    * matches its oracle at any corpus — including corpora whose organic
    * gray-zone pairs (0.2 ≤ J < 8/9) the banding probabilistically drops,
    * which under the previous exact-answer oracle was a per-corpus-draw
    * coin flip (caught live by graft.dev.RecallAudit on an organic sf1
    * draw: one J = 0.214 pair, 47% all-bands miss odds). */
  def minhashMd5Signature(text: Column, n: Int): Column =
    HashExpressions.minhash32md5(wordNgrams(text, n))

  /** Higher-order-function spelling of [[minhashMd5Signature]] — the
    * semantic specification the kernel is tested against (ExtSpec), and
    * the direct mirror of the q46 oracle SQL. */
  private[graft] def minhashMd5SignatureHof(text: Column, n: Int): Column = {
    import graft.functions.HashExpressions.MinHashMd5.{K, P, permA, permB}
    val hexVal = (c: Column) =>
      when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48).cast("long")
    val gramHash = (g: Column) =>
      aggregate(slice(split(md5(g), ""), 1, 15), lit(0L),
        (a, c) => a * 16 + hexVal(c)) % P
    val hs = transform(wordNgrams(text, n), gramHash)
    when(size(hs) >= 1, array((0 until K).map(k =>
      array_min(transform(hs, h => (lit(permA(k)) * h + lit(permB(k))) % P))): _*))
  }

  /** LSH band keys: 16 bands × 2 rows. Docs sharing any band key are
    * candidate pairs.
    *
    * Why 16×2 and not the classic 8×4: the planted near-dup corpus's
    * WORST true pair is a 10-word doc and its one-word-longer copy —
    * trigram J = 8/9 ≈ 0.889 — and at 8×4 such a pair misses every band
    * with probability (1−J⁴)⁸ ≈ 4.3e-4. Across the thousands of planted
    * pairs in a 50k-doc corpus that is a per-run coin flip, and the
    * round-9 organic sf1 gate caught exactly one such miss (q46 returned
    * 2466 of 2467 exact pairs). At 16×2 the same pair misses with
    * (1−J²)¹⁶ ≈ 1.4e-11 — recall is structural again — while the extra
    * low-J candidates the shorter bands admit are all removed by the
    * exact-Jaccard verify that follows every LSH blocking here. */
  /** The q46 band geometry AND the corpus contract it is sized for, as
    * named constants so [[graft.ext.RecallFloors]] (RecallFloorSpec +
    * graft.dev.RecallAudit) pins the analytic miss floor against the SAME
    * values the kernel runs — a future geometry edit that re-widens the
    * per-run miss odds fails the floor spec at compile-adjacent time
    * instead of resurfacing as a 0.5%-per-gate coin flip (the round-9
    * organic-sf1 finding that forced 8×4 → 16×2). */
  val LshBands = 16
  val LshBandRows = 2
  /** Worst planted TRUE pair both testdata generators emit: a 10-word doc
    * vs its one-word-longer copy — trigram J = 8/9. The q46 oracle-equality
    * claim additionally requires the gray zone 0.2 ≤ J < 8/9 to be EMPTY,
    * which graft.dev.RecallAudit asserts per corpus. */
  val PlantedWorstJaccard = 8.0 / 9.0

  def lshBandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(LshBands - 1)),
      b => concat_ws(",", concat(b.cast("string"), lit(":")),
        slice(sig, b * LshBandRows + 1, lit(LshBandRows))))

  /** MinHash-LSH near-duplicate pairs: signature → band-bucket explode →
    * bucket self-join (the only shuffle is on band keys) → estimated Jaccard
    * from signature agreement, verified with exact n-gram Jaccard ≥
    * `minJaccard`. */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double): DataFrame =
    minhashLshCore(docs, id, text, n, minJaccard, minhashSignature(text, n))

  /** [[minhashLshPairs]] over the deterministic md5 signature — the q46
    * driver entry (see [[minhashMd5Signature]] for why). Identical shape:
    * band blocking, candidate join on bare ids, exact-Jaccard verify. */
  def minhashLshPairsDeterministic(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double): DataFrame =
    minhashLshCore(docs, id, text, n, minJaccard, minhashMd5Signature(text, n))

  private def minhashLshCore(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double, sigExpr: Column): DataFrame = {
    // the signature (the most expensive kernel here) feeds the bucket
    // explode AND both verify-side rejoins — materialize it once
    val withSig = docs.select(id.as("doc_id"), sigExpr.as("sig"))
      .transform(graft.ops.Checkpoints.truncate(_))
    val buckets = withSig.select(col("doc_id"),
      explode(lshBandKeys(col("sig"))).as("bucket"))
    // distinct over bare (d1, d2) id pairs — signatures rejoin afterwards so
    // the dedup aggregation never hashes 32-long arrays.
    val cand = buckets.alias("x").join(buckets.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
      .join(withSig.select(col("doc_id").as("d1"), col("sig").as("sig1")), "d1")
      .join(withSig.select(col("doc_id").as("d2"), col("sig").as("sig2")), "d2")
    val est = cand.withColumn("est_jaccard",
      round(size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b), x => x))
        .cast("double") / 32, 6))
    // Verify ONLY the candidate pairs with exact Jaccard on their n-gram
    // sets (set intersection per pair) — never the global inverted-index
    // join: at 100 TB, avoiding that all-docs pair work is the entire point
    // of the LSH blocking. Hashed-long grams: same set sizes, ~5× lighter.
    val grams = docs.select(id.as("doc_id"), array_distinct(wordNgramHashes(text, n)).as("ng"))
    est
      .join(grams.select(col("doc_id").as("d1"), col("ng").as("ng1")), "d1")
      .join(grams.select(col("doc_id").as("d2"), col("ng").as("ng2")), "d2")
      .withColumn("i", size(array_intersect(col("ng1"), col("ng2"))).cast("double"))
      .withColumn("jaccard",
        round(col("i") / (size(col("ng1")) + size(col("ng2")) - col("i")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("est_jaccard"), col("jaccard"))
  }

  // ---------- SimHash ----------------------------------------------------

  /** 64-bit SimHash fingerprint (custom Catalyst expression — one pass over
    * the string, no token-array allocation). */
  def simhash(text: Column): Column = HashExpressions.simhash64(text)

  /** 60-bit SimHash over whitespace tokens built ONLY from cross-engine
    * primitives — the oracle-expressible twin of [[simhash]] (whose SipHash
    * token mixing is engine-internal). Per-token hash = the first 15 hex
    * chars of `md5(token)` folded base-16: an exact 60-bit integer that any
    * engine with md5 reproduces bit-for-bit (md5 string equality is already
    * cross-engine-proven by q44's content fingerprint). Per-bit votes and
    * the sign rule (`votes > 0` → bit set) are pure integer arithmetic, so
    * the full signature — and everything downstream of it — hash-matches a
    * DuckDB restatement (q102). Evaluated by a one-pass compiled kernel
    * ([[graft.functions.HashExpressions.SimHash60Md5]] — md5 once per token,
    * no per-char string churn; the interpreted HOF spelling below measured
    * 16 s at sf0.1, the kernel ~1 s). */
  def simhash60Md5(text: Column): Column =
    HashExpressions.simhash60md5(text)

  /** The equivalent higher-order-function spelling — kept as the semantic
    * specification the kernel is tested against (ExtSpec equivalence on
    * real docs), and as the direct mirror of q102's DuckDB SQL. */
  private[graft] def simhash60Md5Hof(text: Column): Column = {
    val hexVal = (c: Column) =>
      when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48).cast("long")
    val tokHash = (t: Column) =>
      aggregate(slice(split(md5(t), ""), 1, 15), lit(0L), (a, c) => a * 16 + hexVal(c))
    val gs = transform(TextAnalysis.tokens(text), tokHash)
    val votes = aggregate(gs, array_repeat(lit(0L), 60),
      (acc, g) => zip_with(acc, sequence(lit(0), lit(59)),
        (a, b) => a + (call_function("shiftright", g, b).bitwiseAND(lit(1L)) * 2 - 1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(59)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** (doc_id, fp, bkey) band frame of [[simhash60Md5]]: the four 15-bit
    * bands packed into ONE long key `bkey = bidx·2¹⁵ + bval` (17 bits) —
    * the single-column form a bucketed band snapshot wants (one bucket key,
    * not a composite). */
  private[graft] def simhash60BandFrame(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), simhash60Md5(text).as("fp"))
      .select(col("doc_id"), col("fp"), explode(array((0 until 4).map(i =>
        (shiftright(col("fp"), 15 * i).bitwiseAND(lit(32767L)) + lit(i * 32768L)).as("bkey")): _*))
        .as("bkey"))

  /** Write the corpus's DISTINCT word-n-gram hash set as a bucketed
    * snapshot table — the q82/q108 incremental-ingest wiring at SHINGLE
    * granularity, feeding [[noveltyAgainstSnapshot]]. */
  def snapshotShingles(corpus: DataFrame, text: Column, table: String,
      n: Int, buckets: Int): Unit =
    graft.tables.Bucketing.writeBucketed(
      // cross-doc distinct stays; array_distinct pre-shrinks the exchange
      // to per-doc-distinct grams (guide §2.3)
      corpus.select(explode(array_distinct(wordNgramHashes(text, n))).as("h"))
        .distinct(),
      table, buckets, Seq("h"))

  /** Per-document NOVELTY of an incoming batch against a shingle snapshot
    * ([[snapshotShingles]]) — the ingest gate between dedup and
    * decontamination: a doc whose shingles the corpus has mostly seen adds
    * little (and repeats = memorization risk), one that is mostly novel is
    * the content worth keeping. Returns (doc_id, n_grams, n_known,
    * novelty_ppm) with novelty_ppm = ⌊10⁶·(n_grams − n_known)/n_grams⌋
    * over DISTINCT per-doc grams; the keep threshold is the caller's cut.
    * Docs with fewer than n tokens have no shingles and are absent.
    *
    * 100 TB shape: the snapshot is consumed in its bucket layout (zero
    * snapshot-side Exchange — the semi join co-locates by probing the
    * bucketed hash key); only the daily-sized batch repartitions. Grams
    * ride as XXH64 longs — counts equal string-set counts absent ~k²/2⁶⁵
    * collisions (the q45 argument), and the oracle recounts the string
    * sets.
    *
    * Precondition: `id` is UNIQUE per incoming row — an at-least-once
    * ingest that redelivers a doc id gets one novelty row PER DELIVERY
    * (per-row gram sets), not a merged one; dedup the batch first (the
    * q82/q108 wiring does). ExtSpec pins the family's duplicate-id
    * behavior. */
  def noveltyAgainstSnapshot(spark: org.apache.spark.sql.SparkSession,
      snapshotTable: String, incoming: DataFrame, id: Column, text: Column,
      n: Int): DataFrame = {
    val snap = spark.table(snapshotTable)
    // doc-level gram-set frame (the ngramJaccardPairs shape): within-row
    // distinct as array_distinct, totals from size(hs) — neither pays an
    // Exchange; only the snapshot semi join shuffles the batch
    val sets = incoming
      .select(id.as("doc_id"), array_distinct(wordNgramHashes(text, n)).as("hs"))
      .filter(size(col("hs")) > 0)
      .transform(graft.ops.Checkpoints.truncate(_)) // two consumers: totals + the semi join
    val counts = sets.select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"))
    val known = sets.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(snap, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
    counts.join(known, Seq("doc_id"), "left")
      .withColumn("n_known", coalesce(col("n_known"), lit(0L)))
      .withColumn("novelty_ppm",
        expr("(1000000 * (n_grams - n_known)) div n_grams"))
  }

  /** Build the production corpus side of incremental NEAR-dup ingest: the
    * corpus's distinct (band key, fingerprint) pairs as a bucketed,
    * bucket-sorted catalog table keyed by `bkey`. The shuffle over the
    * (100 TB) corpus is paid ONCE here — every subsequent ingest probes the
    * snapshot in its bucket layout with zero Exchange on the snapshot side
    * ([[novelNearDupAgainstSnapshot]]; the near-dup analogue of
    * [[snapshotFingerprints]]). Size: ≤ 4 rows per corpus doc, minus
    * (bkey, fp) duplicates — exact-dup docs collapse to one snapshot row
    * per band. */
  def snapshotSimhashBands(corpus: DataFrame, id: Column, text: Column,
      table: String, buckets: Int): Unit =
    graft.tables.Bucketing.writeBucketed(
      simhash60BandFrame(corpus, id, text).select(col("bkey"), col("fp")).distinct(),
      table, buckets, Seq("bkey"))

  /** Incremental NEAR-dup ingest against a pre-built band snapshot
    * ([[snapshotSimhashBands]]): a batch doc is dropped when it band-collides
    * within Hamming ≤ `maxHamming` of any corpus fingerprint, or of a
    * SMALLER-id batch doc (the deterministic keep-min rule; chains need
    * [[connectedComponents]], near-dup ingests are near-cliques). The corpus
    * probe consumes the snapshot in its bucket layout — no shuffle and no
    * sort on the snapshot side, only the (daily-sized) batch repartitions to
    * the bucket count; the within-batch pass is [[simhash60Md5Pairs]]'s
    * band equi-join. Every step is deterministic cross-engine integer
    * arithmetic (the [[simhash60Md5]] signature), so the surviving-doc set
    * carries a full DuckDB oracle (q108). */
  def novelNearDupAgainstSnapshot(spark: org.apache.spark.sql.SparkSession,
      snapshotTable: String, incoming: DataFrame, id: Column, text: Column,
      maxHamming: Int): DataFrame = {
    val snap = spark.table(snapshotTable).withColumnRenamed("fp", "cfp")
    val probe = simhash60BandFrame(incoming, id, text)
    val corpusHit = probe.join(snap, Seq("bkey"))
      .filter(bit_count(col("fp").bitwiseXOR(col("cfp"))) <= maxHamming)
      .select(col("doc_id").as("__hit"))
    val batchHit = simhash60Md5Pairs(incoming, id, text, maxHamming)
      .select(col("d2").as("__hit"))
    incoming.join(corpusHit.union(batchHit).distinct(), id === col("__hit"), "left_anti")
  }

  /** Near-dup pairs from [[simhash60Md5]]: 4×15-bit band blocking, Hamming ≤
    * `maxHamming` (band agreement is guaranteed by pigeonhole only for
    * Hamming ≤ 3 — wider distances may be missed, simhash's standard recall
    * trade). Unlike [[simhashPairs]] (q47), every step here is deterministic
    * integer arithmetic on a SQL-recomputable signature, so the emitted pair
    * SET has a full DuckDB oracle: the oracle recomputes the same banding,
    * not a Jaccard ground truth. Plan shape is identical to production: the
    * only shuffle is the band-key equi-join, pairs dedup on bare ids. */
  def simhash60Md5Pairs(docs: DataFrame, id: Column, text: Column,
      maxHamming: Int): DataFrame = {
    val f = docs.select(id.as("doc_id"), simhash60Md5(text).as("fp"))
    val bands = f.select(col("doc_id"), col("fp"), explode(array((0 until 4).map(i =>
        struct(lit(i).as("bidx"),
          shiftright(col("fp"), 15 * i).bitwiseAND(lit(32767L)).as("bval"))): _*)).as("b"))
      .select(col("doc_id"), col("fp"), col("b.bidx").as("bidx"), col("b.bval").as("bval"))
    bands.alias("x").join(bands.alias("y"),
        col("x.bidx") === col("y.bidx") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.fp").as("fp1"), col("y.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, blocked on
    * 4×16-bit fingerprint bands (a pair within Hamming ≤ 3 of a 64-bit hash
    * must agree on at least one of 4 bands; wider distances may be missed —
    * that's the standard recall trade). */
  def simhashPairs(docs: DataFrame, id: Column, text: Column, maxHamming: Int): DataFrame = {
    val f = docs.select(id.as("doc_id"), simhash(text).as("fp"))
    val bands = f.select(col("doc_id"), col("fp"), explode(array(
      concat(lit("0:"), shiftrightunsigned(col("fp"), 0).bitwiseAND(lit(0xffffL)).cast("string")),
      concat(lit("1:"), shiftrightunsigned(col("fp"), 16).bitwiseAND(lit(0xffffL)).cast("string")),
      concat(lit("2:"), shiftrightunsigned(col("fp"), 32).bitwiseAND(lit(0xffffL)).cast("string")),
      concat(lit("3:"), shiftrightunsigned(col("fp"), 48).bitwiseAND(lit(0xffffL)).cast("string"))
    )).as("bucket"))
    bands.alias("x").join(bands.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.fp").as("fp1"), col("y.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  // ---------- corpus novelty scoring --------------------------------------

  /** Per-document novelty against the REST of the corpus: the fraction
    * (ppm) of a document's distinct word n-grams that occur in no other
    * document — the memorization/originality audit (a doc whose grams all
    * appear elsewhere is boilerplate or a copy even when no single pair
    * crosses a near-dup threshold; the doc-level complement of the q45
    * pair view). Distinct grams per doc, document frequency per gram, and
    * `novel = grams with df = 1` — all on hashed longs, one gram-keyed
    * shuffle; the df table joins back on the same key. Returns
    * (doc_id, n_grams, n_novel, novelty_ppm); gramless docs are absent.
    * Precondition: `id` unique per input row — a duplicated id's copies
    * each count in df (so shared grams stop being novel) and its rollup
    * row sums both copies' gram instances; ExtSpec pins this. */
  def noveltyScore(docs: DataFrame, id: Column, text: Column,
      n: Int = 3): DataFrame = {
    // within-row distinct as array_distinct — the explode-then-.distinct()
    // spelling paid a (doc, gram)-keyed Exchange for rows that never left
    // their source row; the remaining shuffles (df by gram, rollup by doc)
    // are the fundamental ones
    val grams = docs.select(id.as("doc_id"),
        explode(array_distinct(
          graft.functions.TextExpressions.wordNgramHashes(text, n))).as("h"))
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("df"))
    grams.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        org.apache.spark.sql.graft.Bridge.idiv(
          lit(1000000L) * col("n_novel"), col("n_grams")).as("novelty_ppm"))
  }

  // ---------- inverted-index phrase search --------------------------------

  /** Exact phrase search over the corpus WITHOUT a full text scan per
    * query: the n-gram postings list (one corpus pass, reusable across
    * every query — the index economics) meets the phrase's own grams on
    * hash, alignment `start = doc_pos − phrase_gram_idx` groups hits, a
    * candidate needs ALL its grams aligned, and a final token-slice
    * equality check makes the answer exact under hash collisions. The
    * "find every document containing this sentence" primitive behind
    * targeted decontamination, quote tracing, and license-string audits.
    *
    * 100 TB shape: postings shuffle once on gram hash (longs); the query
    * set is small by nature → its grams broadcast; candidate groups are
    * (phrase, doc, start)-keyed and hit-bounded; verification joins text
    * for CANDIDATE docs only. Phrases shorter than `n` tokens are
    * rejected. Returns (phrase_id, doc_id, start) — 0-based token offset
    * of each occurrence. */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
      phrases: DataFrame, phraseId: Column, phrase: Column,
      n: Int = 4): DataFrame = {
    require(n >= 1, "phraseSearch: n must be >= 1")
    val ptoks = phrases.select(phraseId.as("phrase_id"),
      TextAnalysis.tokens(phrase).as("ptk"),
      graft.functions.TextExpressions.wordNgramHashes(phrase, n).as("pg"))
    val pgrams = ptoks
      .select(col("phrase_id"), size(col("ptk")).as("len"),
        size(col("pg")).as("n_grams"),
        posexplode(col("pg")).as(Seq("j", "h")))
    val postings = docs.select(id.as("doc_id"),
      posexplode(graft.functions.TextExpressions.wordNgramHashes(text, n))
        .as(Seq("p", "h")))
    val cand = postings.join(broadcast(pgrams), Seq("h"))
      .withColumn("start", col("p") - col("j"))
      .filter(col("start") >= 0)
      .groupBy(col("phrase_id"), col("doc_id"), col("start"))
      .agg(countDistinct(col("j")).as("n_hit"), max(col("n_grams")).as("n_grams"),
        max(col("len")).as("len"))
      .filter(col("n_hit") === col("n_grams"))
    cand
      .join(docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("dtk")),
        Seq("doc_id"))
      .join(ptoks.select(col("phrase_id"), col("ptk")), Seq("phrase_id"))
      .filter(slice(col("dtk"), col("start") + 1, col("len")) === col("ptk"))
      .select(col("phrase_id"), col("doc_id"), col("start").cast("long").as("start"))
  }

  // ---------- edit-distance fuzzy matching (record linkage) ---------------

  /** Fuzzy near-duplicate NAME pairs under a Levenshtein gate with
    * prefix blocking — the classic record-linkage / entity-resolution
    * shape (Fellegi–Sunter blocking + edit-distance compare): distinct
    * names group on a cheap blocking key (default: first two characters),
    * pairs form only WITHIN a block, and each surviving pair carries its
    * exact edit distance. Levenshtein with unit costs is engine-portable
    * (deterministic DP — the oracle recomputes it exactly).
    *
    * 100 TB shape: never all-pairs — the block key bounds the quadratic
    * to block-local; the standard recall trade is documented and tested
    * (a typo INSIDE the blocking prefix escapes this pass; production
    * linkage runs a second pass on a complementary key — suffix, length
    * band, or q-gram LSH — and unions, same operator). Names are
    * DISTINCT-ed first so row-level duplicates can't square the block. */
  def editDistancePairs(recs: DataFrame, name: Column, maxDist: Int,
      blockLen: Int = 2): DataFrame = {
    require(maxDist >= 0, "editDistancePairs: maxDist must be >= 0")
    val ents = recs.select(name.as("name")).distinct()
      .withColumn("blk", substring(col("name"), 1, blockLen))
    ents.as("a").join(ents.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("lev", levenshtein(col("a.name"), col("b.name")))
      .filter(col("lev") <= maxDist)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("lev").cast("long").as("lev"))
  }

  // ---------- winnowing (MOSS) fingerprints -------------------------------

  /** The selected-key array for one document (packed `h·2¹⁶ + (65535−pos)`
    * longs, distinct). Empty array for a gramless doc. */
  private def winnowKeys(text: Column, n: Int, w: Int): Column = {
    val grams = graft.functions.TextExpressions.wordNgrams(text, n)
    val keys = transform(grams, (g, i) =>
      conv(substring(md5(g), 1, 11), 16, 10).cast("long") * 65536L +
        (lit(65535L) - i))
    // BIND the key array as a lambda variable before the window pass:
    // referencing the raw `keys` expression inside the per-window lambda
    // re-evaluates the whole md5 array PER WINDOW (Catalyst inlines
    // single-use aliases into lambda bodies without seeing the n-fold
    // evaluation) — O(n²) hashing, measured 75 s at sf0.1. One element
    // of `array(keys)` evaluates once; windows then read the variable.
    element_at(transform(array(keys), ks => {
      val mins = transform(
        sequence(lit(0), greatest(lit(0), size(ks) - w)),
        i => array_min(slice(ks, i + 1, lit(w))))
      when(size(ks) === 0, array().cast("array<long>"))
        .otherwise(array_distinct(mins))
    }), 1)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS algorithm): in every window of `w` consecutive
    * word-`n`-gram hashes, select the minimal hash — ties broken to the
    * RIGHTMOST position (the paper's basic-winnowing tie rule) — then
    * dedupe selections. The guarantee: any shared token run of length
    * ≥ w + n − 1 between two documents shares at least one selected
    * fingerprint, with ~2/(w+1) of grams expected selected — the local,
    * position-aware fingerprint family that MinHash (global,
    * position-blind) is not.
    *
    * Hashes are md5-derived 44-bit integers (portable: the oracle replays
    * them bit-for-bit), and the tie rule is packed INTO the comparison key:
    * `key = h·2¹⁶ + (2¹⁶−1 − pos)`, so one `array_min` per window gives
    * "smallest hash, rightmost position" in a single comparison. Fits a
    * long for positions < 65536 (token index — split longer docs into
    * chunks first, [[graft.ext.Curation]] `chunkDocs`).
    *
    * Pure per-row HOF expressions over the gram array — ZERO shuffle, scan
    * speed at any corpus size (each doc's O(n·w) work is local); composes
    * with an inverted-index join on the fingerprint hash ([[ngramJaccard]]
    * shape) for cross-doc match detection. Returns per-doc
    * (doc_id, n_grams, n_fp, fp_sum). */
  def winnowingProfile(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1 && w >= 1, "winnowingProfile: n and w must be >= 1")
    val grams = graft.functions.TextExpressions.wordNgrams(text, n)
    val fps = winnowKeys(text, n, w)
    docs.select(id.as("doc_id"),
        size(grams).cast("long").as("n_grams"),
        size(fps).cast("long").as("n_fp"),
        // key >> 16 recovers h exactly (integer; a double `/` would lose
        // bits past 2^53)
        aggregate(fps, lit(0L), (a, k) => a + shiftright(k, 16)).as("fp_sum"))
  }

  /** Exploded winnowing fingerprints — one row per selected (doc, position,
    * hash); the inverted-index-join form for cross-doc match detection
    * (group by `h`, pair within — the [[ngramJaccard]] shape). Still zero
    * shuffle to PRODUCE (explode is narrow). */
  def winnowingFingerprints(docs: DataFrame, id: Column, text: Column,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1 && w >= 1, "winnowingFingerprints: n and w must be >= 1")
    docs.select(id.as("doc_id"), explode(winnowKeys(text, n, w)).as("key"))
      .select(col("doc_id"),
        (lit(65535L) - pmod(col("key"), lit(65536L))).as("pos"),
        shiftright(col("key"), 16).as("h"))
  }

  /** Band-recall audit: the measure-before-trust number for BANDED
    * near-dup blocking ([[simhash60Md5Pairs]]' 4×15-bit scheme) — ground
    * truth is the EXACT n-gram-Jaccard pair set ([[ngramJaccardPairs]]),
    * and for each true pair the question is purely structural: do the two
    * fingerprints agree on at least one band (⇔ the pair enters the
    * candidate set)? Pairs bucket by SimHash Hamming distance, so the
    * report is the banding's recall CURVE: ~10⁶ at Hamming ≤ 3 (4 bands
    * over 60 bits guarantee a clean band up to 3 flipped bits — the
    * pigeonhole bound), decaying where near-dups drift apart — exactly
    * the evidence needed before trusting banding at a new similarity
    * threshold. Returns (ham_bucket, n_pairs, n_caught, catch_ppm),
    * bucket = hamming div bucketWidth.
    *
    * 100 TB shape: band-catch is evaluated per TRUE pair straight from
    * the two fingerprints (one bit-twiddling expression) — the candidate
    * join itself is never materialized here; cost = the exact-pair
    * inventory (which a recall audit needs by definition, run it on a
    * bounded sample stratum at full scale) + one fingerprint map. */
  def bandRecallAudit(docs: DataFrame, id: Column, text: Column, n: Int,
      minJaccard: Double, bucketWidth: Int = 4): DataFrame = {
    require(bucketWidth >= 1, "bandRecallAudit: bucketWidth >= 1")
    val truth = ngramJaccardPairs(docs, id, text, lit(1), n, minJaccard)
    val f = docs.select(id.as("doc_id"), simhash60Md5(text).as("fp"))
    def band(c: Column, i: Int): Column =
      shiftright(c, 15 * i).bitwiseAND(lit(32767L))
    val caught = (0 until 4).map(i =>
      band(col("fp1"), i) === band(col("fp2"), i)).reduce(_ || _)
    truth
      .join(f.select(col("doc_id").as("d1"), col("fp").as("fp1")), "d1")
      .join(f.select(col("doc_id").as("d2"), col("fp").as("fp2")), "d2")
      .select(bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long")
        .as("hamming"), caught.cast("long").as("caught"))
      .groupBy(org.apache.spark.sql.graft.Bridge.idiv(col("hamming"),
        lit(bucketWidth.toLong)).as("ham_bucket"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("caught")).as("n_caught"))
      .withColumn("catch_ppm", org.apache.spark.sql.graft.Bridge.idiv(
        col("n_caught") * 1000000L, col("n_pairs")))
  }

  /** Capture–recapture estimate of the dedup universe (Lincoln–Petersen
    * with the Chapman 1951 correction): two independent deterministic
    * samples of the corpus (seeded md5 gates) mark n₁ and n₂ distinct
    * fingerprints with overlap m; N̂ = (n₁+1)(n₂+1)/(m+1) − 1 estimates
    * the TOTAL distinct-fingerprint count from two cheap samples — the
    * "how big is the dedup problem" sizing number obtainable before
    * paying for the full distinct. The audit form here also computes the
    * exact truth and the error, because at gate scale the truth is
    * affordable and the estimator should be measured before trusted (at
    * 100 TB, drop the truth columns and keep the samples). Assumes docs
    * (not duplicate-cluster members) sample independently — heavy
    * duplication CORRELATES the marks and biases N̂ low; that bias is
    * itself the signal the audit surfaces via err_ppm.
    *
    * 100 TB shape: the two sample sides are scan-speed filters feeding
    * fingerprint distincts sized by the sample rate; the overlap is one
    * fingerprint-keyed join of the two sample sets. */
  def captureRecapture(df: DataFrame, id: Column, fingerprint: Column,
      seedA: String, seedB: String, ppm: Long): DataFrame = {
    require(ppm > 0 && ppm < 1000000L, "captureRecapture: ppm in (0, 1e6)")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    def gate(seed: String): Column = pmod(conv(substring(
      md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(1000000L)) < ppm
    val base = df.select(fingerprint.as("fp"), gate(seedA).as("ga"),
      gate(seedB).as("gb"))
    val a = base.filter(col("ga")).select(col("fp")).distinct()
    val b = base.filter(col("gb")).select(col("fp")).distinct()
    val n1 = a.agg(count(lit(1)).as("n1"))
    val n2 = b.agg(count(lit(1)).as("n2"))
    val m = a.join(b, Seq("fp")).agg(count(lit(1)).as("m"))
    val truth = base.select(col("fp")).distinct()
      .agg(count(lit(1)).as("true_distinct"))
    n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
      .crossJoin(broadcast(truth))
      .withColumn("est", idiv((col("n1") + 1L) * (col("n2") + 1L),
        col("m") + 1L) - 1L)
      .withColumn("err_ppm", idiv(
        abs(col("est") - col("true_distinct")) * 1000000L,
        col("true_distinct")))
  }

  /** Pair-similarity histogram — the threshold-calibration profile run
    * BEFORE committing a dedup threshold: exact-Jaccard pairs above a low
    * floor, bucketed by similarity decile, with pair counts and id
    * checksums. Reading where the mass sits (a bimodal histogram =
    * boilerplate band + true-copy band) is how minJaccard gets chosen on
    * evidence instead of folklore. Decile = ⌊10·jaccard⌋ over the same
    * round(·, 6) doubles both engines already hash-compare (q45).
    *
    * 100 TB shape: = the exact-pair inventory (inverted-index join) + one
    * bounded bucket aggregation; run on a sample stratum at full scale,
    * as any calibration pass would be. */
  def pairSimilarityHistogram(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double): DataFrame =
    ngramJaccardPairs(docs, id, text, lit(1), n, minJaccard)
      .groupBy(floor(col("jaccard") * 10).cast("long").as("sim_decile"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("d1") + col("d2")).as("checksum"))

  /** [[fellegiSunter]]'s plan-time integer log-odds:
    * (⌊10⁶·log₂(m/u)⌋, ⌊10⁶·log₂((1−m)/(1−u))⌋) — public so the oracle
    * interpolates the SAME constants. */
  def fsWeights(mMilli: Long, uMilli: Long): (Long, Long) = {
    require(mMilli > 0 && mMilli < 1000 && uMilli > 0 && uMilli < 1000 &&
      mMilli > uMilli, "fsWeights: need 0 < u < m < 1000 milli")
    val lg2 = math.log(2.0)
    ((1e6 * math.log(mMilli.toDouble / uMilli) / lg2).toLong,
      (1e6 * math.log((1000.0 - mMilli) / (1000 - uMilli)) / lg2).toLong)
  }

  /** Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, the
    * probabilistic-linkage standard): blocked candidate pairs score
    * Σ_fields (agree ? log₂(m/u) : log₂((1−m)/(1−u))) and classify by the
    * two-threshold rule (link / possible / non-link). The log-odds are
    * PLAN-TIME micro-scaled integer constants (the ndcgDiscounts
    * discipline — the caller's (m, u) parameters become literals in both
    * engines, no log runs inside either), so scores and class counts are
    * cross-engine exact. `fields` carries (name, expr, mMilli, uMilli);
    * agreement is expression equality across the pair. Returns per class:
    * (cls, n_pairs, sum_score_micro, checksum).
    *
    * 100 TB shape: candidates come from the caller's blocking key (the
    * whole FS design — never all pairs); scoring is per-pair arithmetic
    * over broadcast constants, and the report is 3 rows. Production
    * blocks must be tight (the q198 rule: band + prefix, or an LSH
    * bucket); a skewed block serializes its own pairs, not the corpus. */
  def fellegiSunter(docs: DataFrame, id: Column, block: Seq[Column],
      fields: Seq[(String, Column, Long, Long)],
      linkMicro: Long, nonlinkMicro: Long): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: need at least one field")
    val side = docs.select((id.as("id") +: block.zipWithIndex.map {
      case (c, i) => c.as(s"b$i")
    }) ++ fields.zipWithIndex.map { case ((_, c, _, _), i) =>
      c.cast("string").as(s"f$i")
    }: _*)
    val bkeys = block.indices.map(i => s"b$i")
    val a = side.toDF(side.columns.map(_ + "_1").toIndexedSeq: _*)
    val b = side.toDF(side.columns.map(_ + "_2").toIndexedSeq: _*)
    val joined = a.join(b,
      bkeys.map(k => col(s"${k}_1") === col(s"${k}_2"))
        .reduce(_ && _) && col("id_1") < col("id_2"))
    val score = fields.zipWithIndex.map { case ((_, _, m, u), i) =>
      val (wa, wd) = fsWeights(m, u)
      when(col(s"f${i}_1") <=> col(s"f${i}_2"), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    joined.select(score.as("score_micro"),
        (col("id_1") + col("id_2")).as("pairsum"))
      .withColumn("cls", when(col("score_micro") >= linkMicro, "link")
        .when(col("score_micro") <= nonlinkMicro, "nonlink")
        .otherwise("possible"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("score_micro")).as("sum_score_micro"),
        sum(col("pairsum")).as("checksum"))
  }

  /** Match-span explanation for confirmed near-dup pairs — the dedup-QA
    * step that answers "WHERE do these two documents overlap": for each
    * [[ngramJaccardPairs]] pair, align every shared n-gram occurrence by
    * position, group alignments by diagonal (i − j), and chain consecutive
    * positions (the i − row_number run trick) — the longest chain of L
    * consecutive n-gram matches is a contiguous common span of L + n − 1
    * tokens. Reviewers read spans, not Jaccard scores; span length also
    * separates boilerplate overlap (short, many diagonals) from true
    * copies (one long diagonal). Returns (d1, d2, n_shared_grams,
    * n_aligned, max_run, span_tokens).
    *
    * 100 TB shape: positions meet through the CONFIRMED pair list (pair
    * ids join the position index — only pairs already past the Jaccard
    * gate pay), and the run window partitions by (pair, diagonal) — match
    * counts per pair bound every group. Three spill guards (the organic
    * sf1 bench's third-biggest spiller before them, 44 s): the position index is
    * built only for DOCS THAT APPEAR IN A PAIR (a semi join before the
    * posexplode — near-dup members are a sliver of the corpus, so the
    * exploded index shrinks with the pair density, not the corpus);
    * alignment joins carry xxhash64 gram longs, never gram strings (the
    * [[ngramJaccardPairs]] convention — same counts, ~5× lighter
    * shuffles); and the alignment frame is truncated once because both
    * the run-chain and the totals branch consume it. */
  def matchSpanExplanation(docs: DataFrame, id: Column, text: Column,
      n: Int, minJaccard: Double): DataFrame = {
    val pairs = ngramJaccardPairs(docs, id, text, lit(1), n, minJaccard)
      .select(col("d1"), col("d2"))
      .transform(graft.ops.Checkpoints.truncate(_))
    val members = pairs.select(col("d1").as("doc_id"))
      .union(pairs.select(col("d2").as("doc_id"))).distinct()
    val pos = docs.select(id.as("doc_id"),
        posexplode(wordNgramHashes(text, n)).as(Seq("p", "g")))
      .join(members, Seq("doc_id"), "left_semi")
    val al = pairs
      .join(pos.select(col("doc_id").as("d1"), col("p").as("i"), col("g")),
        Seq("d1"))
      .join(pos.select(col("doc_id").as("d2"), col("p").as("j"), col("g")),
        Seq("d2", "g"))
      .transform(graft.ops.Checkpoints.truncate(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d1"), col("d2"), col("diag"))
      .orderBy(col("i"))
    val runs = al.withColumn("diag", col("i") - col("j"))
      .withColumn("chain", col("i") - row_number().over(w))
      .groupBy(col("d1"), col("d2"), col("diag"), col("chain"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("d1"), col("d2"))
      .agg(max(col("run")).as("max_run"))
    val tot = al.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_aligned"),
        countDistinct(col("g")).as("n_shared_grams"))
    tot.join(runs, Seq("d1", "d2"))
      .select(col("d1"), col("d2"), col("n_shared_grams"), col("n_aligned"),
        col("max_run"), (col("max_run") + (n - 1)).as("span_tokens"))
  }

  /** Quality-aware canonical selection within duplicate clusters — the
    * "keep one per cluster" step done right: lowest-id keeps (the
    * [[exactDedup]] default) discard the BEST copy whenever a cleaner
    * near-duplicate arrived later, so production dedup keeps the
    * max-quality member instead (tie → lowest id). `clusters` is a
    * (node, comp) labeling ([[connectedComponents]] /
    * [[connectedComponentsStar]] output); docs absent from it (no
    * duplicate edges) are their own singleton cluster — they MUST surface
    * here, or the keeper list silently drops every unique document.
    * Returns (comp, n_docs, keep_id, keep_q).
    *
    * 100 TB shape: one left join of the corpus onto the pair-bounded
    * cluster table (broadcast when near-dup pairs are sparse — the q140
    * wiring), then one comp-keyed struct-max argmax aggregation (the q119
    * double-argmax discipline: no window, no sort). */
  def canonicalByQuality(docs: DataFrame, id: Column, quality: Column,
      clusters: DataFrame): DataFrame = {
    val d = docs.select(id.as("doc_id"), quality.cast("long").as("q"))
    d.join(clusters.withColumnRenamed("node", "doc_id"), Seq("doc_id"),
        "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("q"), (-col("doc_id")).as("nid"),
          col("doc_id").as("keep_id"))).as("b"))
      .select(col("comp"), col("n_docs"),
        col("b").getField("keep_id").as("keep_id"),
        col("b").getField("q").as("keep_q"))
  }
}

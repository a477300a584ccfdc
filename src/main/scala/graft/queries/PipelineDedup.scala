package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Multimodal, Similarity, TextAnalysis => TA}
import graft.tables.Tables

import PipelineOps._

/** Text/document near-duplicate detection: exact, shingle, MinHash, SimHash, winnowing, containment, clone/template families, incremental forms.
  *
  * One shard of [[PipelineOps]] (round-8 mechanical split of the
  * former 8k-line file — zero behavior change; PipelineOps merges the
  * shards and still owns the shared helpers/oracle builders). */
private[queries] object PipelineDedup {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_exact" -> ((s, dir) => {
      // Exact duplicate-row detection: one hash aggregation over all columns.
      Dedup.duplicateRowSummary(t(s, dir, "lineitem"))
    }),
    "q44_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      d.select(
        col("doc_id"),
        TA.contentFingerprint(col("text")).as("cfp"),
        TA.rollingFingerprint(col("text")).as("rfp"))
        .orderBy(col("doc_id"))
    }),
    "q45_ngram_jaccard" -> ((s, dir) => {
      // Exact n-gram Jaccard near-dup pairs — the inverted-index join
      // formulation (only docs sharing an n-gram ever meet; at 100 TB add a
      // blocking column to bound the index join).
      Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          col("doc_id"), col("text"), lit(1), n = 3, minJaccard = 0.2)
        .orderBy(col("d1"), col("d2"))
    }),
    "q107_span_dedup" -> ((s, dir) => {
      // Cross-document span-level dedup (the fixed-boundary form of Lee et
      // al.'s substring dedup): 12-token spans occurring in ≥2 distinct docs
      // are cut from every doc carrying them; survivors reassemble in order.
      // The corpus's planted near-dups share real spans, so removal is
      // non-trivial (~4% of spans at sf0.01). DF counting runs on
      // xxhash64(span) longs; the frequent set is df-bounded → broadcast
      // anti-join; reassembly is the one doc-keyed shuffle.
      Dedup.spanDedup(t(s, dir, "documents"), col("doc_id"), col("text"),
          span = 12, minDf = 2)
        .orderBy(col("doc_id"))
    }),
    "q46_minhash_lsh" -> ((s, dir) => {
      // MinHash(32) + LSH(16×2) candidates, exact-Jaccard verified on the
      // candidate set only — since round 10 over the DETERMINISTIC md5
      // signature (public-formula permutations), so the oracle restates
      // the WHOLE operator: signatures, bands, candidates, verify. The
      // previous entry used the engine-private murmur3 signature with the
      // exact q45 answer as oracle, valid only under a corpus precondition
      // (no pairs in the gray zone 0.2 ≤ J < 8/9 where banding recall is
      // probabilistic) — and the round-10 organic sf1 draw VIOLATED it
      // (one organic J = 0.214 pair, 47% all-bands miss odds: a literal
      // per-draw coin flip, caught by graft.dev.RecallAudit before the
      // gate could flake). With the restated blocking, engine and oracle
      // agree bit-for-bit at any corpus, gray pairs included; banding
      // recall vs the exact answer is MEASURED per gate corpus by
      // RecallAudit (floor 0.995) and the planted-pair floor stays
      // structural at 16×2 (lshBandKeys math, RecallFloorSpec). The
      // murmur3 kernel remains spec-covered (ExtSpec).
      Dedup.minhashLshPairsDeterministic(t(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, minJaccard = 0.2)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    }),
    "q47_simhash" -> ((s, dir) => {
      // Production default (since round 7): the DETERMINISTIC md5-SimHash
      // kernel — simhash60Md5's 60-bit signature folds the first 15 md5
      // nibbles of each token, so the oracle restates it bit-for-bit —
      // banded 4×15, Hamming ≤ 8 (a wider gate than q102's ≤ 5), each
      // surviving pair verified with its exact trigram Jaccard. Band
      // blocking guarantees collision only for Hamming ≤ 3 (pigeonhole);
      // pairs at 4..8 surface when a band happens to agree — the standard
      // recall trade, identical in BOTH engines, so the emitted SET
      // hash-matches the full DuckDB restatement. The engine-internal
      // SimHash64 Catalyst kernel stays the spec-covered alternate
      // (Dedup.simhashPairs; ExtSpec pins its h = 0 floor) — its hash is
      // engine-private, which is why the driver entry no longer ships it.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhash60Md5Pairs(docs, col("doc_id"), col("text"),
        maxHamming = 8)
      // 100 TB shape: the full n-gram table outgrows a broadcast — reduce it
      // FIRST to docs that appear in a candidate pair (semi-join against the
      // band-blocked candidate set), then join the reduction under both
      // lookups via the size-aware regime: the candidate-doc fraction is
      // small when dup rates are low, but web corpora run 20–50%
      // duplicate-involved, so the reduction is MEASURED (one job against
      // the truncated frame, which also stops it recomputing under the two
      // lookups) — broadcast under the byte bound, shuffle_hash above it
      // (never a forced broadcast, never a sort). The candidate-pair stream
      // picks up ng1/ng2 hash-side and the (hashed-long, array_distinct'd)
      // gram column never sort-shuffles.
      val candDocs = pairs.select(col("d1").as("doc_id"))
        .union(pairs.select(col("d2").as("doc_id"))).distinct()
      val ng = graft.ops.Checkpoints.truncate(
        docs.join(candDocs, Seq("doc_id"), "left_semi")
          .select(col("doc_id"),
            array_distinct(Dedup.wordNgramHashes(col("text"), 3)).as("ng")))
      val ngStats = ng.agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("ng"))), lit(0L)).as("grams")).head()
      val ngBytes = ngStats.getLong(0) * 32L + ngStats.getLong(1) * 8L
      def h(df: org.apache.spark.sql.DataFrame) =
        graft.ops.JoinRegime.sizeAware(df, ngBytes)
      pairs
        .join(h(ng.select(col("doc_id").as("d1"), col("ng").as("ng1"))), Seq("d1"))
        .join(h(ng.select(col("doc_id").as("d2"), col("ng").as("ng2"))), Seq("d2"))
        .withColumn("i", size(array_intersect(col("ng1"), col("ng2"))).cast("double"))
        .withColumn("jaccard",
          round(col("i") / (size(col("ng1")) + size(col("ng2")) - col("i")), 6))
        .select(col("d1"), col("d2"), col("hamming"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    }),
    "q102_simhash_oracle" -> ((s, dir) => {
      // The oracle-expressible SimHash twin of q47: 60-bit signature from
      // md5-derived token hashes (exact integer fold of the first 15 hex
      // chars), 4×15-bit band blocking, Hamming ≤ 5. Every step is
      // deterministic cross-engine arithmetic, so unlike q47 the emitted
      // pair SET itself hash-matches a full DuckDB restatement — closing the
      // "hash-dependent by nature" gap for the simhash operator class. Plan
      // shape is the production one: band-key equi-join, bare-id pair
      // dedup, no all-pairs work.
      Dedup.simhash60Md5Pairs(t(s, dir, "documents"),
          col("doc_id"), col("text"), maxHamming = 5)
        .orderBy(col("d1"), col("d2"))
    }),
    "q66_incremental_dedup" -> ((s, dir) => {
      // Incremental ingest dedup: even doc_ids stand in for the existing
      // corpus snapshot, odd doc_ids for the incoming batch; emit incoming
      // docs novel by content fingerprint (within-batch dups keep the
      // lowest id). One shuffle on the fingerprint key; the snapshot side
      // reduces to its distinct fingerprint set before the anti-join.
      val docs = t(s, dir, "documents")
      Dedup.novelAgainst(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          TA.contentFingerprint(col("text")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    "q95_dedup_clusters" -> ((s, dir) => {
      // Pair detection → duplicate CLUSTERS: connected components over the
      // exact n-gram-Jaccard pair graph (min-label propagation, bounded
      // rounds), rolled up per component. This is the step that makes
      // "keep one per cluster" well-defined when similarity isn't
      // transitive; the oracle recomputes components via a recursive
      // transitive closure in DuckDB.
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"),
        col("doc_id"), col("text"), lit(1), n = 3, minJaccard = 0.2)
      Dedup.connectedComponents(pairs)
        .groupBy(col("comp")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("node")).as("checksum"))
        .orderBy(col("comp"))
    }),
    "q111_cc_star_chains" -> ((s, dir) => {
      // Duplicate clusters on an ADVERSARIAL-DIAMETER pair graph: 7 disjoint
      // ~29-node chains (edges (d, d+7) over doc ids) — the shape where
      // q95's min-label propagation needs diameter rounds, and the
      // large-star/small-star contraction (Kiveris et al.) converges in
      // ~log rounds (ExtSpec pins the contrast). Components roll up as in
      // q95; the oracle recomputes them by recursive transitive closure.
      val pairs = t(s, dir, "documents").filter(col("doc_id") < 196)
        .select(col("doc_id").as("d1"), (col("doc_id") + 7).as("d2"))
      Dedup.connectedComponentsStar(pairs)
        .groupBy(col("comp")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("node")).as("checksum"))
        .orderBy(col("comp"))
    }),
    "q245_canonical_select" -> ((s, dir) => {
      // Keep-the-best dedup: q95's duplicate clusters, but the keeper is
      // the max-gini member (tie -> lowest id), and unique docs surface as
      // their own singleton clusters.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        lit(1), n = 3, minJaccard = 0.2)
      Dedup.canonicalByQuality(docs, col("doc_id"),
          TA.giniDiversityPpm(col("text")), Dedup.connectedComponents(pairs))
        .orderBy(col("comp"))
    }),
    "q247_lsh_recall_audit" -> ((s, dir) => {
      // Banding recall curve: exact 3-gram-Jaccard pairs (>= 0.2) bucketed
      // by simhash Hamming distance; per bucket, the fraction the 4x15-bit
      // banding catches as candidates — the evidence behind q102's
      // blocking.
      Dedup.bandRecallAudit(t(s, dir, "documents"), col("doc_id"),
          col("text"), n = 3, minJaccard = 0.2, bucketWidth = 4)
        .orderBy(col("ham_bucket"))
    }),
    "q253_match_spans" -> ((s, dir) => {
      // WHERE do the near-dups overlap: per confirmed q45 pair, the
      // longest contiguous common token span via diagonal run chaining —
      // boilerplate overlap vs true copies, in tokens a reviewer can read.
      Dedup.matchSpanExplanation(t(s, dir, "documents"), col("doc_id"),
          col("text"), n = 3, minJaccard = 0.2)
        .orderBy(col("d1"), col("d2"))
    }),
    "q273_template_families" -> ((s, dir) => {
      // Template-family detection: every 9th doc opens with a planted ToS
      // stanza — shared first-8-token prefixes group into families the
      // pair dedup never fires on (bodies diverge; Jaccard stays low).
      val tpl = "terms of service acme corp all rights reserved :: "
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(9L)) === 0, concat(lit(tpl), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.templateFamilies(docs, col("doc_id"), col("text"),
          k = 8, minDocs = 2)
        .orderBy(col("n_docs").desc, col("family_fp"))
    }),
    "q277_clone_families" -> ((s, dir) => {
      // Type-2 (alpha-renamed) clone detection: every 11th doc gains a
      // copy (+1e6 id) with three vocabulary words consistently renamed
      // to fresh tokens — invisible to exact dedup and diluted for
      // Jaccard, but the alpha-normal fingerprint pairs copy with
      // original exactly. Families of structurally-identical docs roll
      // up on the fingerprint (q40's exact machinery on the normal form).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val renamed = docs.filter(pmod(col("doc_id"), lit(11L)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            "\\bspark\\b", "zzalpha"), "\\btable\\b", "zzbeta"),
            "\\bmerge\\b", "zzgamma").as("text"))
      docs.unionByName(renamed)
        .select(col("doc_id"), Dedup.alphaCloneFingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_id"),
          sum(col("doc_id")).as("checksum"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("fp"))
    }),
    "q223_novelty_score" -> ((s, dir) => {
      // Memorization/originality audit: per doc, the ppm of its distinct
      // trigrams found in NO other document. Low novelty = boilerplate
      // or copy even when no single near-dup pair fires.
      Dedup.noveltyScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),
    "q213_dedup_savings" -> ((s, dir) => {
      // Dedup-savings report: token mass that exact dedup (keep-min per
      // content fingerprint) would remove, attributed to the SOURCE of
      // each dropped doc — the "is dedup worth the shuffle here" sizing
      // answer, per corpus slice. ONE fingerprint-keyed window, no join.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.tokenCount(col("text")).as("n_tok"),
          TA.contentFingerprint(col("text")).as("fp"))
        .withColumn("keep_doc", min(col("doc_id")).over(w))
        .withColumn("dropped", (col("doc_id") =!= col("keep_doc")).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("dropped")).as("n_dropped"),
          sum(col("n_tok") * col("dropped")).as("drop_tok"))
        .withColumn("savings_ppm", org.apache.spark.sql.graft.Bridge.idiv(
          lit(1000000L) * col("drop_tok"), greatest(col("sum_tok"), lit(1L))))
        .orderBy(col("source"))
    }),
    "q198_fuzzy_names" -> ((s, dir) => {
      // Record-linkage fuzzy matching: part names plus a deterministic
      // typo twin for every 7th part (3rd character dropped) pair up under
      // prefix-2 blocking + Levenshtein <= 2. The dropped char sits PAST
      // the blocking prefix, so every planted twin is reachable; pairs
      // never form across blocks (the documented recall trade).
      val names = t(s, dir, "part")
        .filter(col("p_partkey") % 7 === 0)
        .select(concat(substring(col("p_name"), 1, 2),
          substring(col("p_name"), 4, 10000)).as("name"))
        .unionByName(t(s, dir, "part").select(col("p_name").as("name")))
      Dedup.editDistancePairs(names, col("name"), maxDist = 2)
        .orderBy(col("name_a"), col("name_b"))
    }),
    "q197_winnowing" -> ((s, dir) => {
      // Winnowing (MOSS) fingerprint profile per document: any shared run
      // of ≥ w+n-1 = 6 tokens is guaranteed to share a selected
      // fingerprint, at ~2/(w+1) of grams stored. md5-derived 44-bit
      // hashes with the rightmost-min tie rule packed into one long key —
      // the oracle replays both bit-for-bit. Zero shuffle (per-row HOFs).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.winnowingProfile(docs, col("doc_id"), col("text"), n = 3, w = 4)
        .orderBy(col("doc_id"))
    }),
    "q195_normalized_dedup" -> ((s, dir) => {
      // Canonicalize-then-dedup: every doc gets a deterministic MESSY twin
      // (uppercased + punctuation + ragged whitespace, id + 10⁶) that raw
      // fingerprints call distinct; normalization collapses each twin pair
      // back into one group. Output = norm-fingerprint groups ≥ 2 with the
      // keep-min rule — the stage that belongs BEFORE q40's exact dedup.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val messy = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(upper(col("text")), lit(" !!  ")).as("text"))
      docs.unionByName(messy)
        .select(col("doc_id"),
          md5(TA.normalizedText(col("text"))).as("norm_md5"))
        .groupBy(col("norm_md5"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("norm_md5"))
    }),
    "q192_span_decontamination" -> ((s, dir) => {
      // Surgical eval decontamination: every corpus trigram window that
      // appears in the benchmark split (doc_id % 10 = 0) is struck as a
      // merged token range, the rest of each doc survives — the span form
      // of q98's doc-level tripwire. Bench grams broadcast as longs; one
      // doc-keyed rebuild.
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 10 === 0)
        .select(explode(Dedup.wordNgramHashes(col("text"), 3)).as("h"))
        .distinct()
      Curation.maskContaminatedSpans(docs.filter(col("doc_id") % 10 =!= 0),
          col("doc_id"), col("text"), bench, n = 3)
        .orderBy(col("doc_id"))
    }),
    "q190_phash_dedup" -> ((s, dir) => {
      // Perceptual-hash image dedup through the REAL codec path: 32×32
      // pattern PNGs (ids sharing id div 4 are near-duplicate images)
      // encode → ImageIO decode → 8×8 average-hash → hash-groupBy
      // clusters with keep-min. PNG is lossless, so the oracle recomputes
      // every hash from the pixel formula without decoding anything —
      // q145's trick extended from metadata to pixels.
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"))
      Multimodal.imageAHashBits(Multimodal.withPatternPng(docs))
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("phash"))
    }),
    "q177_ingest_novelty" -> ((s, dir) => {
      // The ingest freshness/memorization gate: per-doc novelty of an
      // incoming batch against the corpus's bucketed shingle snapshot —
      // how much of each new doc the corpus has already seen. Snapshot
      // probes in bucket layout (zero snapshot Exchange, the q82/q108
      // wiring); only the batch repartitions. Integer ppm over distinct
      // trigram sets; the oracle recounts the string sets.
      dropScratch(s, "q177_shingle_snap")
      val docs = t(s, dir, "documents")
      Dedup.snapshotShingles(docs.filter(col("doc_id") % 2 === 0),
        col("text"), "q177_shingle_snap", n = 3, buckets = 8)
      val out = materialize(s,
        Dedup.noveltyAgainstSnapshot(s, "q177_shingle_snap",
            docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
            n = 3)
          .orderBy(col("doc_id")))
      s.sql("DROP TABLE IF EXISTS q177_shingle_snap")
      out
    }),
    "q169_cluster_representatives" -> ((s, dir) => {
      // The keep rule ON TOP of duplicate clusters: within each q95
      // component keep the BEST document (max n_chars, ties to the lowest
      // id) — a curation pipeline keeps the most complete duplicate, not
      // the arbitrary lowest-id one. One struct-max aggregation over the
      // pair-bounded component table; the oracle replays the CC closure
      // and the exact (n_chars, lowest-id) argmax.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs,
        col("doc_id"), col("text"), lit(1), n = 3, minJaccard = 0.2)
      Dedup.clusterRepresentatives(Dedup.connectedComponents(pairs),
          docs, col("doc_id"), col("n_chars"))
        .orderBy(col("comp"))
    }),
    "q82_incremental_dedup_bucketed" -> ((s, dir) => {
      // q66's incremental ingest dedup in its PRODUCTION wiring: the corpus
      // fingerprint set is a pre-built bucketed snapshot table (shuffle paid
      // once at snapshot-build time), and the ingest anti-join co-locates on
      // the bucket layout — zero Exchange on the snapshot side (ScaleOpsSpec
      // asserts the plan). Result must equal the plain formulation — q66's
      // oracle verbatim.
      dropScratch(s, "q82_fp_snap")
      val docs = t(s, dir, "documents")
      val fp = TA.contentFingerprint(col("text"))
      Dedup.snapshotFingerprints(docs.filter(col("doc_id") % 2 === 0), fp, "q82_fp_snap", 8)
      val out = Dedup.novelAgainstSnapshot(s, "q82_fp_snap",
          docs.filter(col("doc_id") % 2 === 1), fp, col("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      // The result is DATA-sized (the batch's novel docs), so unlike q80's
      // 3-row rollup it must not collect to the driver: round-trip through
      // a single-file parquet (order-preserving) so the scratch snapshot
      // table can drop before returning. The operator itself never
      // materializes — this is driver-gate hygiene only.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q82").toString
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      s.sql("DROP TABLE IF EXISTS q82_fp_snap")
      s.read.parquet(tmp)
    }),
    "q68_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: docs sharing any 5-gram with the
      // benchmark stand-in (doc_id < 5) — planted near-dups must surface.
      val docs = t(s, dir, "documents")
      Curation.flagContaminated(
          docs.filter(col("doc_id") >= 5), col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 5), col("text"), n = 5)
        .orderBy(col("doc_id"))
    }),
    "q162_containment" -> ((s, dir) => {
      // Asymmetric containment near-dups: pairs where one doc's gram set
      // is mostly inside the other's (quotes/excerpts/doc-contains-doc) —
      // the relation Jaccard misses when sizes differ. Inverted-index
      // join, both directions emitted.
      Dedup.containmentPairs(t(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, minContainment = 0.8)
        .orderBy(col("d1"), col("d2"))
    }),
    "q158_semdedup" -> ((s, dir) => {
      // SemDedup: k-means clusters bound the dedup pair space (the
      // learned-cell analogue of q50's LSH blocking), then the
      // keep-the-earliest rule prunes minCos-similar vectors within each
      // cluster. Per-cell rollup of survivors; the oracle replays the
      // Lloyd chain, the in-cell pair cosines, and the keep rule.
      // nClusters = 0 → semDedupClustersFor scales k with the corpus
      // (k = ceil(n/64) floored at 8), and the oracle recomputes the SAME
      // rule from count(*) (semDedupK scalar subquery) — one static SQL
      // string, correct at every verify scale.
      Similarity.semDedup(t(s, dir, "embeddings"), nClusters = 0,
          iters = 2, minCos = 0.45)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_kept"), sum(col("vec_id")).as("checksum"))
        .orderBy(col("cell"))
    }),
    "q146_prefix_jaccard" -> ((s, dir) => {
      // Prefix-filtered exact similarity join (All-Pairs/PPJoin family):
      // only each doc's rarest-first prefix grams enter the inverted-index
      // join, with a HARD completeness guarantee (any pair at J >= t
      // shares a prefix gram) — the deterministic alternative to q46's
      // MinHash blocking. t=0.6 is the regime the algorithm is FOR (prefix
      // = 40% of the index; at t=0.2 it would be 80% and the plain join
      // wins). The oracle is the plain all-pairs theta join at the same t.
      Dedup.prefixJaccardPairs(t(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, minJaccard = 0.6)
        .orderBy(col("d1"), col("d2"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
        |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_rows,
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_removable
        |FROM (SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |      HAVING count(*) > 1) g""".stripMargin,
    "q44_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS cfp,
        |  list_reduce(
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      t -> (CAST(ascii(t) AS BIGINT) * 31 + length(t)) % 1000003),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rfp
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q45_ngram_jaccard" -> ngramJaccardOracle(0.2),
    // prefix filtering is transparent: q146 must reproduce the plain
    // all-pairs answer exactly, so it shares q45's oracle
    "q146_prefix_jaccard" -> ngramJaccardOracle(0.6),
    "q107_span_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |seg AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(ceil(len(t) / 12.0) AS BIGINT) - 1)) AS si, t
        |  FROM toks WHERE len(t) > 0),
        |s2 AS (
        |  SELECT doc_id, si, array_to_string(t[si*12+1 : si*12+12], ' ') AS s FROM seg),
        |freq AS (
        |  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS df FROM s2 GROUP BY s)
        |  WHERE df >= 2),
        |nseg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM s2 GROUP BY doc_id),
        |reb AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(s, ' ' ORDER BY si) AS clean_text
        |  FROM s2 WHERE s NOT IN (SELECT s FROM freq) GROUP BY doc_id)
        |SELECT n.doc_id, n.n_segs,
        |  CAST(n.n_segs - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(r.clean_text, '') AS clean_text
        |FROM nseg n LEFT JOIN reb r USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    // Full restatement of the deterministic md5-MinHash + 16×2 banding
    // (round 10): per-gram 60-bit md5-nibble fold mod 2³¹−1 (the q47
    // machinery), 32 public-formula permutations a_k = ((2k+1)·2654435761)
    // % P / b_k = ((k+1)·2246822519) % P with the mod INSIDE the min (the
    // engine mins the reduced values), two-row bands joined on
    // (band, v1, v2), exact-Jaccard verify on the candidate set — so the
    // emitted pair SET hash-matches at any corpus, gray-zone pairs
    // included (the previous exact-answer oracle was a per-corpus-draw
    // coin flip on such pairs; see the entry comment).
    "q46_minhash_lsh" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, unnest(
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(generate_series(1, len(tk) - 2),
        |             i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [] END) AS ng
        |  FROM toks),
        |gh AS (
        |  SELECT doc_id, list_reduce(
        |      list_transform(string_split(md5(ng), '')[1:15],
        |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                  ELSE unicode(c) - 48 END AS BIGINT)),
        |      (a, v) -> a * 16 + v) % 2147483647 AS h
        |  FROM g),
        |sigk AS (
        |  SELECT doc_id, kk.k AS k,
        |    CAST(min((
        |        (((2 * kk.k + 1) * 2654435761) % 2147483647) * h
        |        + (((kk.k + 1) * 2246822519) % 2147483647)
        |      ) % 2147483647) AS BIGINT) AS mh
        |  FROM gh CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS k) kk
        |  GROUP BY doc_id, kk.k),
        |sig AS (SELECT doc_id, list(mh ORDER BY k) AS sg FROM sigk GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, bb.b AS b, sg[2 * bb.b + 1] AS v1, sg[2 * bb.b + 2] AS v2
        |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.v1 = y.v1 AND x.v2 = y.v2 AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT c.d1, c.d2, count(*) AS i
        |  FROM cand c JOIN g a ON a.doc_id = c.d1
        |              JOIN g b ON b.doc_id = c.d2 AND a.ng = b.ng
        |  GROUP BY c.d1, c.d2),
        |j AS (SELECT d1, d2, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        |  FROM inter JOIN sizes sa ON sa.doc_id = d1
        |             JOIN sizes sb ON sb.doc_id = d2)
        |SELECT d1, d2, jaccard FROM j WHERE jaccard >= 0.2 ORDER BY d1, d2""".stripMargin,
    "q247_lsh_recall_audit" ->
      raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, unnest(
         |    CASE WHEN len(tk) >= 3
         |      THEN list_transform(generate_series(1, len(tk) - 2),
         |             i -> array_to_string(tk[i:i+2], ' '))
         |      ELSE [] END) AS ng
         |  FROM toks),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sizes sa ON sa.doc_id = d1
         |  JOIN sizes sb ON sb.doc_id = d2
         |  WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.2),
         |gh AS (
         |  SELECT doc_id,
         |    list_transform(string_split_regex(trim(text), '\s+'),
         |      t -> list_reduce(
         |             list_transform(string_split(md5(t), '')[1:15],
         |               c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                         ELSE unicode(c) - 48 END AS BIGINT)),
         |             (a, v) -> a * 16 + v)) AS gs
         |  FROM documents),
         |sig AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
         |      CASE WHEN list_sum(list_transform(gs, g -> ((g >> b) & 1) * 2 - 1)) > 0
         |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
         |  FROM gh),
         |pf AS (SELECT p.d1, p.d2, s1.fp AS fp1, s2.fp AS fp2
         |  FROM p JOIN sig s1 ON s1.doc_id = p.d1
         |    JOIN sig s2 ON s2.doc_id = p.d2),
         |x AS (SELECT CAST(bit_count(xor(fp1, fp2)) AS BIGINT) AS hamming,
         |    CASE WHEN ((fp1 >> 0) & 32767) = ((fp2 >> 0) & 32767)
         |          OR ((fp1 >> 15) & 32767) = ((fp2 >> 15) & 32767)
         |          OR ((fp1 >> 30) & 32767) = ((fp2 >> 30) & 32767)
         |          OR ((fp1 >> 45) & 32767) = ((fp2 >> 45) & 32767)
         |      THEN 1 ELSE 0 END AS caught
         |  FROM pf),
         |a AS (SELECT hamming // 4 AS ham_bucket,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(caught) AS BIGINT) AS n_caught
         |  FROM x GROUP BY 1)
         |SELECT CAST(ham_bucket AS BIGINT) AS ham_bucket, n_pairs, n_caught,
         |  (n_caught * 1000000) // n_pairs AS catch_ppm
         |FROM a ORDER BY ham_bucket""".stripMargin,
    "q253_match_spans" ->
      raw"""WITH tw AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
         |    THEN list_transform(generate_series(1, len(w) - 2),
         |      i -> array_to_string(w[i:i+2], ' ')) ELSE [] END) AS ng
         |  FROM tw),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pr AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sizes sa ON sa.doc_id = d1
         |  JOIN sizes sb ON sb.doc_id = d2
         |  WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.2),
         |ps AS (SELECT doc_id, unnest(generate_series(1, len(w) - 2)) AS p, w
         |  FROM tw WHERE len(w) >= 3),
         |pg AS (SELECT doc_id, p, array_to_string(w[p:p+2], ' ') AS gg FROM ps),
         |al AS (SELECT pr.d1, pr.d2, a.p AS i, b.p AS j, a.gg
         |  FROM pr JOIN pg a ON a.doc_id = pr.d1
         |    JOIN pg b ON b.doc_id = pr.d2 AND b.gg = a.gg),
         |ch AS (SELECT d1, d2, i - j AS diag, i, gg,
         |    row_number() OVER (PARTITION BY d1, d2, i - j ORDER BY i) AS rn
         |  FROM al),
         |runs AS (SELECT d1, d2, CAST(count(*) AS BIGINT) AS run
         |  FROM ch GROUP BY d1, d2, diag, i - rn),
         |mx AS (SELECT d1, d2, CAST(max(run) AS BIGINT) AS max_run
         |  FROM runs GROUP BY d1, d2),
         |tot AS (SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_aligned,
         |    CAST(count(DISTINCT gg) AS BIGINT) AS n_shared_grams
         |  FROM al GROUP BY d1, d2)
         |SELECT d1, d2, n_shared_grams, n_aligned, max_run,
         |  max_run + 2 AS span_tokens
         |FROM mx JOIN tot USING (d1, d2) ORDER BY d1, d2""".stripMargin,
    "q273_template_families" ->
      raw"""WITH d AS (SELECT doc_id,
         |    CASE WHEN doc_id % 9 = 0
         |      THEN 'terms of service acme corp all rights reserved :: ' || text
         |      ELSE text END AS text
         |  FROM documents),
         |t AS (SELECT doc_id, array_to_string(
         |    string_split_regex(trim(text), '\s+')[1:8], ' ') AS prefix
         |  FROM d),
         |g AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(doc_id) AS BIGINT) AS checksum
         |  FROM t WHERE prefix != '' GROUP BY prefix)
         |SELECT md5(prefix) AS family_fp, prefix, n_docs, checksum
         |FROM g WHERE n_docs >= 2 ORDER BY n_docs DESC, family_fp""".stripMargin,
    "q277_clone_families" ->
      raw"""WITH base AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '\bspark\b', 'zzalpha', 'g'), '\btable\b', 'zzbeta', 'g'),
         |      '\bmerge\b', 'zzgamma', 'g')
         |  FROM documents WHERE doc_id % 11 = 0),
         |tk AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\s+') AS toks FROM base),
         |ids AS (SELECT doc_id, toks,
         |    list_filter(toks, (t, i) ->
         |      regexp_matches(t, '^[A-Za-z_][A-Za-z0-9_]*$$')
         |      AND list_position(toks[1:i-1], t) = 0) AS fid
         |  FROM tk),
         |nf AS (SELECT doc_id, md5(array_to_string(
         |    list_transform(toks, t ->
         |      CASE WHEN regexp_matches(t, '^[A-Za-z_][A-Za-z0-9_]*$$')
         |        THEN 'v' || CAST(list_position(fid, t) AS VARCHAR)
         |        ELSE t END), ' ')) AS fp
         |  FROM ids)
         |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(doc_id) AS BIGINT) AS rep_id,
         |  CAST(sum(doc_id) AS BIGINT) AS checksum
         |FROM nf GROUP BY fp HAVING count(*) >= 2 ORDER BY fp""".stripMargin,
    "q223_novelty_score" ->
      raw"""WITH tw AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(w) >= 3
         |    THEN list_transform(generate_series(1, len(w) - 2),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         |    ELSE [] END) AS t
         |  FROM tw),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY t),
         |per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM g JOIN df USING (t) GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_novel,
         |  (1000000 * n_novel) // n_grams AS novelty_ppm
         |FROM per ORDER BY doc_id""".stripMargin,
    // Full restatement of the deterministic SimHash twin: md5-token-hash →
    // per-bit votes → 60-bit signature → 4×15-bit bands → banded pairs at
    // Hamming ≤ 5. Same integer op sequence as the Spark side.
    // q47 = the md5-SimHash signature/banding CTEs at Hamming <= 8, with
    // each surviving pair's exact trigram Jaccard joined on (the q45 gram
    // CTEs). Min doc length is 10 tokens, so every doc has grams and the
    // Jaccard denominator is never zero.
    "q47_simhash" ->
      raw"""WITH g AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      t -> list_reduce(
        |             list_transform(string_split(md5(t), '')[1:15],
        |               c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                         ELSE unicode(c) - 48 END AS BIGINT)),
        |             (a, v) -> a * 16 + v)) AS gs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
        |      CASE WHEN list_sum(list_transform(gs, g -> ((g >> b) & 1) * 2 - 1)) > 0
        |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
        |  FROM g),
        |bands AS (
        |  SELECT doc_id, fp, bb.bidx AS bidx, (fp >> (15 * bb.bidx)) & 32767 AS bval
        |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bidx) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.fp AS fp1, y.fp AS fp2
        |  FROM bands x JOIN bands y
        |    ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id),
        |hp AS (
        |  SELECT d1, d2, CAST(bit_count(xor(fp1, fp2)) AS BIGINT) AS hamming
        |  FROM cand WHERE bit_count(xor(fp1, fp2)) <= 8),
        |toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |ng AS (
        |  SELECT DISTINCT doc_id, unnest(
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(generate_series(1, len(tk) - 2),
        |             i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [] END) AS gr
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (
        |  SELECT hp.d1, hp.d2, count(*) AS i
        |  FROM hp JOIN ng a ON a.doc_id = hp.d1
        |          JOIN ng b ON b.doc_id = hp.d2 AND a.gr = b.gr
        |  GROUP BY hp.d1, hp.d2)
        |SELECT hp.d1, hp.d2, hp.hamming,
        |  round(coalesce(i.i, 0) * 1.0 / (sa.sz + sb.sz - coalesce(i.i, 0)), 6)
        |    AS jaccard
        |FROM hp
        |JOIN sizes sa ON sa.doc_id = hp.d1
        |JOIN sizes sb ON sb.doc_id = hp.d2
        |LEFT JOIN inter i ON i.d1 = hp.d1 AND i.d2 = hp.d2
        |ORDER BY hp.d1, hp.d2""".stripMargin,
    "q102_simhash_oracle" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      t -> list_reduce(
        |             list_transform(string_split(md5(t), '')[1:15],
        |               c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                         ELSE unicode(c) - 48 END AS BIGINT)),
        |             (a, v) -> a * 16 + v)) AS gs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(generate_series(0, 59), b ->
        |      CASE WHEN list_sum(list_transform(gs, g -> ((g >> b) & 1) * 2 - 1)) > 0
        |           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS fp
        |  FROM g),
        |bands AS (
        |  SELECT doc_id, fp, bb.bidx AS bidx, (fp >> (15 * bb.bidx)) & 32767 AS bval
        |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bidx) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.fp AS fp1, y.fp AS fp2
        |  FROM bands x JOIN bands y
        |    ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id)
        |SELECT d1, d2, CAST(bit_count(xor(fp1, fp2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 5 ORDER BY d1, d2""".stripMargin,
    "q66_incremental_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split_regex(trim(text), '\s+'))), ' ')) AS fp
        |  FROM documents),
        |seen AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM fp WHERE doc_id % 2 = 1)
        |SELECT doc_id, lang, n_chars FROM batch
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM seen)
        |ORDER BY doc_id""".stripMargin,
    // components of the same pair graph via recursive transitive closure
    "q95_dedup_clusters" ->
      (s"WITH RECURSIVE $ccJaccardCtes\n" +
        """SELECT CAST(comp AS BIGINT) AS comp, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(node) AS BIGINT) AS checksum
          |FROM comp GROUP BY comp ORDER BY comp""".stripMargin),
    "q245_canonical_select" ->
      (s"WITH RECURSIVE $ccJaccardCtes,\n" +
        raw"""gt AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
           |  FROM documents),
           |gc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
           |  FROM gt GROUP BY doc_id, w),
           |gd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
           |  CAST(sum(c * c) AS BIGINT) AS sumsq FROM gc GROUP BY doc_id),
           |gg AS (SELECT doc_id,
           |  1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS q FROM gd),
           |lab AS (SELECT gg.doc_id, coalesce(c.comp, gg.doc_id) AS comp, gg.q
           |  FROM gg LEFT JOIN comp c ON c.node = gg.doc_id),
           |rk AS (SELECT comp, doc_id, q,
           |    row_number() OVER (PARTITION BY comp ORDER BY q DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY comp) AS nd
           |  FROM lab)
           |SELECT CAST(comp AS BIGINT) AS comp, CAST(nd AS BIGINT) AS n_docs,
           |  doc_id AS keep_id, CAST(q AS BIGINT) AS keep_q
           |FROM rk WHERE rn = 1 ORDER BY comp""".stripMargin),
    // same chain graph, components via recursive transitive closure
    "q111_cc_star_chains" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT doc_id AS d1, doc_id + 7 AS d2 FROM documents WHERE doc_id < 196),
        |edges AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a)
        |SELECT CAST(comp AS BIGINT) AS comp, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(node) AS BIGINT) AS checksum
        |FROM comp GROUP BY comp ORDER BY comp""".stripMargin,
    "q169_cluster_representatives" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, unnest(
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(generate_series(1, len(tk) - 2),
        |             i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [] END) AS ng
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS MATERIALIZED (
        |  SELECT d1, d2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = d1
        |  JOIN sizes sb ON sb.doc_id = d2
        |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2),
        |edges AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |cq AS (SELECT c.comp, c.node, d.n_chars
        |       FROM comp c JOIN documents d ON d.doc_id = c.node),
        |m AS (SELECT comp, max(n_chars) AS mx FROM cq GROUP BY comp)
        |SELECT CAST(cq.comp AS BIGINT) AS comp,
        |  CAST(min(cq.node) FILTER (WHERE cq.n_chars = m.mx) AS BIGINT) AS rep_doc,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(cq.node) AS BIGINT) AS checksum
        |FROM cq JOIN m ON m.comp = cq.comp
        |GROUP BY cq.comp ORDER BY cq.comp""".stripMargin,
    "q213_dedup_savings" ->
      raw"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
         |  FROM documents),
         |k AS (
         |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_doc FROM d),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |    CAST(sum(CASE WHEN doc_id <> keep_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |    CAST(sum(CASE WHEN doc_id <> keep_doc THEN n_tok ELSE 0 END) AS BIGINT) AS drop_tok
         |  FROM k GROUP BY source)
         |SELECT source, n_docs, sum_tok, n_dropped, drop_tok,
         |  (1000000 * drop_tok) // greatest(sum_tok, 1) AS savings_ppm
         |FROM g ORDER BY source""".stripMargin,
    "q198_fuzzy_names" ->
      """WITH recs AS (
        |  SELECT substring(p_name, 1, 2) || substring(p_name, 4) AS name
        |  FROM part WHERE p_partkey % 7 = 0
        |  UNION ALL SELECT p_name FROM part),
        |ents AS (
        |  SELECT DISTINCT name, substring(name, 1, 2) AS blk FROM recs)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
        |FROM ents a JOIN ents b ON a.blk = b.blk AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "q197_winnowing" ->
      raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         |g AS (
         |  SELECT doc_id, CASE WHEN len(tk) >= 3
         |    THEN list_transform(generate_series(1, len(tk) - 2),
         |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
         |    ELSE [] END AS grams
         |  FROM toks),
         |k AS (
         |  SELECT doc_id, grams, list_transform(grams, (x, i) ->
         |    list_reduce(list_transform(string_split(md5(x), '')[1:11],
         |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) * 65536 + (65535 - (i - 1))) AS keys
         |  FROM g),
         |m AS (
         |  SELECT doc_id, grams, CASE WHEN len(grams) = 0 THEN CAST([] AS BIGINT[])
         |    ELSE list_distinct(list_transform(
         |      generate_series(0, greatest(0, len(grams) - 4)),
         |      i -> list_min(keys[i+1 : i+4]))) END AS fps
         |  FROM k)
         |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         |  CAST(len(fps) AS BIGINT) AS n_fp,
         |  CAST(coalesce(list_sum(list_transform(fps, y -> y >> 16)), 0) AS BIGINT) AS fp_sum
         |FROM m ORDER BY doc_id""".stripMargin,
    "q195_normalized_dedup" ->
      raw"""WITH uni AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, upper(text) || ' !!  ' FROM documents),
         |norm AS (
         |  SELECT doc_id, md5(trim(regexp_replace(
         |    lower(regexp_replace(text, '[^\p{L}\p{N}\s]+', ' ', 'g')),
         |    '\s+', ' ', 'g'))) AS norm_md5
         |  FROM uni)
         |SELECT norm_md5, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc
         |FROM norm GROUP BY norm_md5 HAVING count(*) >= 2
         |ORDER BY norm_md5""".stripMargin,
    "q192_span_decontamination" ->
      raw"""WITH tw AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
         |bg AS (
         |  SELECT DISTINCT unnest(list_transform(
         |    generate_series(1, len(t) - 2),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
         |  FROM tw WHERE doc_id % 10 = 0 AND len(t) >= 3),
         |toks AS (
         |  SELECT doc_id, i, t[i] AS tok FROM tw, unnest(generate_series(1, len(t))) u(i)
         |  WHERE doc_id % 10 != 0),
         |starts AS (
         |  SELECT tw.doc_id, i
         |  FROM tw, unnest(generate_series(1, len(t) - 2)) u(i)
         |  JOIN bg ON bg.gram = t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         |  WHERE tw.doc_id % 10 != 0),
         |masked AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(i, i + 2)) AS i FROM starts),
         |j AS (SELECT toks.doc_id, toks.i, toks.tok, masked.i IS NOT NULL AS hit
         |      FROM toks LEFT JOIN masked
         |        ON masked.doc_id = toks.doc_id AND masked.i = toks.i)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  md5(coalesce(string_agg(CASE WHEN hit THEN NULL ELSE tok END, ' ' ORDER BY i), ''))
         |    AS clean_md5
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q190_phash_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |px AS (SELECT doc_id, x, y,
        |  (((doc_id // 4) * 31 + 7 * x + 13 * y) % 256 +
        |   CASE WHEN x = 0 AND y = 0 THEN doc_id % 4 ELSE 0 END) % 256 AS g
        |  FROM ids,
        |    unnest(generate_series(0, 31)) u(x),
        |    unnest(generate_series(0, 31)) v(y)),
        |tot AS (SELECT doc_id, sum(g) // 1024 AS mean FROM px GROUP BY doc_id),
        |cells AS (SELECT doc_id, y // 4 AS cy, x // 4 AS cx, sum(g) AS s
        |          FROM px GROUP BY doc_id, y // 4, x // 4),
        |bits AS (SELECT c.doc_id, cy, cx,
        |           CASE WHEN s // 16 >= mean THEN '1' ELSE '0' END AS b
        |         FROM cells c JOIN tot USING (doc_id)),
        |h AS (SELECT doc_id, string_agg(b, '' ORDER BY cy, cx) AS phash
        |      FROM bits GROUP BY doc_id)
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_doc
        |FROM h GROUP BY phash HAVING count(*) >= 2 ORDER BY phash""".stripMargin,
    "q177_ingest_novelty" ->
      raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
         |  FROM documents),
         |cg AS (
         |  SELECT DISTINCT unnest(list_transform(
         |    generate_series(1, len(t) - 2),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
         |  FROM toks WHERE doc_id % 2 = 0 AND len(t) >= 3),
         |bg AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(
         |    generate_series(1, len(t) - 2),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
         |  FROM toks WHERE doc_id % 2 = 1 AND len(t) >= 3),
         |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |      FROM bg GROUP BY doc_id),
         |k AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_known
         |      FROM bg JOIN cg ON bg.gram = cg.gram GROUP BY bg.doc_id)
         |SELECT c.doc_id, c.n_grams,
         |  CAST(coalesce(k.n_known, 0) AS BIGINT) AS n_known,
         |  (1000000 * (c.n_grams - coalesce(k.n_known, 0))) // c.n_grams AS novelty_ppm
         |FROM c LEFT JOIN k ON k.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin,
    // bucketed-snapshot wiring is row-identical to q66's plain formulation
    "q82_incremental_dedup_bucketed" ->
      """WITH fp AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split_regex(trim(text), '\s+'))), ' ')) AS fp
        |  FROM documents),
        |seen AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM fp WHERE doc_id % 2 = 1)
        |SELECT doc_id, lang, n_chars FROM batch
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM seen)
        |ORDER BY doc_id""".stripMargin,
    "q68_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) >= 5
        |      THEN list_transform(generate_series(1, len(tk) - 4),
        |             i -> array_to_string(tk[i:i+4], ' '))
        |      ELSE [] END)) AS ng
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |        FROM documents)),
        |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id < 5)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit
        |FROM g JOIN bench USING (ng) WHERE g.doc_id >= 5
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q162_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, unnest(
        |    CASE WHEN len(tk) >= 3
        |      THEN list_transform(generate_series(1, len(tk) - 2),
        |             i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [] END) AS ng
        |  FROM toks),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
        |  FROM g a JOIN g b ON a.ng = b.ng AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT d1, d2,
        |    round(CAST(i AS DOUBLE) / sa.sz, 6) AS c_fwd,
        |    round(CAST(i AS DOUBLE) / sb.sz, 6) AS c_bwd
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = d1
        |  JOIN sizes sb ON sb.doc_id = d2)
        |SELECT d1, d2, c_fwd, c_bwd FROM c
        |WHERE greatest(c_fwd, c_bwd) >= 0.8 ORDER BY d1, d2""".stripMargin,
    "q158_semdedup" -> {
      val fin = 3 // iters=2 → final assignment round
      s"""WITH ${kmeansCtesE(semDedupK, 2, 64)},
         |${kmeansAssign(fin, "c2", 64)},
         |sides AS (
         |  SELECT a.vec_id, a.cell, e.embedding,
         |    sqrt(list_sum(list_transform(generate_series(1, 64),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) AS nn
         |  FROM a$fin a JOIN embeddings e ON e.vec_id = a.vec_id),
         |drops AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM sides a JOIN sides b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(
         |      list_sum(list_transform(generate_series(1, 64),
         |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         |      / (a.nn * b.nn), 5) >= 0.45)
         |SELECT s.cell, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(s.vec_id) AS BIGINT) AS checksum
         |FROM sides s WHERE s.vec_id NOT IN (SELECT vec_id FROM drops)
         |GROUP BY s.cell ORDER BY s.cell""".stripMargin
    },
  )
}

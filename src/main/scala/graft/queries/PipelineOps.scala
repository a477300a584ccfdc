package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Multimodal, Similarity, TextAnalysis => TA}
import graft.tables.Tables

/** Training-data pipeline operators (the beyond-reference surface the engine
  * is for): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding cosine), ANN similarity search, text analysis, multimodal
  * plumbing. Queries whose operators use engine-internal hashes (murmur /
  * SipHash LSH buckets) have no SQL oracle — the driver records the weaker
  * rows-only check; their correctness is covered by ScalaTest against exact
  * recomputation. */
object PipelineOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Mojibake fixtures for q232, built from code points (ASCII source; the
    * SAME Scala constants interpolate into the DuckDB oracle, so the two
    * engines inject byte-identical corruption): a double-encoded e-acute +
    * right-quote tail and a U+FFFD replacement-char tail. */
  private def cp(c: Int): String = new String(Character.toChars(c))
  private val mojiTail1: String =
    s" encod${cp(0xC3)}${cp(0xA9)} don${cp(0xE2)}${cp(0x20AC)}${cp(0x2122)}t"
  private val mojiTail2: String = s" bad${cp(0xFFFD)}byte"

  /** Scratch-table hygiene for queries that build bucketed catalog tables:
    * drop the catalog entry AND any orphaned warehouse directory a previous
    * aborted run left behind (saveAsTable refuses a managed location that
    * exists without a catalog entry). */
  private def dropScratch(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    val d = new java.io.File(wh, name)
    if (d.exists) rm(d)
  }

  /** Evaluate `df` eagerly into a local-relation DataFrame (row order kept)
    * so scratch catalog tables can be dropped before the query returns —
    * they must not leak into the session catalog (SHOW TABLES / system
    * .databases goldens pin the catalog contents). Only for final rollups /
    * driver-bounded results, never data-sized frames. */
  private def materialize(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.collect().toSeq
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), df.schema)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_dedup_exact" -> ((s, dir) => {
      // Exact duplicate-row detection: one hash aggregation over all columns.
      Dedup.duplicateRowSummary(t(s, dir, "lineitem"))
    }),
    "q41_text_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      d.select(
        col("doc_id"),
        TA.tokenCount(col("text")).as("n_tok"),
        TA.alphaRatio(col("text")).as("alpha"),
        TA.stopwordRatio(col("text")).as("stop_ratio"),
        TA.meanTokenLen(col("text")).as("mtl"),
        TA.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),
    "q42_token_count" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      d.select(
        col("doc_id"),
        TA.tokenCount(col("text")).as("ws_tok"),
        TA.bpeishTokenCount(col("text")).as("bpe_tok"),
        length(col("text")).cast("long").as("n_chars_calc"))
        .orderBy(col("doc_id"))
    }),
    "q43_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(TA.langId(col("text")).as("pred"))
        .groupBy(col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("pred"))
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
      // MinHash(32) + LSH(8×4) candidates, exact-Jaccard verified on the
      // candidate set only. The murmur3 signatures aren't SQL-expressible,
      // but the OUTPUT is: on the planted near-dup corpus every true pair
      // has J ≥ 0.9, where a band match is ~66% per band → miss odds ~2e-4
      // per pair — so the verified candidate set EQUALS the exact
      // inverted-index answer (q45) and shares its full DuckDB oracle.
      // est_jaccard (signature-estimated) is covered in ExtSpec instead.
      Dedup.minhashLshPairs(t(s, dir, "documents"),
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
      // band-blocked candidate set), then broadcast the reduction under both
      // lookups; the candidate-pair stream picks up ng1/ng2 map-side and the
      // (hashed-long, array_distinct'd) gram column never shuffles.
      val candDocs = pairs.select(col("d1").as("doc_id"))
        .union(pairs.select(col("d2").as("doc_id"))).distinct()
      val ng = docs.join(candDocs, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          array_distinct(Dedup.wordNgramHashes(col("text"), 3)).as("ng"))
      pairs
        .join(broadcast(ng.select(col("doc_id").as("d1"), col("ng").as("ng1"))), Seq("d1"))
        .join(broadcast(ng.select(col("doc_id").as("d2"), col("ng").as("ng2"))), Seq("d2"))
        .withColumn("i", size(array_intersect(col("ng1"), col("ng2"))).cast("double"))
        .withColumn("jaccard",
          round(col("i") / (size(col("ng1")) + size(col("ng2")) - col("i")), 6))
        .select(col("d1"), col("d2"), col("hamming"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    }),
    "q48_ann_brute" -> ((s, dir) => {
      // Brute-force exact top-3 cosine neighbors for 10 query vectors.
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 3)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q49_ann_lsh" -> ((s, dir) => {
      // Production default (since round 7): the DETERMINISTIC-plane
      // multi-table LSH kernel — formula-derived integer hyperplanes over
      // floor(1e6·x) quantized embeddings, so candidates, ranks and sims
      // restate verbatim in DuckDB — at k = 5 over the second query decade
      // (a different working set than q103's k = 3 / vec_id < 10 twin).
      // Still LSH only: no brute-force rider in the benched query (an
      // O(|Q|·|corpus|) exact join inside the "approximate" path would BE
      // the cost at any real query volume). The seeded-hyperplane
      // margin-directed kernel (lshTopK) stays the spec-covered alternate
      // with its recall floor in ExtSpec; the driver entry no longer
      // ships it because its buckets are engine-private.
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKDeterministic(
          emb.filter(col("vec_id") >= 10 && col("vec_id") < 20), emb, k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q49b_ann_ivf" -> ((s, dir) => {
      // IVF ANN: nearest-centroid cells + multi-probe + in-cell re-rank.
      // Production plan only, as q49; recall floors + exact-at-full-probe
      // equality live in ExtSpec.
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 3,
          nlist = 16, nprobe = 4)
        .orderBy(col("q_id"), col("rnk"))
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
    "q103_ann_lsh_oracle" -> ((s, dir) => {
      // The oracle-expressible LSH-ANN twin of q49: 20 tables × 6
      // formula-derived integer hyperplanes over floor(1e6·x) quantized
      // embeddings, radius-1 multiprobe on the query side only, exact-cosine
      // re-rank. Bucket assignment is exact integer arithmetic → the full
      // operator (candidates, ranks, sims) is restated verbatim in DuckDB —
      // closing the "engine-internal seeded hyperplanes" gap for the LSH
      // operator class. Recall@3 = 0.667 vs brute force at sf0.01 (the
      // production margin-directed kernel's 0.68), asserted in ExtSpec.
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKDeterministic(emb.filter(col("vec_id") < 10), emb, k = 3)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q50_embedding_neardup" -> ((s, dir) => {
      // Embedding near-dup pairs via deterministic-plane LSH blocking
      // (public integer formula, radius-1 multiprobe), exact-cosine
      // verified — the oracle restates the ENTIRE operator (buckets,
      // probes, candidates, cosines), so engine and oracle agree
      // bit-for-bit at every verify scale. The pre-round-8 entry used the
      // seeded-hyperplane production kernel with q51's exact oracle — a
      // claim valid only while recall measured 1.0, which broke at sf0.1
      // (one pair at sim 0.456). The margin-directed production kernel
      // (embeddingNearDupPairs, auto-scaled planes) remains the 100 TB
      // path, spec-covered with a recall floor in ExtSpec.
      Similarity.neardupPairsDeterministic(t(s, dir, "embeddings"),
          threshold = 0.45)
        .orderBy(col("v1"), col("v2"))
    }),
    "q51_embedding_neardup_exact" -> ((s, dir) => {
      // Exact all-pairs variant (oracle-checkable): cosine ≥ 0.45.
      // Norms hoisted to the row side — one codegen'd dot per pair.
      import graft.ext.Vectors.{dot, norm}
      val e = t(s, dir, "embeddings")
      val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        norm(col("embedding")).as("n1"))
      val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        norm(col("embedding")).as("n2"))
      a.join(b, col("v1") < col("v2"))
        .withColumn("sim", round(dot(col("e1"), col("e2")) / (col("n1") * col("n2")), 5))
        .filter(col("sim") >= 0.45)
        .select(col("v1"), col("v2"), col("sim"))
        .orderBy(col("v1"), col("v2"))
    }),
    "q52_embedding_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), round(graft.ext.Vectors.norm(col("embedding")), 6).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(graft.functions.Stable.avgD(col("nrm")), 4).as("avg_norm"))
        .orderBy(col("label"))
    }),
    "q55_quality_quantiles" -> ((s, dir) => {
      // Exact percentile aggregation of the quality-score distribution per
      // language — the corpus-curation cut-line query (keep top-X% docs).
      val d = t(s, dir, "documents")
        .select(TA.langId(col("text")).as("lang"), TA.qualityScore(col("text")).as("q"))
      d.groupBy(col("lang")).agg(
          count(lit(1)).as("n"),
          round(expr("percentile(q, 0.5)"), 6).as("p50"),
          round(expr("percentile(q, 0.9)"), 6).as("p90"),
          round(expr("percentile(q, 0.99)"), 6).as("p99"))
        .orderBy(col("lang"))
    }),
    "q53_multimodal_meta" -> ((s, dir) => {
      // Binary payload column + metadata extraction (pure expressions).
      val d = Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100))
      d.select(
        col("doc_id"),
        Multimodal.payloadBytes(col("payload")).as("n_bytes"),
        ascii(col("text")).cast("long").as("first_cp"))
        .orderBy(col("doc_id"))
    }),
    "q54_multimodal_decode" -> ((s, dir) => {
      // Batch-wise decode via mapPartitions (codec STUBBED — FakeCodec);
      // resize planning + frame sampling as expressions. Every output column
      // is scalar (struct flattened, frame offsets serialized) so the driver
      // can sort/hash the result, and the FakeCodec arithmetic is
      // reproducible in the SQL oracle from octet_length alone.
      val d = Multimodal.decodeImages(
        Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100)))
      val resized = Multimodal.resizePlan(col("width"), col("height"), 256)
      d.select(
        col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("format"),
        resized.getField("width").cast("long").as("resized_w"),
        resized.getField("height").cast("long").as("resized_h"),
        concat_ws(",", Multimodal.frameSampleOffsets(col("payload"), 4)).as("frames"))
        .orderBy(col("doc_id"))
    }),
    "q105_multimodal_audio" -> ((s, dir) => {
      // The audio half of the multimodal contract: batch decode
      // (FakeAudioCodec — sanctioned stub, every field derived from
      // octet_length so the oracle recomputes it), duration math and the
      // fixed-window seek plan as exact integer expressions. Same
      // mapPartitions plumbing as q54; WavCodec (real JDK decode) runs the
      // identical contract in MultimodalSpec.
      val d = Multimodal.decodeAudio(
        Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100)))
      d.select(
        col("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("audio_channels").cast("long").as("audio_channels"),
        col("n_frames"),
        col("audio_format"),
        Multimodal.audioDurationMs(col("n_frames"), col("sample_rate")).as("dur_ms"),
        concat_ws(",", Multimodal.audioWindowStarts(col("n_frames"),
          col("sample_rate"), windowMs = 250)).as("win_starts"))
        .orderBy(col("doc_id"))
    }),
    "q106_multimodal_video" -> ((s, dir) => {
      // The video third of the multimodal contract: batch decode
      // (FakeVideoCodec stub — oracle-recomputable), resize planning on the
      // frame dims, duration from frames/fps, and evenly-spaced frame-index
      // sampling — all exact integer expressions. GifCodec (real JDK
      // multi-frame decode) runs the same contract in MultimodalSpec.
      val d = Multimodal.decodeVideo(
        Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100)))
      val resized = Multimodal.resizePlan(col("v_width"), col("v_height"), 384)
      d.select(
        col("doc_id"),
        col("v_width").cast("long").as("v_width"),
        col("v_height").cast("long").as("v_height"),
        col("v_frames").cast("long").as("v_frames"),
        col("fps_milli").cast("long").as("fps_milli"),
        col("video_format"),
        resized.getField("width").cast("long").as("resized_w"),
        resized.getField("height").cast("long").as("resized_h"),
        call_function("div", col("v_frames").cast("long") * 1000000L,
          col("fps_milli")).as("dur_ms"),
        concat_ws(",", Multimodal.frameIndexSample(col("v_frames"), 8)).as("sample_idx"))
        .orderBy(col("doc_id"))
    }),
    "q59_stratified_sample" -> ((s, dir) => {
      // Deterministic stratified sampling (domain/language mixing): keep-rate
      // per stratum, keyed by modular arithmetic on doc_id — reproducible,
      // engine-independent, a pure filter (no shuffle, no RNG state).
      val sampled = Curation.stratifiedSample(t(s, dir, "documents"),
        col("doc_id"), col("lang"), sampleRates, defaultPermille = 100)
      sampled.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("lang"))
    }),
    "q60_heavy_hitters" -> ((s, dir) => {
      // Exact heavy-hitter vocabulary: tokens in ≥ 30% of documents. The
      // result is vocabulary-sized; the plan is explode → two-phase count —
      // the same plan at 100 TB (partial counts combine map-side).
      Curation.heavyHitterTokens(t(s, dir, "documents"),
          col("doc_id"), col("text"), minDocFrac = 0.3)
        .orderBy(col("df").desc, col("tok"))
    }),
    "q61_tfidf" -> ((s, dir) => {
      // Top-3 TF-IDF terms per document (integer-scaled idf — exact in both
      // engines; ranking ties go to the term). df spans the WHOLE corpus;
      // the doc_id filter prunes only the tf/window side (pushes through the
      // window on its partition key and the tf aggregation on its group key).
      Curation.tfidfTopTerms(t(s, dir, "documents"), col("doc_id"), col("text"), k = 3)
        .filter(col("doc_id") < 50)
        .orderBy(col("doc_id"), col("rnk"))
    }),
    "q62_kmeans_assign" -> ((s, dir) => {
      // Semantic clustering: nearest-centroid assignment (cosine, ties to
      // the lowest centroid id) + per-cluster rollup. Centroids ride as
      // codegen literals — assignment is a shuffle-free map over the corpus.
      Similarity.centroidAssign(t(s, dir, "embeddings"), nlist = 8)
        .groupBy(col("cell")).agg(
          count(lit(1)).as("n"),
          round(graft.functions.Stable.avgD(col("sim")), 4).as("avg_sim"))
        .orderBy(col("cell"))
    }),
    "q63_repetition" -> ((s, dir) => {
      // Intra-document repetition signals (Gopher-style quality features):
      // top-token dominance + distinct-token ratio, two hash aggs.
      Curation.repetitionSignals(t(s, dir, "documents"), col("doc_id"), col("text"))
        .filter(col("doc_id") < 100)
        .orderBy(col("doc_id"))
    }),
    "q64_curation_pipeline" -> ((s, dir) => {
      // End-to-end curation: language-ID → quality gate → exact dedup on the
      // content fingerprint (keep lowest doc_id per fingerprint — one
      // shuffle) → stratified sample → corpus mixture summary. Every stage
      // is an operator proven above; this pins their composition.
      val d = t(s, dir, "documents").select(
          col("doc_id"),
          TA.langId(col("text")).as("plang"),
          TA.qualityScore(col("text")).as("q"),
          TA.contentFingerprint(col("text")).as("cfp"),
          TA.tokenCount(col("text")).as("n_tok"))
        .filter(col("q") >= 0.5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cfp")).orderBy(col("doc_id"))
      val deduped = d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      Curation.stratifiedSample(deduped, col("doc_id"), col("plang"),
          sampleRates, defaultPermille = 100)
        .groupBy(col("plang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("plang"))
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
    "q80_bucketed_join" -> ((s, dir) => {
      // Bucketed co-located join under the driver's gate: both sides are
      // written as 8-bucket catalog tables (the shuffle paid ONCE, at write
      // time — the 100 TB amortization for repeated fact⋈fact joins), then
      // joined on the bucket key with zero Exchange on either side
      // (ScaleOpsSpec asserts the plan). The result must equal the plain
      // join — the oracle.
      dropScratch(s, "q80_li_bkt")
      dropScratch(s, "q80_ord_bkt")
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      val ords = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      graft.tables.Bucketing.writeBucketed(li, "q80_li_bkt", 8, Seq("l_orderkey"))
      graft.tables.Bucketing.writeBucketed(ords, "q80_ord_bkt", 8, Seq("l_orderkey"))
      val out = graft.tables.Bucketing
        .bucketedJoin(s, "q80_li_bkt", "q80_ord_bkt", Seq("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          round(graft.functions.Stable.sumD(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("l_returnflag"))
      // 3-row final rollup — safe to materialize so the scratch tables drop.
      val result = materialize(s, out)
      s.sql("DROP TABLE IF EXISTS q80_li_bkt")
      s.sql("DROP TABLE IF EXISTS q80_ord_bkt")
      result
    }),
    "q100_chunking" -> ((s, dir) => {
      // Fixed-token chunking with overlap (64-token windows, 16 overlap):
      // per-chunk token counts and content hashes — the md5 pins the exact
      // slice boundaries cross-engine.
      Curation.chunkDocuments(t(s, dir, "documents").filter(col("doc_id") < 50),
          col("doc_id"), col("text"), chunkTokens = 64, overlapTokens = 16)
        .select(col("doc_id"), col("chunk_id"), col("chunk_tok"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),
    "q98_pack_concat" -> ((s, dir) => {
      // Shard materialization: per pack, member texts concatenated in id
      // order with an explicit separator. The pack hash pins the ORDERED
      // string aggregation cross-engine (DuckDB: string_agg ... ORDER BY);
      // collect_list alone would be partition-order-dependent — the sorted
      // struct collect is what makes it deterministic.
      Curation.packConcat(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"), capTokens = 4096)
        .select(col("stratum"), col("shard"), col("pack_id"),
          col("n_docs"), col("pack_tok"), md5(col("pack_text")).as("pack_md5"))
        .orderBy(col("stratum"), col("shard"), col("pack_id"))
    }),
    "q99_epoch_mixture" -> ((s, dir) => {
      // Up-weighting mixture: en 2.3 epochs, fr 1.5, de 0.5, default 1.0 —
      // full copies plus a deterministic fractional tail (same modular key
      // as the down-sampler). Rollup over the replicated rows.
      Curation.epochMixture(t(s, dir, "documents"), col("doc_id"), col("lang"),
          Map("en" -> 2300, "fr" -> 1500, "de" -> 500), defaultPermille = 1000)
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_rows"),
          sum(col("doc_id") * col("copy")).as("checksum"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("lang"))
    }),
    "q97_partitioned_read" -> ((s, dir) => {
      // Hive-style partitioned layout under the driver's gate: documents
      // rewritten partitioned by lang, then filtered on the partition
      // column — pruning happens at file-LISTING time (ScaleOpsSpec asserts
      // exactly one partition directory scans). Result must equal the same
      // filter over the unpartitioned original.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q97-part").toString
      try {
        graft.tables.Layout.writePartitioned(t(s, dir, "documents"), tmp, Seq("lang"))
        val out = s.read.parquet(tmp)
          .filter(col("lang") === "en")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("doc_id")).as("checksum"))
        materialize(s, out) // 1 row
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
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
    "q112_corpus_profile" -> ((s, dir) => {
      // Data-health profile of the documents table: per-column null rate,
      // exact cardinality, and native-typed min/max — one scan (the multi-
      // DISTINCT plans as a single Expand aggregation), unpivoted to a row
      // per column. Text profiles via its md5 (portable ordering; raw-text
      // min/max would hinge on collation). The report an ingest pipeline
      // checks before a batch trains.
      Curation.profile(
          t(s, dir, "documents").withColumn("text_md5", md5(col("text"))),
          Seq("doc_id", "lang", "source", "n_chars", "text_md5"))
        .orderBy(col("col_name"))
    }),
    "q114_kmeans" -> ((s, dir) => {
      // Distributed Lloyd k-means (k=8, 2 update rounds) over integer-
      // quantized embeddings — the IVF index-BUILD path q49b's fixed
      // centroids punt on. Exact integer arithmetic end to end (quantize →
      // squared-L2 assign → floor-div centroid update), so the whole
      // iterative fit is restated verbatim in the DuckDB oracle as unrolled
      // rounds. Per round: a literal-centroid map (no shuffle), ONE k-key
      // shuffle whose VecSumAggregator partials are dim-sized, a ≤k-row
      // collect. Assignments derive from the base scan each round — no
      // growing lineage.
      Similarity.kmeansFit(t(s, dir, "embeddings"), k = 8, iters = 2)
        .orderBy(col("vec_id"))
    }),
    "q115_dpp_join" -> ((s, dir) => {
      // Dynamic partition pruning under the driver's gate: lineitem is laid
      // out hive-partitioned by ship month, and the month filter arrives
      // only THROUGH A JOIN with a dim derived from orders (months whose
      // quarter is Q1) — no static predicate on the partition column exists
      // at plan time, so directory pruning must come from Spark's runtime
      // DPP subquery on the dim's broadcast. At 100 TB this is the
      // difference between scanning every date partition and scanning the
      // joined ones; ScaleOpsSpec asserts the dynamicpruning filter and the
      // partitions-read metric. Result must equal the plain semi-join over
      // the unpartitioned original.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q115-dpp").toString
      try {
        val li = t(s, dir, "lineitem")
          .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        graft.tables.Layout.writePartitioned(li, tmp, Seq("ship_month"))
        val months = t(s, dir, "orders")
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"),
            quarter(col("o_orderdate")).as("qtr"))
          .filter(col("qtr") === 1)
          .select("ship_month").distinct()
        val out = s.read.parquet(tmp).join(months, "ship_month")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_orderkey")).as("sum_ok"))
        materialize(s, out) // 1 row; lets the scratch dir drop immediately
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
    }),
    "q116_quality_classifier" -> ((s, dir) => {
      // Hashing-trick linear classifier scoring — the fastText SERVING
      // shape: unigram + adjacent-bigram features hash into 2^18 buckets
      // (no vocabulary join, constant memory at any corpus size), integer
      // formula weights, keep = margin >= 0. One codegen'd kernel pass at
      // scan speed, no shuffle; the margin is exact cross-engine integer
      // arithmetic so the per-doc scores carry a full DuckDB oracle.
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), TA.hashedLinearMargin(col("text")).as("margin"))
        .withColumn("keep", (col("margin") >= 0).cast("long"))
        .orderBy(col("doc_id"))
    }),
    "q117_range_join" -> ((s, dir) => {
      // Range-join ROLLUP with aggregate pushdown: 2-day activity windows
      // (first event onward) for every 20th user, attributed against ALL
      // events by time alone — no equi key, the join Spark would plan as a
      // nested loop. The pair-materializing band form (q165) is bound by
      // the true pair output, which grows quadratically when density
      // scales (ScaleGen replicates events into a fixed time span) — so
      // here the rollup pushes THROUGH the join: windows decompose into
      // day/hour/minute aligned bins meeting pre-aggregated per-bin
      // partials, and only sub-minute edge slivers touch raw points. Same
      // answer as the theta join (the oracle), never the pairs.
      val ev = t(s, dir, "events")
      val points = ev.select(col("event_id"), unix_micros(col("ts")).as("pt"))
      val wins = ev.filter(col("user_id") % 20 === 0)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("ws"))
        .select(col("user_id").as("w_user"), col("ws"),
          (col("ws") + lit(2L * 86400L * 1000000L)).as("we"))
      graft.ops.RangeJoin.multiLevelRangeAgg(points, "pt", Seq("event_id"),
          wins, Seq("w_user"), "ws", "we",
          widths = Seq(86400L * 1000000L, 3600L * 1000000L, 60L * 1000000L))
        .select(col("w_user"), col("n_points").as("n_events"),
          col("sum_event_id").as("checksum"))
        .orderBy(col("w_user"))
    }),
    "q178_line_boilerplate" -> ((s, dir) => {
      // Line-level boilerplate removal (the CCNet/RefinedWeb cleanup): a
      // line recurring at its source's own scale — ≥ max(2, ⌈4%·source
      // docs⌉) distinct docs — is struck everywhere and docs reassemble in
      // order. The synthetic corpus has no newlines, so both engines first
      // cut identical lines (8-word groups, one global regexp) — the
      // operator's df-count / strike / rebuild plumbing is what's under
      // test, and it sees real repeats (planted near-dups). The fraction
      // form keeps the threshold meaningful at ANY sf (fixed minDocs=2
      // would call every twice-pasted snippet in a 250-doc source
      // "boilerplate").
      val docs = t(s, dir, "documents").withColumn("lined",
        regexp_replace(trim(col("text")), "((?:\\S+ ){7}\\S+) ", "$1\n"))
      Curation.stripBoilerplateLinesFrac(docs, col("doc_id"), col("source"),
          col("lined"), sepRegex = "\n", sep = "\n", fracPpm = 40000L)
        .orderBy(col("doc_id"))
    }),
    "q179_waterfill_budget" -> ((s, dir) => {
      // Water-filling token budget across languages: the largest uniform
      // per-language cap whose Σ min(tokens, cap) fits 85% of the corpus's
      // tokens — small languages fully funded, the dominant one capped.
      // Closed-form window arithmetic on the |langs|-sized relation.
      Curation.waterFillAlloc(t(s, dir, "documents"), col("lang"),
          TA.tokenCount(col("text")), budgetPpm = 850000L)
        .withColumnRenamed("k", "lang")
        .orderBy(col("lang"))
    }),
    "q227_bm25_search" -> ((s, dir) => {
      // BM25 lexical retrieval: top-10 docs for three probe queries,
      // exact-integer Okapi scoring (integer-rational idf, cleared-
      // denominator saturation). Probe terms broadcast; only their
      // postings shuffle.
      val s2 = s; import s2.implicits._
      val probes = Seq((1L, "slow merge table"), (2L, "hash join fast"),
        (3L, "window sort batch")).toDF("q_id", "q_text")
      Curation.bm25TopK(t(s, dir, "documents"), col("doc_id"), col("text"),
          probes, col("q_id"), col("q_text"), k = 10)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q228_bradley_terry" -> ((s, dir) => {
      // Bradley-Terry arena over sources: consecutive doc pairs are
      // "matches" judged by gini diversity (ties and same-source pairs
      // drop), 3 exact-integer MM rounds turn the win table into
      // per-source strengths — the preference-pairs -> reward-strength
      // step of an RLHF data pipeline.
      val d = t(s, dir, "documents").select(
        org.apache.spark.sql.graft.Bridge.idiv(col("doc_id"), lit(2L))
          .as("pid"),
        pmod(col("doc_id"), lit(2L)).as("side"),
        col("source"), TA.giniDiversityPpm(col("text")).as("g"))
      val a = d.filter(col("side") === 0)
        .select(col("pid"), col("source").as("sa"), col("g").as("ga"))
      val b = d.filter(col("side") === 1)
        .select(col("pid"), col("source").as("sb"), col("g").as("gb"))
      val outcomes = a.join(b, "pid")
        .filter(col("sa") =!= col("sb") && col("ga") =!= col("gb"))
        .select(
          when(col("ga") > col("gb"), col("sa")).otherwise(col("sb"))
            .as("winner"),
          when(col("ga") > col("gb"), col("sb")).otherwise(col("sa"))
            .as("loser"))
      Curation.bradleyTerryStrength(outcomes, col("winner"), col("loser"),
          iters = 3)
        .orderBy(col("p"))
    }),
    "q229_constraint_audit" -> ((s, dir) => {
      // Deequ-style declarative data-quality audit over a deliberately
      // dirtied orders view (planted FK orphans, negated prices, nulled
      // statuses): five constraint families, row-wise ones folded into
      // ONE aggregation pass.
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(97L)) === 0, -col("o_custkey"))
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(pmod(col("o_orderkey"), lit(53L)) === 0,
          lit(null).cast("string"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(pmod(col("o_orderkey"), lit(31L)) === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      graft.ext.Quality.constraintAudit(o, Seq(
        graft.ext.Quality.Complete("status_complete", col("o_orderstatus"),
          minPpm = 990000L),
        graft.ext.Quality.Unique("orderkey_unique", Seq(col("o_orderkey"))),
        graft.ext.Quality.InRange("price_range", col("o_totalprice"),
          lit(0.0), lit(1000000.0)),
        graft.ext.Quality.InSet("status_domain", col("o_orderstatus"),
          Seq("O", "F", "P")),
        graft.ext.Quality.ForeignKey("custkey_fk", col("o_custkey"),
          t(s, dir, "customer"), col("c_custkey"))))
    }),
    "q230_annotator_agreement" -> ((s, dir) => {
      // Cohen's kappa between two deterministic "annotators" (char-band
      // vs token-band labelers — correlated but not identical): the
      // labeled-data QA gate, exact-integer ppm.
      val docs = t(s, dir, "documents")
      val la = when(col("n_chars") < 120, "short")
        .when(col("n_chars") < 200, "mid").otherwise("long")
      val lb = when(TA.tokenCount(col("text")) < 25, "short")
        .when(TA.tokenCount(col("text")) < 40, "mid").otherwise("long")
      graft.ext.Quality.cohenKappa(docs, la, lb)
    }),
    "q231_sft_turns" -> ((s, dir) => {
      // SFT conversation-structure audit: events as conversations
      // (user_id = conversation, click/view = user turns), validating
      // the starts-with-user strict-alternation contract and computing
      // loss-mask token splits per conversation.
      graft.ext.EventsOps.conversationAudit(t(s, dir, "events"),
          col("user_id"), unix_micros(col("ts")), col("event_id"),
          col("event_type").isin("click", "view"),
          TA.tokenCount(col("props")))
        .orderBy(col("conv_id"))
    }),
    "q232_mojibake_audit" -> ((s, dir) => {
      // Encoding-corruption audit: every 13th doc gets a double-encoded
      // UTF-8 tail, every 29th a replacement-char tail; the per-source
      // report must isolate exactly the planted corruption.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(13L)) === 0, lit(mojiTail1))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(29L)) === 0, lit(mojiTail2))
            .otherwise(lit(""))).as("text"))
      docs.select(col("doc_id"), col("source"),
          TA.mojibakeCount(col("text")).as("hits"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("hits") > 0).cast("long")).as("n_flagged"),
          sum(col("hits")).as("n_hits"),
          sum(when(col("hits") > 0, col("doc_id")).otherwise(0L))
            .as("checksum"))
        .withColumn("flagged_ppm", org.apache.spark.sql.graft.Bridge.idiv(
          col("n_flagged") * 1000000L, col("n_docs")))
        .orderBy(col("source"))
    }),
    "q233_tokenizer_fertility" -> ((s, dir) => {
      // Tokenizer-fairness audit: chars-per-BPE-token and BPE-tokens-
      // per-word by language under the 4-merge trained vocabulary — the
      // fertility skew that decides which languages pay more tokens for
      // the same text.
      val docs = t(s, dir, "documents")
      val wc = graft.ext.Bpe.wordCounts(docs, col("text"))
      val merges = graft.ext.Bpe.trainMerges(wc, nMerges = 4)
      val vocab = graft.ext.Bpe.encodeWords(wc, merges)
      docs.select(col("doc_id"), col("lang"),
          explode(TA.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .join(broadcast(vocab.select(col("w"), col("n_tok"))), "w")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("w")).cast("long")).as("n_chars"),
          sum(col("n_tok")).as("n_bpe_tok"))
        .withColumn("chars_per_tok_ppm",
          org.apache.spark.sql.graft.Bridge.idiv(
            col("n_chars") * 1000000L, col("n_bpe_tok")))
        .withColumn("tok_per_word_ppm",
          org.apache.spark.sql.graft.Bridge.idiv(
            col("n_bpe_tok") * 1000000L, col("n_words")))
        .orderBy(col("lang"))
    }),
    "q234_ndcg_audit" -> ((s, dir) => {
      // Ranking-quality audit: nDCG@10 of the q227 BM25 ranking, graded by
      // query-term coverage (n_terms) — the offline retrieval metric
      // computed with plan-time integer discounts so neither engine runs a
      // logarithm.
      val s2 = s; import s2.implicits._
      val probes = Seq((1L, "slow merge table"), (2L, "hash join fast"),
        (3L, "window sort batch")).toDF("q_id", "q_text")
      val ranked = Curation.bm25TopK(t(s, dir, "documents"), col("doc_id"),
        col("text"), probes, col("q_id"), col("q_text"), k = 10)
      Curation.ndcgAtK(ranked, col("q_id"), col("rnk"), col("n_terms"),
          k = 10)
        .orderBy(col("q_id"))
    }),
    "q235_rrf_fusion" -> ((s, dir) => {
      // Hybrid-retrieval fusion: reciprocal-rank fusion of two rankers over
      // the same probes — BM25 (idf + length norm) and raw term-frequency
      // coverage. RRF needs only the RANKS, which is why it's the fusion
      // rule that survives heterogeneous score scales.
      val s2 = s; import s2.implicits._
      val probes = Seq((1L, "slow merge table"), (2L, "hash join fast"),
        (3L, "window sort batch")).toDF("q_id", "q_text")
      val docs = t(s, dir, "documents")
      val bm25 = Curation.bm25TopK(docs, col("doc_id"), col("text"),
          probes, col("q_id"), col("q_text"), k = 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      val dt = docs.select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val qt = probes.select(col("q_id"),
        explode(TA.tokens(col("q_text"))).as("t")).distinct()
      val tfW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("s").desc, col("doc_id"))
      val tfRank = dt.join(broadcast(qt), Seq("t"))
        .groupBy(col("q_id"), col("doc_id")).agg(sum(col("tf")).as("s"))
        .withColumn("rnk", row_number().over(tfW).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      Curation.rrfFuse(Seq(bm25, tfRank), topK = 10)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q236_ece_calibration" -> ((s, dir) => {
      // Calibration audit: is the centroid classifier's distance-margin
      // confidence honest? Per-confidence-bucket accuracy vs mean
      // confidence and the corpus ECE, over the labeled embeddings.
      graft.ext.Similarity.calibrationProfile(
          t(s, dir, "embeddings"), k = 8, iters = 2, buckets = 10)
        .orderBy(col("bucket"))
    }),
    "q237_weighted_sample" -> ((s, dir) => {
      // Weighted sampling without replacement: 5 docs per language,
      // selection pressure proportional to n_chars — the
      // Efraimidis-Spirakis bottom-k shape with the deterministic integer
      // key ⌊h/w⌋ (seeded md5 fold), engine-exact and epoch-reseedable.
      Curation.weightedSample(t(s, dir, "documents"), col("lang"),
          col("doc_id"), col("n_chars"), k = 5, seed = "ws1")
        .withColumnRenamed("stratum", "lang")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("lang"), col("rnk"))
    }),
    "q238_kendall_tau" -> ((s, dir) => {
      // Ranker-agreement audit: Kendall's tau between the BM25 and raw-TF
      // rankings per probe query — the "is fusion worth it" companion to
      // q235 (tau near 1e6 means the rankers are redundant).
      val s2 = s; import s2.implicits._
      val probes = Seq((1L, "slow merge table"), (2L, "hash join fast"),
        (3L, "window sort batch")).toDF("q_id", "q_text")
      val docs = t(s, dir, "documents")
      val bm25 = Curation.bm25TopK(docs, col("doc_id"), col("text"),
          probes, col("q_id"), col("q_text"), k = 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      val dt = docs.select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val qt = probes.select(col("q_id"),
        explode(TA.tokens(col("q_text"))).as("t")).distinct()
      val tfW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("s").desc, col("doc_id"))
      val tfRank = dt.join(broadcast(qt), Seq("t"))
        .groupBy(col("q_id"), col("doc_id")).agg(sum(col("tf")).as("s"))
        .withColumn("rnk", row_number().over(tfW).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      Curation.kendallTau(bm25, tfRank).orderBy(col("q_id"))
    }),
    "q239_hits" -> ((s, dir) => {
      // HITS over the user -> event-type engagement bipartite graph: hub
      // users (broad heavy engagers) and authority event types, two
      // Kleinberg rounds of exact-integer mutual reinforcement.
      val e = t(s, dir, "events")
        .groupBy(col("user_id").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ext.GraphOps.hits(e, iters = 2)
        .orderBy(col("role"), col("node"))
    }),
    "q240_embedding_spectrum" -> ((s, dir) => {
      // Embedding-geometry audit: variance concentration of the corpus
      // embedding cloud — one covariance aggregation, then d²-bounded
      // integer power iteration on the driver.
      graft.ext.Similarity.spectralProfile(t(s, dir, "embeddings"),
        iters = 3)
    }),
    "q241_ngram_diversity" -> ((s, dir) => {
      // Distinct-1/2/3 diversity per source: the mode-collapse /
      // synthetic-data cliff detector.
      Curation.ngramDiversityProfile(t(s, dir, "documents"), col("source"),
          col("text"), maxN = 3)
        .withColumnRenamed("stratum", "source")
        .orderBy(col("source"), col("n"))
    }),
    "q242_vocab_concentration" -> ((s, dir) => {
      // Corpus vocabulary concentration: type/token ratio, hapax fraction,
      // top-100 head coverage — the Zipf-shape sanity row of a corpus
      // report.
      Curation.vocabularyConcentration(t(s, dir, "documents"), col("text"),
        topK = 100)
    }),
    "q243_winsorized_stats" -> ((s, dir) => {
      // Robust per-event-type value stats: means after clamping to the
      // [5%, 95%] exact rank bounds — tier-located, no per-row sort
      // window.
      graft.ext.EventsOps.winsorizedStats(t(s, dir, "events"),
          col("event_type"), col("value"))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))
    }),
    "q244_poisson_bootstrap" -> ((s, dir) => {
      // Metric uncertainty in one pass: 32 deterministic Poisson-bootstrap
      // replicates of the mean document length — the spread IS the CI.
      Curation.poissonBootstrap(t(s, dir, "documents"), col("doc_id"),
          col("n_chars"), b = 32, seed = "pb1")
        .orderBy(col("b"))
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
    "q246_length_bias" -> ((s, dir) => {
      // RLHF hygiene: in what fraction of q222's preference pairs is the
      // chosen side simply the longer document?
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TA.giniDiversityPpm(col("text")).as("g"))
      val pairs = Curation.preferencePairs(docs, col("doc_id"), col("lang"),
        col("g"), minGap = 100000L)
      Curation.lengthBiasAudit(pairs,
          t(s, dir, "documents").select(col("doc_id"),
            col("n_chars").as("len")))
        .orderBy(col("strat"))
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
    "q248_pack_utilization" -> ((s, dir) => {
      // How full are q67's 512-token packs per language — utilization and
      // overflow-pack counts, the feedback number before a shard write.
      Curation.packUtilization(t(s, dir, "documents"), col("doc_id"),
          col("text"), col("lang"), capTokens = 512)
        .withColumnRenamed("stratum", "lang")
        .orderBy(col("lang"))
    }),
    "q249_mixture_feasibility" -> ((s, dir) => {
      // Can the corpus serve an equal mix across sources without
      // upsampling? The binding source caps T*; everyone else reports
      // headroom.
      val toks = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(TA.tokenCount(col("text"))).as("avail_tok"))
      val ns = toks.agg(count(lit(1)).as("n_src"))
      val targets = toks.select(col("source")).crossJoin(broadcast(ns))
        .select(col("source"), org.apache.spark.sql.graft.Bridge.idiv(
          lit(1000000L), col("n_src")).as("target_ppm"))
      Curation.mixtureFeasibility(toks, targets)
        .orderBy(col("source"))
    }),
    "q251_fd_audit" -> ((s, dir) => {
      // Functional-dependency discovery checks: the key FD holds, the
      // cross-dimension ones must be REFUTED with exact blast radii —
      // certifying a false FD corrupts every downstream dimension table.
      graft.ext.Quality.fdAudit(t(s, dir, "documents"), Seq(
          ("doc_id->lang", Seq(col("doc_id")), col("lang")),
          ("lang->source", Seq(col("lang")), col("source")),
          ("lang,source->len_band", Seq(col("lang"), col("source")),
            org.apache.spark.sql.graft.Bridge.idiv(col("n_chars"),
              lit(100L)))))
        .orderBy(col("fd"))
    }),
    "q252_trend_slope" -> ((s, dir) => {
      // Per-event-type activity trend: exact OLS slope of hourly counts in
      // micro-events/hour — growing or dying, with no window and no sort.
      graft.ext.EventsOps.trendSlope(t(s, dir, "events"),
          col("event_type"), col("ts"))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))
    }),
    "q253_match_spans" -> ((s, dir) => {
      // WHERE do the near-dups overlap: per confirmed q45 pair, the
      // longest contiguous common token span via diagonal run chaining —
      // boilerplate overlap vs true copies, in tokens a reviewer can read.
      Dedup.matchSpanExplanation(t(s, dir, "documents"), col("doc_id"),
          col("text"), n = 3, minJaccard = 0.2)
        .orderBy(col("d1"), col("d2"))
    }),
    "q254_json_props" -> ((s, dir) => {
      // JSON side-channel audit: the $.k payload per event type, with
      // every 17th event's payload re-keyed (planted corruption) — the
      // audit must isolate it as missing, not crash on it.
      val ev = t(s, dir, "events").withColumn("props",
        when(pmod(col("event_id"), lit(17L)) === 0, lit("""{"other": 1}"""))
          .otherwise(col("props")))
      graft.ext.EventsOps.jsonPropProfile(ev, col("event_type"),
          col("props"), "$.k")
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))
    }),
    "q255_churn_hazard" -> ((s, dir) => {
      // Discrete life table over user lifetimes (days from first to last
      // activity): at-risk counts by reverse cumsum, exact per-day
      // hazards.
      graft.ext.EventsOps.churnHazard(t(s, dir, "events"), col("user_id"),
          col("ts"))
        .orderBy(col("t"))
    }),
    "q256_rbo_agreement" -> ((s, dir) => {
      // Rank-biased overlap between the BM25 and TF rankers: top-weighted
      // agreement that scores disjoint prefixes as real disagreement
      // (Kendall can't see docs only one ranker retrieved).
      val s2 = s; import s2.implicits._
      val probes = Seq((1L, "slow merge table"), (2L, "hash join fast"),
        (3L, "window sort batch")).toDF("q_id", "q_text")
      val docs = t(s, dir, "documents")
      val bm25 = Curation.bm25TopK(docs, col("doc_id"), col("text"),
          probes, col("q_id"), col("q_text"), k = 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      val dt = docs.select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val qt = probes.select(col("q_id"),
        explode(TA.tokens(col("q_text"))).as("t")).distinct()
      val tfW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("s").desc, col("doc_id"))
      val tfRank = dt.join(broadcast(qt), Seq("t"))
        .groupBy(col("q_id"), col("doc_id")).agg(sum(col("tf")).as("s"))
        .withColumn("rnk", row_number().over(tfW).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      Curation.rboAtK(bm25, tfRank, k = 10).orderBy(col("q_id"))
    }),
    "q257_fellegi_sunter" -> ((s, dir) => {
      // Probabilistic record linkage: (lang, 50-char band) blocks, three
      // field comparisons with plan-time integer log-odds, two-threshold
      // link / possible / non-link classification.
      val docs = t(s, dir, "documents")
      val idiv = org.apache.spark.sql.graft.Bridge.idiv _
      Dedup.fellegiSunter(docs, col("doc_id"),
          block = Seq(col("lang"), idiv(col("n_chars"), lit(50L))),
          fields = Seq(
            ("source", col("source"), 900L, 150L),
            ("gini_band", idiv(TA.giniDiversityPpm(col("text")),
              lit(50000L)), 800L, 100L),
            ("tok_band", idiv(TA.tokenCount(col("text")), lit(10L)),
              850L, 200L)),
          linkMicro = 4000000L, nonlinkMicro = 0L)
        .orderBy(col("cls"))
    }),
    "q258_term_movers" -> ((s, dir) => {
      // What changed between corpus halves: smoothed term-frequency lift,
      // support-gated, top-20 risers — term-level drift where q160 gives
      // one distance.
      val docs = t(s, dir, "documents")
      val half = docs.agg(max(col("doc_id")).as("m")).collect()(0).getLong(0) / 2
      Curation.termMovers(docs.filter(col("doc_id") <= half),
          docs.filter(col("doc_id") > half), col("text"), k = 20)
        .orderBy(col("rnk"))
    }),
    "q259_sim_histogram" -> ((s, dir) => {
      // Threshold calibration: where does the pair-similarity mass sit?
      // Exact-Jaccard deciles over the q45 pair inventory.
      Dedup.pairSimilarityHistogram(t(s, dir, "documents"), col("doc_id"),
          col("text"), n = 3, minJaccard = 0.1)
        .orderBy(col("sim_decile"))
    }),
    "q260_conversion_latency" -> ((s, dir) => {
      // How LONG does click -> purchase take: exact rank-based p50/p90 and
      // the exact mean, tier-located (no per-row sort window).
      graft.ext.EventsOps.conversionLatency(t(s, dir, "events"),
        fromType = "click", toType = "purchase")
    }),
    "q261_benford_audit" -> ((s, dir) => {
      // Were these values organic? First-significant-digit distribution of
      // event values vs Benford's law, per-digit deviations + TVD verdict.
      graft.ext.Quality.benfordAudit(t(s, dir, "events"), col("value"))
        .orderBy(col("digit"))
    }),
    "q262_centroid_shift" -> ((s, dir) => {
      // Embedding drift: per label, squared centroid distance between the
      // two vec_id-parity halves — the encoder/corpus drift tripwire that
      // fires before ANN recall decays.
      graft.ext.Similarity.centroidShift(t(s, dir, "embeddings"),
          col("label").cast("long"), pmod(col("vec_id"), lit(2L)))
        .withColumnRenamed("lab", "label")
        .orderBy(col("label"))
    }),
    "q263_did_uplift" -> ((s, dir) => {
      // Incident impact: did per-event value move differently for users
      // who hit a SEVERE error (value >= 300 -- rare enough to leave a
      // control group), net of the control group's own drift across the
      // same mid-time split?
      graft.ext.EventsOps.didUplift(t(s, dir, "events"), col("user_id"),
        col("ts"), col("value"),
        col("event_type") === "error" && col("value") >= 300.0)
    }),
    "q264_capture_recapture" -> ((s, dir) => {
      // How big is the dedup universe, from two 30% samples? Chapman
      // estimate + the exact truth and error the audit exists to measure.
      Dedup.captureRecapture(t(s, dir, "documents"), col("doc_id"),
        TA.contentFingerprint(col("text")), seedA = "cra", seedB = "crb",
        ppm = 300000L)
    }),
    "q265_transition_rules" -> ((s, dir) => {
      // Association rules over consecutive events: confidence and lift
      // per (from -> to), support-gated.
      graft.ext.EventsOps.transitionRules(t(s, dir, "events"),
          minSupport = 50L)
        .orderBy(col("from_type"), col("to_type"))
    }),
    "q266_opening_paths" -> ((s, dir) => {
      // How do users start: top-10 opening 4-event journeys (sorted-struct
      // collect, the q98 determinism rule).
      graft.ext.EventsOps.openingPaths(t(s, dir, "events"), col("user_id"),
          col("ts"), col("event_id"), col("event_type"), depth = 4, k = 10)
        .orderBy(col("rnk"))
    }),
    "q267_label_noise" -> ((s, dir) => {
      // Label-confusion hotspots: q193's kNN vote over the WHOLE corpus,
      // rolled up to (own_label -> voted_label) pairs where a confident
      // neighborhood (margin >= 60%) disagrees — the re-annotation
      // worklist, prioritized.
      val emb = t(s, dir, "embeddings")
      val idiv = org.apache.spark.sql.graft.Bridge.idiv _
      // Geometry follows the corpus (labelVoteAuto): fixed nlist=16 IVF
      // at gate scale, TRAINED cells at semDedupClustersFor-auto k above
      // 4096 rows — the fixed geometry measured 5x wall at 10x data
      // (candidates grow with cell size) and a bigger nlist is NOT the
      // fix (nlist=100 measured 158 s at 10x, the literal-centroid
      // codegen pathology); the trained path is q271's, measured linear.
      Similarity.labelVoteAuto(emb, k = 5)
        .filter(!col("agree"))
        .withColumn("margin_ppm",
          idiv(col("n_votes") * 1000000L, col("n_neighbors")))
        .filter(col("margin_ppm") >= 600000L)
        .groupBy(col("own_label").cast("long").as("own_label"),
          col("voted_label").cast("long").as("voted_label"))
        .agg(count(lit(1)).as("n_flagged"), sum(col("q_id")).as("checksum"))
        .orderBy(col("own_label"), col("voted_label"))
    }),
    "q268_order_reconcile" -> ((s, dir) => {
      // Accounting reconciliation: do lineitem totals explain
      // o_totalprice? The value-consistency audit the FK check can't see;
      // on this synthetic data the books do NOT balance, and the audit's
      // job is to say exactly how much.
      graft.ext.EventsOps.reconcileTotals(
        t(s, dir, "orders"), col("o_orderkey"), col("o_totalprice"),
        t(s, dir, "lineitem"), col("l_orderkey"),
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")))
    }),
    "q269_length_histogram" -> ((s, dir) => {
      // Log-scale length distribution per source: power-of-two token
      // buckets via binary-string length (the q261 no-float-log rule in
      // base 2) — the length profile a packing/budget choice reads first.
      val docs = t(s, dir, "documents")
      docs.select(col("source"),
          TA.log2Bucket(TA.tokenCount(col("text"))).as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("bucket"))
    }),
    "q270_text_hygiene" -> ((s, dir) => {
      // Basic text hygiene per source, with planted dirt the audit must
      // isolate: every 11th doc gains leading double-space, every 23rd an
      // NBSP, every 31st a BEL control char.
      val nbsp = new String(Character.toChars(0xA0))
      val bel = new String(Character.toChars(0x07))
      val docs = t(s, dir, "documents").select(col("source"),
        concat(
          when(pmod(col("doc_id"), lit(11L)) === 0, lit("  ")).otherwise(lit("")),
          col("text"),
          when(pmod(col("doc_id"), lit(23L)) === 0, lit(nbsp)).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(31L)) === 0, lit(bel)).otherwise(lit("")))
          .as("text"))
      docs.select(col("source"), TA.hygieneFlags(col("text")).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("h.empty")).as("n_empty"),
          sum(col("h.untrimmed")).as("n_untrimmed"),
          sum(col("h.multispace")).as("n_multispace"),
          sum(col("h.control")).as("n_control"),
          sum(col("h.nbsp")).as("n_nbsp"))
        .orderBy(col("source"))
    }),
    "q271_cell_label_noise" -> ((s, dir) => {
      // q267's scale path made real: label-confusion hotspots via TRAINED
      // cells at semDedupClustersFor-auto k (single-probe blocked kNN) —
      // per-cell work is targetCellSize-bounded, so the audit is linear
      // in the corpus where q267's fixed geometry was 5x at 10x.
      val emb = t(s, dir, "embeddings")
      val idiv = org.apache.spark.sql.graft.Bridge.idiv _
      Similarity.cellKnnLabelVote(emb, k = 5)
        .filter(!col("agree"))
        .withColumn("margin_ppm",
          idiv(col("n_votes") * 1000000L, col("n_neighbors")))
        .filter(col("margin_ppm") >= 600000L)
        .groupBy(col("own_label").cast("long").as("own_label"),
          col("voted_label").cast("long").as("voted_label"))
        .agg(count(lit(1)).as("n_flagged"), sum(col("q_id")).as("checksum"))
        .orderBy(col("own_label"), col("voted_label"))
    }),
    "q272_script_audit" -> ((s, dir) => {
      // Script-consistency audit with planted dirt: every 13th doc gains a
      // Cyrillic tail, every 29th a CJK one, every 37th Greek (a Latin
      // corpus with lang labels — the mismatch IS the signal: mislabel,
      // mojibake, or injection). Five codepoint-range deletions per row,
      // scan speed; rollup by (lang, detected foreign script).
      val docs = t(s, dir, "documents").select(col("lang"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(13L)) === 0, lit(" привет мир"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(29L)) === 0, lit(" 你好世界"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(37L)) === 0, lit(" αβγδ"))
            .otherwise(lit(""))).as("text"))
      docs.select(col("lang"), TA.scriptProfile(col("text")).as("p"))
        .groupBy(col("lang"), col("p.foreign").as("foreign_script"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("p.cyrillic") + col("p.greek") + col("p.arabic") +
            col("p.cjk")).as("n_foreign_chars"))
        .orderBy(col("lang"), col("foreign_script"))
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
    "q274_cluster_split" -> ((s, dir) => {
      // Leakage-PROOF train/eval split: documents inherit their near-dup
      // cluster's split (q95's components over the exact-Jaccard pairs),
      // so no pair can straddle the boundary — the fix whose absence
      // q209's audit detects. Rollup per split plus the proof column:
      // n_leaky_pairs computed over the very pair graph, 0 by construction.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        lit(1), n = 3, minJaccard = 0.2)
      val split = Curation.clusterAwareSplit(docs, col("doc_id"),
        pairs.select(col("d1"), col("d2")), trainPermille = 800)
      val leaks = pairs
        .join(split.select(col("doc_id").as("d1"), col("split").as("s1")),
          Seq("d1"))
        .join(split.select(col("doc_id").as("d2"), col("split").as("s2")),
          Seq("d2"))
        .agg(coalesce(sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L)),
          lit(0L)).as("n_leaky_pairs"))
      split.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("comp")).as("n_clusters"),
          sum(col("doc_id")).as("checksum"))
        .crossJoin(broadcast(leaks))
        .orderBy(col("split"))
    }),
    "q275_zipf_slope" -> ((s, dir) =>
      // Zipf rank-frequency slope over the top-1000 tokens, exact-integer
      // (log2 buckets via binary-string length, DECIMAL OLS moments) —
      // natural text reads ~ -1; template spam flattens the head.
      Curation.zipfSlope(t(s, dir, "documents"), col("text"), topK = 1000)),
    "q276_truncation_audit" -> ((s, dir) => {
      // Truncation audit: the synthetic corpus carries no terminal
      // punctuation, so every 7th doc gains a planted period — the audit
      // must count exactly the unplanted rows as cut-off (an extraction /
      // chunking bug signature when it clusters by source).
      val docs = t(s, dir, "documents").select(col("source"),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(col("text"), lit("."))).otherwise(col("text")).as("text"))
      docs.select(col("source"), TA.truncatedFlag(col("text")).as("tr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tr")).as("n_truncated"))
        .orderBy(col("source"))
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
    "q280_communities" -> ((s, dir) => {
      // Source-community detection: synchronous LPA (4 rounds, weight-
      // majority labels, min tie-break) over the q156 gram-overlap graph
      // — the mixture-design view that groups sources publishing the same
      // boilerplate before per-source caps treat them as independent.
      val docs = t(s, dir, "documents")
      val g = docs.select(col("source"),
          explode(array_distinct(Dedup.wordNgrams(col("text"), 5))).as("ng"))
        .distinct()
      val shared = g.as("a").join(g.as("b"),
          col("a.ng") === col("b.ng") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("w"))
      val edges = graft.ext.GraphOps.symmetricEdges(
        shared, col("sa"), col("sb"), col("w"))
      graft.ext.GraphOps.labelPropagation(edges, iters = 4)
        .orderBy(col("node"))
    }),
    "q281_skew_forecast" -> ((s, dir) => {
      // Shuffle-skew forecast with a planted hot key: every 10th user's
      // events remap to user 1, and the per-bucket load table (md5
      // partitioner surrogate at parts=16) must surface that bucket at
      // many-x the even share — the pre-join decision input for salting
      // and partition sizing. load_ppm = 1e6 means perfectly even.
      val idiv = org.apache.spark.sql.graft.Bridge.idiv _
      val ev = t(s, dir, "events").select(
        when(pmod(col("user_id"), lit(10L)) === 0, lit(1L))
          .otherwise(col("user_id")).as("user_id"))
      val buckets = graft.ops.Skew.shuffleSkewForecast(ev, col("user_id"),
        parts = 16)
      val tot = buckets.agg(sum(col("n_rows")).as("t"),
        count(lit(1)).as("nb"))
      buckets.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_rows"), col("n_keys"),
          idiv(col("n_rows") * col("nb") * 1000000L, col("t"))
            .as("load_ppm"))
        .orderBy(col("bucket"))
    }),
    "q282_lineage_chain" -> ((s, dir) => {
      // Tamper-evident commit lineage: a three-version table (init,
      // append, delete) emits its Merkle chain — per version the content
      // checksum and md5(version:n:checksum:prev) link; the oracle
      // recomputes the contents from the base table and chains the same
      // md5, so a single final hash verifies the whole history.
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q282")
      val root = "file://" + tmpRoot.toString + "/table"
      try {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        graft.tables.VersionedTable.init(s, root,
          docs.filter(col("doc_id") < 400))
        graft.tables.VersionedTable.commit(s, root)(cur =>
          cur.unionByName(docs.filter(col("doc_id") >= 400)))
        graft.tables.VersionedTable.commit(s, root)(cur =>
          cur.filter(col("doc_id") % 7 =!= 0))
        val out = graft.tables.VersionedTable.lineage(s, root,
          col("doc_id") * 1000003L + col("n_chars"))
        materialize(s, out.orderBy(col("version")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q286_column_diff" -> ((s, dir) => {
      // Column-level change attribution: a simulated migration drops
      // every 17th doc, adds 20 new ones, rewrites text for every 5th
      // and lang for every 9th — the audit must charge each column
      // exactly its own churn (the "one-field migration rewrote three"
      // detector).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val migrated = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(lit("v2 "), col("text")))
            .otherwise(col("text")).as("text"),
          when(col("doc_id") % 9 === 0, lit("xx")).otherwise(col("lang"))
            .as("lang"),
          col("n_chars"))
        .unionByName(docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
            col("lang"), col("n_chars")))
      graft.tables.Snapshots.columnDiff(docs, migrated, "doc_id",
          Seq("text", "lang", "n_chars"))
        .orderBy(col("column"))
    }),
    "q285_source_influence" -> ((s, dir) => {
      // Data valuation, leave-one-out form: per source, how far the
      // corpus quality mean moves if the source were dropped — a closed
      // form over per-source sums (one pass values every source; no
      // per-source re-scan), the prioritization number for pruning or
      // up-weighting sources before a mixture re-design.
      val docs = t(s, dir, "documents")
      Curation.sourceInfluence(docs, col("source"),
          floor(TA.qualityScore(col("text")) * 1000000).cast("long"))
        .orderBy(col("source"))
    }),
    "q283_rendezvous_shards" -> ((s, dir) => {
      // Consistent shard routing: HRW assignment of documents to 8 nodes,
      // re-assigned under 9 — per node, how many keys it holds and how
      // many MOVE when the cluster grows (expected ~1/9: rendezvous
      // hashing's minimal-disruption property, measured not assumed).
      val n8 = (0 until 8).map(i => s"n$i")
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val a8 = Curation.rendezvousAssign(docs, col("doc_id"), n8)
        .withColumnRenamed("node", "node8")
      val a9 = Curation.rendezvousAssign(docs, col("doc_id"), n8 :+ "n8")
        .withColumnRenamed("node", "node9")
      a8.join(a9, Seq("doc_id"))
        .groupBy(col("node8").as("node"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("node9") =!= col("node8"), 1L).otherwise(0L))
            .as("n_moved"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("node"))
    }),
    "q284_source_centroids" -> ((s, dir) => {
      // Semantic source-similarity matrix: cosine between per-label mean
      // embeddings (centroid never divides — cosine is scale-invariant,
      // so the integer SUM vectors are the whole state). The complement
      // of the q139 surface-overlap matrix for mixture design.
      Similarity.groupCentroidSimilarity(t(s, dir, "embeddings"),
          col("label"), col("embedding"))
        .orderBy(col("ga"), col("gb"))
    }),
    "q278_approx_groupby" -> ((s, dir) => {
      // Approximate GROUP BY with error bars (the AQP shape): per-flag
      // mean quantity from a deterministic 10% sample with a 16-replicate
      // Poisson-bootstrap envelope, audited against the exact truth —
      // the estimator a dashboard uses when the full scan is the cost.
      Curation.approxGroupMeans(t(s, dir, "lineitem"),
          group = col("l_returnflag"),
          key = concat_ws("_", col("l_orderkey"), col("l_linenumber")),
          metricMilli = floor(col("l_quantity") * 1000).cast("long"),
          ratePermille = 100, b = 16)
        .orderBy(col("g"))
    }),
    "q279_join_size_estimate" -> ((s, dir) => {
      // Optimizer-shaped audit: |orders ⋈ lineitem| estimated from two
      // CM sketches via the AGMS inner-product identity (min over rows of
      // Σ_b cntA·cntB — collisions only overcount), vs the exact truth.
      Curation.cmJoinSizeEstimate(
        t(s, dir, "orders"), col("o_orderkey"),
        t(s, dir, "lineitem"), col("l_orderkey"),
        depth = 4, width = 256)
    }),
    "q226_k_anonymity" -> ((s, dir) => {
      // Privacy-release audit: quasi-identifiers (lang, source,
      // 50-char length band) against a synthetic categorical secret
      // (doc_id % 7); groups under k=5 or with fewer than l=3 distinct
      // secrets put their rows at risk.
      val docs = t(s, dir, "documents")
      Curation.kAnonymityAudit(docs,
        Seq(col("lang"), col("source"),
          org.apache.spark.sql.graft.Bridge.idiv(col("n_chars"), lit(50L))
            .as("len_band")),
        pmod(col("doc_id"), lit(7L)), k = 5, l = 3)
    }),
    "q225_term_associations" -> ((s, dir) => {
      // "What goes with X": top-5 same-document associates by lift for
      // three probe terms, support >= 5 (lift on rare pairs is noise).
      val s2 = s; import s2.implicits._
      val probes = Seq("table", "slow", "merge").toDF("p")
      Curation.termAssociations(t(s, dir, "documents"), col("doc_id"),
          col("text"), probes, col("p"), k = 5, minSupport = 5L)
        .orderBy(col("probe"), col("rnk"))
    }),
    "q224_mixed_language" -> ((s, dir) => {
      // Mixed-language detection: every 10th doc gets a French tail
      // grafted on (the concatenation-artifact shape); the head/tail
      // language profile must flag exactly the grafted docs as mixed.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"),
            lit(" le la les de et un est le la de et est")))
          .otherwise(col("text")).as("text"))
      docs.select(col("doc_id"), TA.mixedLangProfile(col("text")).as("p"))
        .select(col("doc_id"), col("p.lang_head").as("lang_head"),
          col("p.lang_tail").as("lang_tail"),
          col("p.mixed").cast("long").as("mixed"))
        .groupBy(col("lang_head"), col("lang_tail"), col("mixed"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("checksum"))
        .orderBy(col("lang_head"), col("lang_tail"), col("mixed"))
    }),
    "q223_novelty_score" -> ((s, dir) => {
      // Memorization/originality audit: per doc, the ppm of its distinct
      // trigrams found in NO other document. Low novelty = boilerplate
      // or copy even when no single near-dup pair fires.
      Dedup.noveltyScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),
    "q222_preference_pairs" -> ((s, dir) => {
      // DPO-style preference pairs per language: gini diversity is the
      // quality score, half-shift pairing, pairs must clear a 100000-ppm
      // gap. Roll-up per lang pins pair counts and gap mass; a bounded
      // sample of pairs rides along via min/max checksums.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TA.giniDiversityPpm(col("text")).as("g"))
      Curation.preferencePairs(docs, col("doc_id"), col("lang"),
          col("g"), minGap = 100000L)
        .groupBy(col("strat"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("gap")).as("sum_gap"), min(col("gap")).as("min_gap"),
          sum(col("chosen_id") - col("rejected_id")).as("pair_checksum"))
        .orderBy(col("strat"))
    }),
    "q221_exact_split" -> ((s, dir) => {
      // Exact-ratio 80/10/10 split per source: counts are floor-exact per
      // stratum (not approximate like a modular-key split); checksums pin
      // the exact membership under the seeded order.
      Curation.exactRatioSplit(t(s, dir, "documents"), col("doc_id"),
          col("source"), trainPermille = 800, valPermille = 100)
        .groupBy(col("strat"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("checksum"))
        .orderBy(col("strat"), col("split"))
    }),
    "q220_quantile_normalize" -> ((s, dir) => {
      // Cross-source score calibration: every source's n_chars
      // distribution maps onto the pooled one; the per-source roll-up
      // shows the normalized ranges agree while raw ranges differ.
      val docs = t(s, dir, "documents")
      Curation.quantileNormalize(docs, col("doc_id"), col("source"),
          col("n_chars"))
        .groupBy(col("strat"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("x")).as("sum_raw"), sum(col("norm")).as("sum_norm"),
          min(col("norm")).as("min_norm"), max(col("norm")).as("max_norm"))
        .orderBy(col("strat"))
    }),
    "q218_rate_anomaly" -> ((s, dir) => {
      // Ingest-rate anomaly detection: hourly event counts per type,
      // robust-z (median/MAD, integer-exact) within each type, hours
      // with |z| > 4 flagged — the pipeline-health monitor that a mean/
      // stddev gate gets wrong whenever one burst drags the baseline.
      val ev = t(s, dir, "events")
      val hourly = ev.select(col("event_type"),
          org.apache.spark.sql.graft.Bridge.idiv(
            unix_micros(col("ts")), lit(3600000000L)).as("h"))
        .groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("n"))
      Curation.robustScores(hourly,
          col("h"), col("event_type"), col("n"))
        .withColumn("anomaly",
          (abs(col("z_ppm")) > 4000000L).cast("long"))
        .groupBy(col("strat"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("anomaly")).as("n_anomalous"),
          max(abs(col("z_ppm"))).as("max_abs_z_ppm"))
        .orderBy(col("strat"))
    }),
    "q217_freshness_decay" -> ((s, dir) => {
      // Recency-weighted event statistics: each event's weight halves per
      // 72h of age from the corpus max timestamp (exact integer shifts,
      // no float exp); per type, decayed mass vs raw counts shows how
      // stale each stream is.
      import graft.ext.EventsOps
      val ev = t(s, dir, "events")
      val ref = ev.agg(max(col("ts")).as("ref_ts"))
      ev.crossJoin(broadcast(ref))
        .select(col("event_type"),
          EventsOps.freshnessWeightPpm(col("ts"), col("ref_ts"),
            halfLifeHours = 72L).as("w_ppm"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("w_ppm")).as("decayed_mass_ppm"),
          max(col("w_ppm")).as("max_w"), min(col("w_ppm")).as("min_w"))
        .orderBy(col("event_type"))
    }),
    "q216_ann_recall_audit" -> ((s, dir) => {
      // Index QA: per query (vec_id < 10), the rank at which the q49b
      // IVF index (nlist 16, nprobe 4, k 3) surfaces the exact brute
      // top-1 neighbor, with integer reciprocal rank — recall measured,
      // not assumed.
      val emb = t(s, dir, "embeddings")
      Similarity.annRecallAudit(emb.filter(col("vec_id") < 10), emb,
          k = 3, nlist = 16, nprobe = 4)
        .orderBy(col("q_id"))
    }),
    "q215_cm_sketch" -> ((s, dir) => {
      // Count-min point-frequency estimates for a probe set (five corpus
      // terms + one absent term) against a 4x64 sketch of the token
      // stream, with the exact counts alongside: est >= true always, and
      // the absent key estimates whatever its collisions hold.
      val s2 = s; import s2.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(TA.tokens(col("text"))).as("w"))
      val sketch = Curation.cmSketch(toks, col("w"))
      val probes = Seq("table", "slow", "merge", "spark", "window",
        "zz-absent").toDF("w")
      val truth = toks.groupBy(col("w")).agg(count(lit(1)).as("true_cnt"))
      Curation.cmEstimate(sketch, probes, col("w"))
        .join(truth.withColumnRenamed("w", "probe"), Seq("probe"), "left")
        .select(col("probe"), col("est"),
          coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
        .withColumn("over", col("est") - col("true_cnt"))
        .orderBy(col("probe"))
    }),
    "q214_incremental_rollup" -> ((s, dir) => {
      // Incremental corpus-profile maintenance: yesterday's rollup
      // (docs < 400) merges with today's delta (docs >= 400) WITHOUT
      // rescanning yesterday — counts sum, and distinct-text counts ride
      // a mergeable KMV sketch (merge ≡ full-corpus sketch, exactly; the
      // oracle computes the single-pass form, so the equality check IS
      // the mergeability proof).
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") < 400)
      val delta = docs.filter(col("doc_id") >= 400)
      def counts(d: DataFrame) = d.groupBy(col("source").as("stratum"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val mergedCounts = counts(old).unionByName(counts(delta))
        .groupBy(col("stratum"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_chars")).as("sum_chars"))
      val mergedSketch = Curation.kmvMergeSketches(Seq(
        Curation.kmvStratumSketch(old, col("source"), col("text"), k = 16),
        Curation.kmvStratumSketch(delta, col("source"), col("text"), k = 16)), k = 16)
      mergedCounts
        .join(Curation.kmvSketchEstimate(mergedSketch, k = 16), Seq("stratum"))
        .orderBy(col("stratum"))
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
    "q212_garbage_gate" -> ((s, dir) => {
      // Binary-junk gate: every 5th doc gets a corrupted twin (control
      // bytes + a 30-char run appended); the printable-ratio + max-run
      // gate must flag exactly the twins. Grouped so the driver check
      // pins both signals' exact values in aggregate.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val junk = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit("\u0001\u0002\u0003\u0004\u0005"),
            lit("z" * 30)).as("text"))
      docs.unionByName(junk)
        .select(col("doc_id"),
          TA.printableRatioPpm(col("text")).as("printable_ppm"),
          TA.maxCharRun(col("text")).as("max_run"))
        .withColumn("keep",
          (col("printable_ppm") >= 990000L && col("max_run") <= 10L).cast("long"))
        .withColumn("is_twin", (col("doc_id") >= 1000000L).cast("long"))
        .groupBy(col("is_twin"), col("keep"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("printable_ppm")).as("sum_ppm"),
          sum(col("max_run")).as("sum_run"))
        .orderBy(col("is_twin"), col("keep"))
    }),
    "q211_lexicon_filter" -> ((s, dir) => {
      // Weighted-lexicon safety filter: a 5-term lexicon (including a
      // two-token phrase) scores every doc per category; the roll-up
      // counts flagged docs (category weight >= 5) per source.
      val s2 = s; import s2.implicits._
      val lex = Seq(
        ("slow", "latency", 5L), ("fast", "latency", 1L),
        ("merge", "ops", 2L), ("window", "ops", 1L),
        ("slow fast", "latency", 7L)
      ).toDF("term", "category", "weight")
      val docs = t(s, dir, "documents")
      Curation.lexiconHits(docs, col("doc_id"), col("text"),
          lex, col("term"), col("category"), col("weight"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"), col("category"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_hits")).as("n_hits"),
          sum(when(col("sum_weight") >= 5L, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy(col("source"), col("category"))
    }),
    "q210_phrase_search" -> ((s, dir) => {
      // Inverted-index phrase search: the first 6 tokens of docs 3/77/123
      // become query phrases; every occurrence in the corpus surfaces
      // with its token offset (self-matches at start 0 included). Gram
      // alignment + exact token-slice verify — hash collisions can't
      // false-positive.
      val docs = t(s, dir, "documents")
      val phrases = docs.filter(col("doc_id").isin(3L, 77L, 123L))
        .select(col("doc_id").as("phrase_id"),
          array_join(slice(TA.tokens(col("text")), 1, 6), " ").as("phrase"))
      Dedup.phraseSearch(docs, col("doc_id"), col("text"),
          phrases, col("phrase_id"), col("phrase"), n = 4)
        .orderBy(col("phrase_id"), col("doc_id"), col("start"))
    }),
    "q209_split_leakage" -> ((s, dir) => {
      // Leakage audit, naive vs keyed: a doc_id % 10 split scatters
      // exact-duplicate content across train/val/test (leaky groups > 0);
      // splitting on the FINGERPRINT's hash cannot (0 by construction —
      // the audit proves it rather than assumes it).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TA.contentFingerprint(col("text")).as("fp"))
      def splitOf(c: org.apache.spark.sql.Column) = when(pmod(c, lit(10L)) <= 7, "train")
        .when(pmod(c, lit(10L)) === 8, "val").otherwise("test")
      val naive = Curation.splitLeakageAudit(docs, col("fp"),
          splitOf(col("doc_id")))
        .withColumn("mode", lit("naive"))
      val keyed = Curation.splitLeakageAudit(docs, col("fp"),
          splitOf(pmod(conv(substring(col("fp"), 1, 11), 16, 10).cast("long"),
            lit(1000003L))))
        .withColumn("mode", lit("keyed"))
      naive.unionByName(keyed)
        .select(col("mode"), col("n_groups"), col("n_leaky_groups"),
          col("n_docs_at_risk"))
        .orderBy(col("mode"))
    }),
    "q208_snake_shards" -> ((s, dir) => {
      // Balanced training-shard assignment: snake-deal docs (by token
      // count desc) across 8 shards; per-shard totals must come out
      // near-equal (the spread law lives in ExtSpec). Checksums pin the
      // exact membership, not just the balance.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), TA.tokenCount(col("text")).as("n_tok"))
      Curation.snakeShardAssign(docs, col("doc_id"), col("n_tok"), nShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sum_tok"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("shard"))
    }),
    "q207_url_canonical" -> ((s, dir) => {
      // URL canonicalization: every doc yields two crawl variants of one
      // page (case/port/www/tracking-params/fragment/trailing-slash
      // noise vs the clean form); canonicalization must collapse each
      // pair. Rolled up per registered domain: raw vs canonical counts.
      val base = t(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"))
      val u1 = concat(lit("http://WWW.Site"), (col("doc_id") % 7).cast("string"),
        lit(".Ex"), (col("doc_id") % 3).cast("string"),
        lit(".COM:80/p/"), (col("doc_id") % 97).cast("string"),
        lit("/?utm_source=feed&id="), (col("doc_id") % 41).cast("string"),
        lit("&utm_campaign=x#sec2"))
      val u2 = concat(lit("http://site"), (col("doc_id") % 7).cast("string"),
        lit(".ex"), (col("doc_id") % 3).cast("string"),
        lit(".com/p/"), (col("doc_id") % 97).cast("string"),
        lit("?id="), (col("doc_id") % 41).cast("string"))
      base.select(u1.as("u")).unionByName(base.select(u2.as("u")))
        .select(TA.canonicalUrl(col("u")).as("cu"),
          TA.urlDomain(col("u")).as("dom"))
        .groupBy(col("dom"))
        .agg(count(lit(1)).as("n_raw"),
          countDistinct(col("cu")).as("n_canon"),
          min(col("cu")).as("sample_cu"))
        .orderBy(col("dom"))
    }),
    "q206_int8_quantize" -> ((s, dir) => {
      // Per-vector int8 quantization audit: scale, signed-code checksum,
      // and exact reconstruction error (max and total) for every
      // embedding — the 4× storage path, with the error-bound law
      // (max_err <= amax/127) pinned in ExtSpec.
      Similarity.int8QuantizeProfile(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))
    }),
    "q205_ccnet_buckets" -> ((s, dir) => {
      // CCNet head/middle/tail: per-language equal-count tertiles of the
      // interpolated trigram-LM fluency (most fluent third = head). Docs
      // with zero trigrams have no fluency and stay out (both engines).
      import graft.ext.NgramLm
      val docs = t(s, dir, "documents")
      val lm2 = NgramLm.probTable(docs, col("text"))
      val lm3 = NgramLm.probTable3(docs, col("text"))
      val scored = NgramLm.scoreInterpolated(docs, col("doc_id"), col("text"),
          lm3, lm2, mixPpm = 600000L)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      Curation.stratumEqualBuckets(scored, col("lang"), col("fluency3"),
          col("doc_id"), nBuckets = 3)
        .withColumn("bucket", when(col("bucket_idx") === 0, "head")
          .when(col("bucket_idx") === 1, "middle").otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("fluency3")).as("min_f"), max(col("fluency3")).as("max_f"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("lang"), col("bucket"))
    }),
    "q204_mmr_select" -> ((s, dir) => {
      // MMR diverse top-5 against query vector 0 from a top-30 candidate
      // pool: each pick maximizes 70%·relevance − 30%·max-sim-to-chosen,
      // in exact quantized-integer arithmetic; the oracle unrolls the
      // greedy chain as 5 CTE rounds.
      Similarity.mmrSelect(t(s, dir, "embeddings"), queryId = 0L,
          nCand = 30, k = 5)
        .orderBy(col("rank"))
    }),
    "q203_bitext_margin" -> ((s, dir) => {
      // Margin-based bitext mining: even vec_ids are the "source
      // language" mining batch (first 50), odd vec_ids the target corpus;
      // each source vector keeps its best-MARGIN (not best-dot) partner.
      val emb = t(s, dir, "embeddings")
      val xp = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 100)
      val yp = emb.filter(col("vec_id") % 2 === 1)
      Similarity.bitextMarginPairs(xp, yp, k = 4)
        .orderBy(col("x_id"))
    }),
    "q202_pseudonymize" -> ((s, dir) => {
      // Consistent pseudonymization: cohorts share PII values (email by
      // doc_id%50, URL by %30, account number by %20), so the SAME value
      // must map to the SAME typed token across docs — the md5-compare
      // pins that plus Java-regex/RE2 agreement and the longest-first
      // replace order.
      val piiText = concat(col("text"),
        lit(" contact user"), (col("doc_id") % 50).cast("string"),
        lit("@mail.example.com via https://ex.example/u/"),
        (col("doc_id") % 30).cast("string"),
        lit(" acct 99"), (col("doc_id") % 20).cast("string"), lit("001122"))
      val ps = TA.pseudonymizePii(piiText)
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), ps.as("p"))
        .select(col("doc_id"), md5(col("p")).as("ps_md5"),
          regexp_extract(col("p"), "<EMAIL_([a-p]+)>", 1).as("email_pseudo"))
        .orderBy(col("doc_id"))
    }),
    "q201_vocab_oov" -> ((s, dir) => {
      // Tokenizer-coverage audit rolled up per source: OOV mass against
      // the corpus's own top-16 vocabulary, plus how many docs would
      // fragment badly (> 25% OOV). The per-source corpus rate divides
      // SUMS (exact), not an average of per-doc ratios.
      val docs = t(s, dir, "documents")
      Curation.oovRatePpm(docs, col("doc_id"), col("text"), vocabSize = 16)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("n_oov")).as("sum_oov"),
          sum(when(col("oov_ppm") > 250000L, 1L).otherwise(0L)).as("n_frag"))
        .withColumn("corpus_oov_ppm",
          org.apache.spark.sql.graft.Bridge.idiv(
            lit(1000000L) * col("sum_oov"), col("sum_tok")))
        .orderBy(col("source"))
    }),
    "q200_dsir_reweight" -> ((s, dir) => {
      // DSIR-shaped selection: src0 is the target distribution, every
      // other source is the raw pool; hashed-token bucket ratios score the
      // pool and the top 50 most-target-like docs surface. Integer ppm
      // ratios (not float logs) keep both engines bit-identical.
      val docs = t(s, dir, "documents")
      Curation.dsirScorePpm(docs, col("doc_id"), col("text"),
          col("source") === "src0")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .filter(col("source") =!= "src0")
        .orderBy(col("score_ppm").desc, col("doc_id")).limit(50)
        .select(col("doc_id"), col("source"), col("n_tok"), col("score_ppm"))
    }),
    "q199_gini_diversity" -> ((s, dir) => {
      // Integer-exact token-diversity gate: Gini impurity in ppm (the
      // log-free entropy stand-in), rolled up per (lang, keep) so the
      // gate's corpus-level effect is visible. keep = gini >= 0.5.
      val docs = t(s, dir, "documents")
      docs.select(col("lang"), TA.tokenCount(col("text")).as("n_tok"),
          TA.giniDiversityPpm(col("text")).as("gini_ppm"))
        .withColumn("keep", (col("gini_ppm") >= 500000L).cast("long"))
        .groupBy(col("lang"), col("keep"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("gini_ppm")).as("sum_gini"))
        .orderBy(col("lang"), col("keep"))
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
    "q196_markup_strip" -> ((s, dir) => {
      // HTML → text extraction: each doc is wrapped in a deterministic web
      // page (style block, attributed tags, entities, a script whose body
      // contains `<`/`>`/`&&` that MUST NOT leak, a comment) and stripped
      // back. Both engines build the identical page and run the identical
      // regex/entity chain, so the recovered text (and its md5) is exact.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val page = concat(
        lit("<html><head><title>d</title><style type=\"text/css\">p { color: #333; }</style></head>" +
          "<body><h1 id=\"t\">Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p class=\"main\">"), col("text"),
        lit(" &amp; more &lt;raw&gt; &quot;quoted&quot;&nbsp;tail</p>" +
          "<script>if (a < b && c > d) { go(\"x\"); }</script>" +
          "<!-- hidden comment --></body></html>"))
      docs.select(col("doc_id"),
          TA.stripMarkup(page).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("n_chars_clean"))
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
    "q194_kmv_estimate" -> ((s, dir) => {
      // Distinct-count estimation from a 20-value KMV sketch vs the exact
      // answer — "size the dedup yield before paying for it". The md5-
      // derived 60-bit hashes replay bit-for-bit in the oracle.
      val docs = t(s, dir, "documents")
      Curation.kmvDistinctEstimate(docs, col("text"), k = 20)
        .crossJoin(docs.agg(count_distinct(col("text")).as("n_exact")))
        .withColumn("err_ppm",
          expr("(1000000 * abs(n_est - n_exact)) div n_exact"))
    }),
    "q193_knn_label_vote" -> ((s, dir) => {
      // Label-noise detection: each of 20 vectors' 5 nearest neighbors
      // (deterministic IVF) vote with their labels; disagreement with the
      // own label flags the row for re-annotation. Votes are an nq·k-sized
      // aggregation on top of q49b's probe join.
      val emb = t(s, dir, "embeddings")
      Similarity.knnLabelVote(emb.filter(col("vec_id") < 20), emb, k = 5)
        .orderBy(col("q_id"))
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
    "q191_robust_outliers" -> ((s, dir) => {
      // Hampel outlier report: per-source median/MAD z-scores on doc
      // length, exact integer arithmetic (×4/×8 scaling absorbs the
      // interpolated quantiles); report docs beyond ±2 MADs.
      Curation.robustScores(t(s, dir, "documents"), col("doc_id"),
          col("source"), col("n_chars"))
        .filter(abs(col("z_ppm")) >= 2000000L)
        .withColumnRenamed("strat", "source")
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
    "q189_mixture_reweight" -> ((s, dir) => {
      // Multiplicative-weights mixture tuning (the DoReMi shape, integer
      // surrogate): reward = each language's type-token-ratio ppm, 3
      // rounds at η = 0.5 — diverse languages compound share, templated
      // ones decay. One corpus pass for rewards; the update runs on the
      // |langs|-sized relation.
      val docs = t(s, dir, "documents")
      val rewards = docs
        .select(col("lang"), explode(TA.tokens(col("text"))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("lang")).agg(
          expr("(1000000 * count(1)) div sum(c)").as("reward_ppm"))
      Curation.mixtureReweight(rewards, col("lang"), col("reward_ppm"),
          rounds = 3, etaPpm = 500000L)
        .withColumnRenamed("k", "lang").withColumnRenamed("r", "reward_ppm")
        .orderBy(col("lang"))
    }),
    "q188_trigram_lm" -> ((s, dir) => {
      // Interpolated char-trigram fluency (Jelinek-Mercer fixed-weight mix
      // with the suffix-bigram backoff, λ = 0.6): the 20 least-fluent docs
      // — the higher-order CCNet filter. Both model tables are
      // charset-bounded broadcasts.
      import graft.ext.NgramLm
      val docs = t(s, dir, "documents")
      val lm2 = NgramLm.probTable(docs, col("text"))
      val lm3 = NgramLm.probTable3(docs, col("text"))
      NgramLm.scoreInterpolated(docs, col("doc_id"), col("text"),
          lm3, lm2, mixPpm = 600000L)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("m"), col("fluency3"))
        .orderBy(col("fluency3"), col("doc_id")).limit(20)
    }),
    "q187_stratified_priority" -> ((s, dir) => {
      // Priority sampling PER LANGUAGE: 20 token-weighted draws from each
      // lang with that stratum's own τ and HT weights — a token-honest
      // sample of every language in one stratum-keyed window pass.
      Curation.prioritySampleByStratum(t(s, dir, "documents"),
          col("doc_id"), col("lang"), TA.tokenCount(col("text")), k = 20)
        .withColumnRenamed("strat", "lang")
        .orderBy(col("lang"), col("id"))
    }),
    "q186_source_diversity" -> ((s, dir) => {
      // Whole-source diversity health: type-token ratio, trigram
      // diversity, top-token dominance per source — the collapsed-source
      // detector (per-doc signals can't see one template stamped a
      // million times).
      Curation.sourceDiversity(t(s, dir, "documents"),
          col("source"), col("text"))
        .orderBy(col("src"))
    }),
    "q185_priority_sample" -> ((s, dir) => {
      // Token-weighted sampling without replacement (priority sampling,
      // Duffield-Lund-Thorup): top-50 hash-deterministic priorities w/u,
      // with Horvitz-Thompson adjusted weights ŵ = max(w, τ) so token
      // totals estimated from the sample stay honest. Bounded TakeOrdered,
      // no global sort.
      Curation.prioritySample(t(s, dir, "documents"), col("doc_id"),
          TA.tokenCount(col("text")), k = 50)
        .orderBy(col("id"))
    }),
    "q184_matryoshka_rerank" -> ((s, dir) => {
      // Two-stage truncated-prefix ANN (the MRL serving shape): candidates
      // by 16-dim prefix cosine (¼ of the dot work and the hot bytes),
      // exact 64-dim re-rank on the top-20 only. Fully deterministic →
      // fully oracle-expressible.
      val emb = t(s, dir, "embeddings")
      Similarity.truncatedRerank(emb.filter(col("vec_id") < 10), emb,
          k = 3, dPrefix = 16, kCand = 20)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q183_filter_attrition" -> ((s, dir) => {
      // The curation-cascade funnel: which gate drops how much, charged to
      // the FIRST failing rule — one codegen'd CASE pass over the corpus,
      // funnel math on the |rules|-sized relation.
      Curation.filterAttrition(t(s, dir, "documents"), Seq(
          "lang_allowed" -> col("lang").isin("en", "es", "de", "fr"),
          "min_tokens" -> (TA.tokenCount(col("text")) >= 25),
          "max_chars" -> (col("n_chars") <= 380)))
        .orderBy(col("rule_id"))
    }),
    "q182_waterfill_sample" -> ((s, dir) => {
      // The water-fill level driving selection: per-language allocations
      // from q179's closed form, then each language keeps its largest-docs-
      // first prefix that fits ITS allocation — mixture flattening and
      // best-of-source selection in one deterministic integer pipeline.
      Curation.waterFillSample(t(s, dir, "documents"), col("doc_id"),
          col("text"), col("lang"), col("n_chars"), budgetPpm = 850000L)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    "q180_hard_negatives" -> ((s, dir) => {
      // IVF hard-negative mining: per query vector, the top-3 most-similar
      // corpus vectors of a DIFFERENT label within the probed cells — the
      // contrastive-training negatives that are near misses of the wrong
      // class. Deterministic IVF (q49b's construction) + one label
      // predicate, so the full operator is oracle-expressible.
      val emb = t(s, dir, "embeddings")
      Similarity.ivfHardNegatives(emb.filter(col("vec_id") < 10), emb, k = 3)
        .orderBy(col("q_id"), col("rnk"))
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
    "q176_length_batching" -> ((s, dir) => {
      // Length-bucketed dynamic batching (the loader-throughput knob):
      // power-of-two length bands via length(bin(n)) — highest set bit,
      // no float log2 — then sharded windows chop each band into
      // batchSize runs; per-batch padding waste = n·max − sum is the
      // metric the bucketing minimizes. Deterministic end to end, one
      // (bucket, shard)-keyed window shuffle.
      Curation.lengthBucketBatches(t(s, dir, "documents"),
          col("doc_id"), col("text"), batchSize = 8, shards = 4)
        .orderBy(col("bucket"), col("shard"), col("batch"))
    }),
    "q175_hierarchical_cells" -> ((s, dir) => {
      // The unbounded-k cell assignment (the construction semDedup's
      // 65536-cluster cap points at): fine centroids live in a TABLE and
      // reach points through a group-keyed join — broadcast while small,
      // SHUFFLED when huge, so no JVM ever holds all k centroids; points
      // pick a coarse group through the literal kernels, then
      // NearestInFlat argmins inside the group's packed row. IVF-style
      // two-level semantics (nprobe=1), deterministic ties, every step
      // integer — the oracle replays coarse means, coarse argmin, and
      // in-group argmin verbatim.
      Similarity.hierarchicalAssign(t(s, dir, "embeddings"),
          k = 24, cellsPerGroup = 6)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"),
          sum(col("vec_id")).as("checksum"), min(col("dist")).as("min_dist"))
        .orderBy(col("cell"))
    }),
    "q174_per_group_probe" -> ((s, dir) => {
      // One trained model PER LANGUAGE in a single pass: the Gram
      // aggregation shuffles once keyed by lang; the driver solves
      // |langs| tiny systems (bounded by group cardinality, never corpus
      // size). Degenerate groups yield NULL weights instead of failing
      // the fleet. Same exact-integer arithmetic as q172, replayed
      // group-wise by the oracle.
      graft.ext.Regression.fitLinearPpmByGroup(s, t(s, dir, "documents"),
          col("lang"),
          Seq("bias" -> lit(1L),
            "ntok" -> TA.tokenCount(col("text")),
            "stop" -> TA.stopTokenCount(col("text"))),
          col("n_chars"))
        .orderBy(col("grp"))
    }),
    "q173_probe_residual_gate" -> ((s, dir) => {
      // Train → score → gate, fully under the oracle: fit the q172 probe,
      // then flag documents whose n_chars deviates from what their token
      // stats predict (truncated/garbage docs read as large residuals).
      // The weights ride back as literals — scoring is a pure codegen'd
      // projection at scan speed, the fastText serving shape with a
      // corpus-trained model.
      val docs = t(s, dir, "documents")
      val feats = Seq("bias" -> lit(1L),
        "ntok" -> TA.tokenCount(col("text")),
        "stop" -> TA.stopTokenCount(col("text")))
      val w = graft.ext.Regression.fitWeights(s, docs, feats, col("n_chars")).toMap
      val pred = lit(w("bias")) +
        lit(w("ntok")) * TA.tokenCount(col("text")) +
        lit(w("stop")) * TA.stopTokenCount(col("text"))
      docs.select(col("doc_id"),
          (lit(1000000L) * col("n_chars") - pred).as("resid_ppm"))
        .withColumn("keep", abs(col("resid_ppm")) <= lit(20000000L))
        .filter(col("doc_id") < 100)
        .orderBy(col("doc_id"))
    }),
    "q172_linear_probe" -> ((s, dir) => {
      // Supervised probe TRAINING, closed-form: fit n_chars ≈ w₀ + w₁·n_tok
      // + w₂·n_stop over the whole corpus by exact integer normal
      // equations. ONE aggregation pass builds the Gram matrix (d²+d+1
      // numbers to the driver, corpus-size-independent); Cramer solves in
      // BigInt; weights land as truncated ppm — the oracle replays the
      // identical HUGEINT arithmetic, so a TRAINED MODEL sits under the
      // cross-engine gate (the non-iterative sibling of the q114 k-means
      // chain).
      graft.ext.Regression.fitLinearPpm(s, t(s, dir, "documents"),
        Seq("bias" -> lit(1L),
          "ntok" -> TA.tokenCount(col("text")),
          "stop" -> TA.stopTokenCount(col("text"))),
        col("n_chars"))
    }),
    "q171_source_overlap" -> ((s, dir) => {
      // Corpus-level contamination matrix: exact trigram-shingle Jaccard
      // between every source PAIR — which crawls/feeds duplicate each
      // other, before any per-document dedup. One (source, gram) distinct
      // + a hash-keyed self-join; output bounded by sources², never corpus
      // size. Grams ride as XXH64 longs (only counts surface — q45's
      // collision argument); the oracle recounts the string sets.
      Dedup.groupShingleOverlap(t(s, dir, "documents"),
          col("source"), col("text"), n = 3)
        .orderBy(col("s1"), col("s2"))
    }),
    "q170_repetition_signals" -> ((s, dir) => {
      // Gopher/MassiveText repetition rules (Rae et al. 2021): top-word
      // fraction, top-bigram fraction, type/token ratio, repeated-trigram
      // positional cover, and the composite all-integer keep gate. Pure
      // per-row sorted-fold HOF expressions — zero shuffle, scan speed at
      // any corpus size (q63 computes the unigram subset by exploded
      // aggregation: two shuffles; this is the scan-speed superset). The
      // oracle recomputes every count by exploding to (doc, pos, token)
      // rows, so the signals are cross-engine exact.
      val d = t(s, dir, "documents").filter(col("doc_id") < 150)
      d.select(col("doc_id"),
          TA.tokenCount(col("text")).as("n_tok"),
          TA.distinctTokenCount(col("text")).as("n_distinct"),
          TA.topTokenCount(col("text")).as("top1_cnt"),
          TA.topBigramCount(col("text")).as("top2_cnt"),
          TA.repeatedTrigramCover(col("text")).as("rep3_cover"),
          TA.repetitionKeep(col("text")).as("keep"))
        .orderBy(col("doc_id"))
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
    "q168_temperature_mixture" -> ((s, dir) => {
      // Temperature mixture (proportions ∝ √n — the Gopher/LLaMA mixture
      // knob): small sources boost, dominant sources damp. All-integer
      // thresholds over floor(sqrt(count)) weights and the deterministic
      // sample-key hash — the oracle replays the identical arithmetic, so
      // the kept SET (not just counts) is cross-engine exact.
      Curation.temperatureMixture(t(s, dir, "documents"),
          col("doc_id"), col("source"), targetRows = 600L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("checksum"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),
    "q167_version_diff" -> ((s, dir) => {
      // Time travel + version diff over the commit log: v1 = the corpus,
      // v2 = every 3rd doc's text rewritten (upsert), v3 = every 13th doc
      // dropped (retention). diffByFingerprint(v1, v3) — both read by
      // VERSION, not by pointer — classifies every key; the per-status
      // rollup is the "what moved since the training run" report. The
      // oracle restates the membership/modification arithmetic directly.
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q167")
      val root = "file://" + tmpRoot.toString + "/table"
      try {
        val VT = graft.tables.VersionedTable
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        VT.init(s, root, docs)
        graft.tables.Snapshots.upsertByKey(s, root,
          docs.filter(col("doc_id") % 3 === 0)
            .withColumn("text", concat(lit("w"), col("doc_id"))), "doc_id")
        graft.tables.Snapshots.deleteWhere(s, root, col("doc_id") % 13 === 0)
        val d = graft.tables.Snapshots.diffByFingerprint(
          VT.readVersion(s, root, 1L), VT.readVersion(s, root, 3L),
          "doc_id", md5(col("text")))
        materialize(s, d.groupBy(col("status"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("checksum"))
          .orderBy(col("status")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q165_range_join_pairs" -> ((s, dir) => {
      // The pair-materializing binned range join (when the caller needs
      // the pairs themselves, not a rollup): bin width auto-scales with
      // point density (binWidthFor — granularity follows the data, the LSH
      // planes rule), so per-bin candidate enumeration stays bounded as
      // the corpus densifies. Windows for every 40th user to keep this
      // distinct from q117's set; rolled up only to keep the oracle
      // compact — the operator under test emits pairs.
      val ev = t(s, dir, "events")
      val points = ev.select(col("event_id"), unix_micros(col("ts")).as("pt"))
      val wins = ev.filter(col("user_id") % 40 === 0)
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("ws"))
        .select(col("user_id").as("w_user"), col("ws"),
          (col("ws") + lit(2L * 86400L * 1000000L)).as("we"))
      val bin = graft.ops.RangeJoin.binWidthFor(points, "pt")
      graft.ops.RangeJoin.binnedRangeJoin(points, "pt", wins, "ws", "we", bin)
        .groupBy(col("w_user"))
        .agg(count(lit(1)).as("n_events"), sum(col("event_id")).as("checksum"))
        .orderBy(col("w_user"))
    }),
    "q166_versioned_upsert" -> ((s, dir) => {
      // The object-store-safe commit protocol under the gate: a versioned
      // table (pointer-swap commits — data dir + atomic marker PUT, zero
      // renames) runs the maintenance quartet init → upsert → retention
      // delete → compact, then vacuums to the current version. The rollup
      // reads ONLY the committed pointer; the oracle restates the
      // membership arithmetic of the surviving version. file:// scheme
      // pins the Hadoop FileSystem path — the same code hdfs:/s3a: take.
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q166")
      val root = "file://" + tmpRoot.toString + "/table"
      try {
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars"))
        graft.tables.VersionedTable.init(s, root,
          docs.filter(col("doc_id") % 6 =!= 0))
        val updates = docs.filter(col("doc_id") % 4 === 0)
          .withColumn("text", concat(lit("v"), col("doc_id")))
          .withColumn("n_chars", length(col("text")).cast("long"))
        graft.tables.Snapshots.upsertByKey(s, root, updates, "doc_id")
        graft.tables.Snapshots.deleteWhere(s, root, col("doc_id") % 11 === 0)
        graft.tables.Layout.compact(s, root, targetBytes = 128L << 20)
        graft.tables.VersionedTable.vacuum(s, root, keep = 1)
        val out = graft.tables.Snapshots.readSnapshot(s, root).agg(
          count(lit(1)).as("n"),
          sum(col("doc_id")).as("sum_id"),
          sum(when(col("text") === concat(lit("v"), col("doc_id")), 1L)
            .otherwise(0L)).as("n_updated"),
          sum(col("n_chars")).as("sum_chars"))
          .withColumn("final_version",
            lit(graft.tables.VersionedTable.currentVersion(s, root).get))
        materialize(s, out)
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q118_ann_ivf_trained" -> ((s, dir) => {
      // IVF ANN over TRAINED centroids: lloydCentroids (q114's exact-integer
      // Lloyd rounds) builds the cells, then q49b's probe shape — corpus
      // assigns by a pure map over centroid literals, queries probe their 4
      // closest cells, exact cosine re-ranks probed cells only. Training
      // AND search are restated verbatim in the DuckDB oracle.
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKTrained(emb.filter(col("vec_id") < 10), emb, k = 3,
          nlist = 16, nprobe = 4, iters = 2)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q119_contrastive_triplets" -> ((s, dir) => {
      // Contrastive-training triplet assembly: per anchor, positive =
      // nearest neighbor, hard negative = most similar below 0.30 (semi-
      // hard mining). Both picks come from ONE aggregation over the scored
      // pairs (argmax as a struct max), one anchor-keyed shuffle; corpus
      // streams once against broadcast anchors.
      val emb = t(s, dir, "embeddings")
      Similarity.contrastiveTriplets(emb.filter(col("vec_id") < 20), emb,
          negCeiling = 0.30)
        .orderBy(col("q_id"))
    }),
    "q120_upsert" -> ((s, dir) => {
      // MERGE-style corpus upsert under the gate: snapshot v1 = documents
      // missing every 7th row; the update batch rewrites every 5th doc's
      // text (deterministic 'u<doc_id>') and re-inserts the missing
      // multiples of 5. Rollup over the MATERIALIZED v2 directory proves
      // the merge really happened on disk; the oracle restates membership
      // and update arithmetic directly.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q120-ups").toString + "/snap"
      try {
        val docs = t(s, dir, "documents")
        docs.filter(col("doc_id") % 7 =!= 0).write.parquet(tmp)
        val updates = docs.filter(col("doc_id") % 5 === 0)
          .withColumn("text", concat(lit("u"), col("doc_id")))
          .withColumn("n_chars", length(col("text")).cast("long"))
        graft.tables.Snapshots.upsertByKey(s, tmp, updates, "doc_id")
        val out = s.read.parquet(tmp).agg(
          count(lit(1)).as("n"),
          sum(col("doc_id")).as("sum_id"),
          sum(when(col("text") === concat(lit("u"), col("doc_id")), 1L)
            .otherwise(0L)).as("n_updated"),
          sum(col("n_chars")).as("sum_chars"))
        materialize(s, out) // 1 row; lets the scratch dir drop immediately
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp).getParentFile)
      }
    }),
    "q121_snapshot_diff" -> ((s, dir) => {
      // Snapshot diff: v1 drops every 7th doc and mangles every 11th's
      // text; v2 is the original corpus. One full-outer shuffle on the key,
      // md5 fingerprints decide changed-vs-unchanged; per-status rollup is
      // the "what moved since the last training run" report.
      val docs = t(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(lit("m"), col("text")))
            .otherwise(col("text")))
      graft.tables.Snapshots.diffByFingerprint(v1, docs, "doc_id", md5(col("text")))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("checksum"))
        .orderBy(col("status"))
    }),
    "q124_embedding_outliers" -> ((s, dir) => {
      // Embedding outlier detection — the noise/corruption filter of an
      // embedding pipeline: fit k-means (q114's exact-integer Lloyd), then
      // flag vectors whose distance to their own centroid is in the cell's
      // top 5% (q123's percentile gate on the integer dist). Per-cell
      // rollup of the flagged set; training + gate restate verbatim in the
      // oracle.
      val fit = Similarity.kmeansFit(t(s, dir, "embeddings"), k = 8, iters = 2)
      Curation.percentileGate(fit, col("cell"), col("dist"), p = 0.95)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_out"),
          min(col("q")).as("min_dist"),
          sum(col("vec_id")).as("checksum"))
        .orderBy(col("cell"))
    }),
    "q125_ann_ivf_index" -> ((s, dir) => {
      // Persisted-index ANN under the gate: the IVF index builds ONCE as
      // tables (tiny centroids parquet + the corpus range-clustered on its
      // cell id), then the search reads centroids, pushes `cell IN
      // (probed)` into the clustered scan (footer-level pruning — no
      // corpus rescan, no shuffle), and re-ranks. Same training and
      // parameters as q118, so its oracle applies verbatim.
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q125-ivf")
      val tmp = tmpRoot.toString + "/index"
      try {
        val emb = t(s, dir, "embeddings")
        Similarity.writeIvfIndex(emb, tmp, nlist = 16, iters = 2)
        val out = Similarity.searchIvfIndex(s, tmp,
          emb.filter(col("vec_id") < 10), k = 3, nprobe = 4)
          .orderBy(col("q_id"), col("rnk"))
        materialize(s, out) // bounded (nq*k rows); lets the scratch drop
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q127_funnel" -> ((s, dir) => {
      // Ordered funnel (view → click → purchase within 7 days),
      // earliest-first matching: per step, users whose chain reaches it in
      // the window. One pushed-filter scan + user-keyed min-agg per step,
      // chained by user joins — no windows, no per-user buffering.
      graft.ext.EventsOps.funnel(t(s, dir, "events"),
          Seq("view", "click", "purchase"), windowSeconds = 7L * 86400L)
        .orderBy(col("step"))
    }),
    "q128_retention_cohorts" -> ((s, dir) => {
      // Weekly retention cohorts: users bucket by first-event week
      // (integer absolute week index), each cell counts users active k
      // weeks later. Two two-phase aggregations + one user join.
      graft.ext.EventsOps.retentionCohorts(t(s, dir, "events"), maxOffset = 4)
        .orderBy(col("cohort_week"), col("offset"))
    }),
    "q129_event_transitions" -> ((s, dir) => {
      // Next-event transition matrix: per-user (ts, event_id)-ordered
      // sequences paired with lead(), counted per (from, to). One window
      // shuffle; |types|^2 output.
      graft.ext.EventsOps.eventTransitions(t(s, dir, "events"))
        .orderBy(col("from_type"), col("to_type"))
    }),
    "q130_sketch_distinct" -> ((s, dir) => {
      // Mergeable-sketch distinct count: HLL++ (approx_count_distinct,
      // rsd 2%) beside the exact count, projected as the exact value plus an
      // in-tolerance flag the oracle can restate. The sketch is the 100 TB
      // path — fixed-size partials merge associatively across partitions and
      // stages (plain two-phase hash agg; raw user ids never shuffle), where
      // the exact count must expand-distinct. Tolerance 5% ≫ the 2% rsd, so
      // the flag is deterministic-by-margin, not luck.
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_uniq"),
          approx_count_distinct(col("user_id"), 0.02).as("hll"))
        .select(col("event_type"), col("exact_uniq"),
          (abs(col("hll") - col("exact_uniq")) <=
            col("exact_uniq") * 0.05).cast("int").as("within_tol"))
        .orderBy(col("event_type"))
    }),
    "q131_sketch_quantiles" -> ((s, dir) => {
      // Mergeable quantile sketch (approx_percentile, accuracy 5000 → rank
      // error ≤ 0.02%) beside the exact interpolated percentile (which
      // matches DuckDB quantile_cont bit-for-bit — q55). Projects the exact
      // values and sketch-in-tolerance flags. At 100 TB the sketch is the
      // only option: bounded per-group state, associative merges; exact
      // percentile buffers every value of a group.
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95"),
          expr("approx_percentile(l_extendedprice, 0.5, 5000)").as("s50"),
          expr("approx_percentile(l_extendedprice, 0.95, 5000)").as("s95"))
        .select(col("l_returnflag"), col("n"), col("p50"), col("p95"),
          (abs(col("s50") - col("p50")) <= col("p50") * 0.02)
            .cast("int").as("tol50"),
          (abs(col("s95") - col("p95")) <= col("p95") * 0.02)
            .cast("int").as("tol95"))
        .orderBy(col("l_returnflag"))
    }),
    "q132_sketch_union" -> ((s, dir) => {
      // Persisted-sketch re-aggregation — the incremental-corpus pattern:
      // one DataSketches HLL per day materialized to parquet (binary
      // column), then the GLOBAL distinct answered by unioning the stored
      // sketches WITHOUT rescanning raw events. At 100 TB this is the only
      // affordable "distinct users ever" — each day's scan happens once, the
      // union touches |days| kilobyte-sized sketches. Exact twin + tolerance
      // flag pin the estimate (lgK=12 → rsd ≈ 1.6 %, margin 5 %).
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q132-hll")
      try {
        val ev = t(s, dir, "events")
        ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
          .write.mode("overwrite").parquet(tmpRoot.toString + "/daily")
        val unioned = s.read.parquet(tmpRoot.toString + "/daily")
          .agg(count(lit(1)).as("n_days"),
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        val exact = ev.agg(countDistinct(col("user_id")).as("exact_uniq"))
        val out = unioned.crossJoin(exact) // both sides are 1 row
          .select(col("n_days"), col("exact_uniq"),
            (abs(col("est") - col("exact_uniq")) <=
              col("exact_uniq") * 0.05).cast("int").as("within_tol"))
        materialize(s, out) // 1 row; lets the scratch dir drop
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q134_bpe_pairs" -> ((s, dir) => {
      // BPE-tokenizer training inner loop as a distributed query: count
      // adjacent character pairs across the corpus and keep those above a
      // relative frequency floor (threshold, not top-k — tie-safe like q60).
      // explode → two-phase count; the result is alphabet²-bounded, never
      // corpus-sized. Real BPE training re-runs exactly this aggregation
      // per merge step with the winning pair fused into the symbol stream —
      // each iteration is one shuffle-once pass at 100 TB.
      val pairs = t(s, dir, "documents")
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      val total = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total)) // 1-row total
        .filter(col("n") >= col("n_pairs") * 0.01)
        .select(col("pair"), col("n"),
          round(col("n").cast("double") / col("n_pairs"), 6).as("frac"))
        .orderBy(col("n").desc, col("pair"))
    }),
    "q126_retention_delete" -> ((s, dir) => {
      // Right-to-erasure / retention delete under the gate: a scratch
      // snapshot drops every 9th document by predicate (tmp-then-swap
      // rewrite), and the rollup runs over what's left ON DISK — the
      // oracle restates the surviving membership. The partitioned
      // O(1)-data path (drop whole directories) is pinned in ScaleOpsSpec.
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q126-del")
      val tmp = tmpRoot.toString + "/snap"
      try {
        t(s, dir, "documents").write.parquet(tmp)
        graft.tables.Snapshots.deleteWhere(s, tmp, col("doc_id") % 9 === 0)
        val out = s.read.parquet(tmp).agg(
          count(lit(1)).as("n"),
          sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"))
        materialize(s, out) // 1 row; lets the scratch dir drop immediately
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q123_percentile_gate" -> ((s, dir) => {
      // "Keep each language's top-20%-quality documents": exact per-stratum
      // percentile threshold (stratum-sized → broadcast back), then a
      // scan-speed gate — the curation cut-line applied, not just measured
      // (q55). Per-lang rollup of what survived.
      Curation.percentileGate(t(s, dir, "documents"), col("lang"),
          TA.qualityScore(col("text")), p = 0.8)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          round(min(col("q")), 6).as("min_q"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("lang"))
    }),
    "q93_source_cap" -> ((s, dir) => {
      // Domain balancing: at most 10 docs per source, longest-first (ties to
      // the lowest id) — integer priority keeps the window order cross-engine
      // exact. Per-source rollup of what survived.
      Curation.capPerSource(t(s, dir, "documents"),
          col("doc_id"), col("source"), col("n_chars"), k = 10)
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("source"))
    }),
    "q94_token_budget" -> ((s, dir) => {
      // "Best N tokens per language": take docs longest-first per lang while
      // the running whitespace-token total stays within 2000 — contiguous
      // prefix semantics, integer-exact in both engines.
      Curation.tokenBudgetSample(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"), col("n_chars"), budgetTokens = 2000L)
        .groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("lang"))
    }),
    "q85_layout_pruning" -> ((s, dir) => {
      // Z-order layout under the driver's gate: lineitem is rewritten
      // clustered on the Morton interleave of (l_orderkey, l_partkey)
      // quantile ranks — the sampled-sketch rank pass, no global window —
      // then filtered on BOTH cluster dimensions and rolled up. The filtered
      // result must equal the same filter over the original table (the
      // oracle); ScaleOpsSpec asserts the footer math that makes the scan
      // skip most row groups for exactly this predicate shape.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q85-z").toString
      try {
        val li = t(s, dir, "lineitem")
        graft.tables.Layout.writeZOrdered(li, tmp, 8, col("l_orderkey"), col("l_partkey"))
        val out = s.read.parquet(tmp)
          .filter(col("l_orderkey").between(100, 300) && col("l_partkey").between(50, 250))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_orderkey")).as("sum_ok"),
            sum(col("l_partkey")).as("sum_pk"))
        materialize(s, out) // 1 row; lets the scratch dir drop immediately
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
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
    "q108_incremental_neardup" -> ((s, dir) => {
      // q82's incremental-ingest wiring applied to NEAR-dup dedup: the
      // corpus's simhash60Md5 band keys (4×15-bit bands packed into one
      // long) are a pre-built bucketed snapshot; the batch probes it
      // co-located (zero Exchange on the snapshot side, ScaleOpsSpec) and
      // drops docs within Hamming ≤ 5 of any corpus fingerprint or of a
      // smaller-id batch doc. Every step is deterministic cross-engine
      // integer arithmetic (the q102 signature), so the surviving-doc set
      // carries a full DuckDB restatement — the production daily-ingest
      // shape (exact-dup ingest = q82, near-dup ingest = this) under the
      // full oracle gate.
      dropScratch(s, "q108_band_snap")
      val docs = t(s, dir, "documents")
      Dedup.snapshotSimhashBands(docs.filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), "q108_band_snap", 8)
      val out = Dedup.novelNearDupAgainstSnapshot(s, "q108_band_snap",
          docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
          maxHamming = 5)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
      // data-sized result — same scratch-table hygiene as q82: round-trip
      // through a single-file parquet, drop the snapshot, read back.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q108").toString
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      s.sql("DROP TABLE IF EXISTS q108_band_snap")
      s.read.parquet(tmp)
    }),
    "q109_epoch_shuffle" -> ((s, dir) => {
      // Deterministic global corpus shuffle: total order by md5(seed:id) —
      // the epoch shuffle every trainer needs, reproducible across engines
      // and cluster sizes (a different seed is a fresh permutation). Spark
      // plans the global ORDER BY as a range-partitioned sort (sampled
      // boundaries, per-partition sorts — no single-task pass);
      // Curation.writeShuffled materializes the same order as ordered
      // parquet shards (ScaleOpsSpec covers the file form).
      Curation.shuffled(t(s, dir, "documents"), col("doc_id"), seed = "epoch1")
        .select(col("shuffle_key"), col("doc_id"), col("lang"))
    }),
    "q110_pii_redaction" -> ((s, dir) => {
      // PII scrubbing: URLs, emails, and long digit runs collapse to typed
      // placeholders (TextAnalysis.redactPii — codegen'd regexp chain, no
      // shuffle, scan-speed). The synthetic corpus carries no PII, so the
      // query plants a deterministic PII suffix per doc ON BOTH SIDES (the
      // oracle builds the identical string) — the redaction itself, and its
      // md5, must then match cross-engine, which pins Java-regex and RE2
      // agreement on the conservative pattern classes.
      val piiText = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or https://ex.example/p/"),
        col("doc_id").cast("string"),
        lit("?sid=98765432 ref 123456789"))
      val red = TA.redactPii(piiText)
      t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), md5(red).as("red_md5"),
          size(regexp_extract_all(red, lit("<URL>"), lit(0))).cast("long").as("n_url"),
          size(regexp_extract_all(red, lit("<EMAIL>"), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(red, lit("<NUM>"), lit(0))).cast("long").as("n_num"))
        .orderBy(col("doc_id"))
    }),
    "q79_skew_salted_join" -> ((s, dir) => {
      // Skew-salted equi-join under the driver's gate: events (the heavy,
      // potentially hot-keyed side) salt 8 ways, customer dim replicated per
      // salt, join on (key, salt). The salted result must be row-identical
      // to the plain join — which IS the oracle (plain SQL join + rollup).
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"))
      val dim = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.ops.Skew.saltedJoin(ev, dim, "user_id", factor = 8)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Stable.sumD(col("value")), 2).as("sum_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),
    "q67_sequence_pack" -> ((s, dir) => {
      // Sequence packing (context-window fill): contiguous token-capacity
      // packs per (stratum, shard); per-pack rollup. Integer-exact.
      Curation.sequencePack(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("lang"), capTokens = 4096)
        .groupBy(col("stratum"), col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tok"))
        .orderBy(col("stratum"), col("shard"), col("pack_id"))
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
    "q135_mg_heavy_hitters" -> ((s, dir) => {
      // Two-pass exact heavy hitters via a Misra-Gries sketch: pass 1
      // aggregates k=63-entry mergeable summaries (shuffle carries one
      // summary per partition, NOT a vocabulary-sized count table — the
      // q60 contrast); pass 2 exact-counts ONLY the candidate tokens. The
      // sketch guarantees every token with frequency > n/(k+1) is a
      // candidate, so the thresholded result is exactly the true
      // phi=3%-heavy hitters under any partitioning — which is why the
      // plain HAVING-count SQL is a full oracle.
      val toks = t(s, dir, "documents")
        .select(explode(TA.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val row = toks.agg(
        graft.functions.MisraGries.candidates(63)(col("tok")).as("cand"),
        count(lit(1)).as("n")).head() // 1 row, <= 63 strings — driver-bounded
      val cand = row.getSeq[String](0)
      val n = row.getLong(1)
      toks.filter(col("tok").isin(cand: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        // integer form of cnt >= n * 0.03 — no float-boundary ambiguity
        .filter(col("cnt") * 100 >= lit(n) * 3)
        .select(col("tok"), col("cnt"),
          round(col("cnt") / lit(n.toDouble), 6).as("frac"))
        .orderBy(col("cnt").desc, col("tok"))
    }),
    "q136_bloom_join" -> ((s, dir) => {
      // Bloom-pruned semi join: the high-value-orders filter folds into a
      // 1M-bit bloom probed at lineitem SCAN speed, so non-matching fact
      // rows never reach the join's exchange; the exact semi join removes
      // false positives, making the result equal the plain semi join (the
      // oracle). Spark's own BloomFilterAggregate/MightContain pair.
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      graft.ops.BloomPrune.bloomSemiJoin(
          t(s, dir, "lineitem"), col("l_orderkey"),
          hi, col("o_orderkey"),
          expectedItems = 200000L, numBits = 1000000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          round(graft.functions.Stable.sumD(
            col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    }),
    "q137_bottomk_sample" -> ((s, dir) => {
      // Exact-k uniform corpus sample: bottom-200 by the Knuth
      // multiplicative key (same modular arithmetic as q59's Bernoulli
      // sampler, but with an EXACT output size — "give me exactly k docs").
      // orderBy+limit plans through the bounded-heap TopK operator: each
      // partition keeps 200 rows, no global sort, no RNG, reproducible
      // across engines and cluster sizes.
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Curation.sampleKey(col("doc_id"), 999983).as("skey"))
        .orderBy(col("skey"), col("doc_id"))
        .limit(200)
    }),
    "q138_bigram_lm" -> ((s, dir) => {
      // Char-bigram LM fluency scoring (the CCNet/KenLM quality-filter
      // pattern): train the charset^2-bounded model in one pass, broadcast
      // it, score every doc map-side, keep the 20 least-fluent (the docs a
      // perplexity gate would drop). Integer-scaled probabilities — exact
      // cross-engine arithmetic (same trick as the TF-IDF integer idf).
      val docs = t(s, dir, "documents")
      val lm = graft.ext.NgramLm.probTable(docs, col("text"))
      graft.ext.NgramLm.score(docs, col("doc_id"), col("text"), lm)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("m"), col("fluency"))
        .orderBy(col("fluency"), col("doc_id"))
        .limit(20)
    }),
    "q139_source_overlap" -> ((s, dir) => {
      // Cross-source contamination matrix: distinct word-5-gram overlap
      // between every source pair (the train/eval leakage audit across
      // feeds). Grams aggregate to (source, gram) ONCE; the pair join runs
      // on that vocabulary-sized table keyed by gram, and a gram's blowup
      // is bounded by #sources^2, never corpus-sized. Jaccard from exact
      // integer set sizes.
      val g = t(s, dir, "documents")
        .select(col("source"), explode(array_distinct(
          Dedup.wordNgrams(col("text"), 5))).as("ng"))
        .distinct()
      val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val shared = g.as("a").join(g.as("b"),
          col("a.ng") === col("b.ng") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("sz", "sz_a"), "src_a")
        .join(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("sz", "sz_b"), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          round(col("n_shared").cast("double") /
            (col("sz_a") + col("sz_b") - col("n_shared")), 6).as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    "q140_cluster_split" -> ((s, dir) => {
      // Leakage-safe train/val/test split: near-dup CLUSTERS (q95's
      // connected components over the n-gram-Jaccard pair graph) assign
      // whole to a split by the Knuth key of their representative — no
      // near-duplicate pair can straddle splits (the eval-contamination
      // guarantee an id-hash split cannot give). Singleton docs are their
      // own cluster. Buckets 0-7 train, 8 val, 9 test.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs,
        col("doc_id"), col("text"), lit(1), n = 3, minJaccard = 0.2)
      val comp = Dedup.connectedComponents(pairs)
        .withColumnRenamed("node", "doc_id")
      val assigned = docs.join(broadcast(comp), Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("comp"), col("doc_id")))
        .withColumn("bucket", Curation.sampleKey(col("cluster"), 10))
        .withColumn("split",
          when(col("bucket") <= 7, "train")
            .when(col("bucket") === 8, "val").otherwise("test"))
      assigned.groupBy(col("split")).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("cluster")).as("n_clusters"),
          sum(col("doc_id")).as("checksum"))
        .orderBy(col("split"))
    }),
    "q141_gap_fill" -> ((s, dir) => {
      // Time-grid forward fill (LOCF): per user, the latest reading per
      // hour spreads across an hourly grid spanning that user's activity —
      // the gap-free feature series a trainer consumes. Integer epoch-hour
      // grid (portable floor-div); the fill is one per-user ordered window
      // (last non-null), grid rows bounded by span-hours x users. Hours
      // before a user's first reading stay null by construction of the
      // grid start, so every emitted row is defined.
      graft.ext.EventsOps.gapFillHourly(
          t(s, dir, "events").filter(col("user_id") < 20))
        .orderBy(col("user_id"), col("h"))
    }),
    "q142_bpe_train" -> ((s, dir) => {
      // Distributed BPE training: 4 merge rounds, each ONE vocabulary-sized
      // weighted pair count + a 1-row argmax collect; the corpus-sized
      // shuffle happens once (distinct-word counts). The merge table is the
      // result — the DuckDB oracle replays the identical sentinel-string
      // replace chain, so every (step, pair, count) is cross-engine exact.
      val wc = graft.ext.Bpe.wordCounts(t(s, dir, "documents"), col("text"))
      val merges = graft.ext.Bpe.trainMerges(wc, nMerges = 4)
      s.createDataFrame(merges)
        .select(col("step"), col("x"), col("y"), col("cnt"))
        .orderBy(col("step"))
    }),
    "q143_bpe_encode" -> ((s, dir) => {
      // BPE encoding via the trained vocabulary: train 4 merges, encode the
      // DISTINCT words (vocabulary-sized, broadcastable), then join docs to
      // the encoded vocab — no per-document merge loop at any scale. Output:
      // per-doc BPE token counts for the first 50 docs.
      val docs = t(s, dir, "documents")
      val wc = graft.ext.Bpe.wordCounts(docs, col("text"))
      val merges = graft.ext.Bpe.trainMerges(wc, nMerges = 4)
      val vocab = graft.ext.Bpe.encodeWords(wc, merges)
      docs.filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .join(broadcast(vocab.select(col("w"), col("n_tok"))), "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tok"))
        .orderBy(col("doc_id"))
    }),
    "q161_stratum_topk_sample" -> ((s, dir) => {
      // Exactly-k-per-stratum sampling ("25 docs per language, no more, no
      // fewer"): rank by the Knuth key within each stratum, keep rn <= k —
      // q137's exact-size guarantee made per-group; one stratum-keyed
      // window, partitions bounded by stratum populations.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("skey"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          Curation.sampleKey(col("doc_id"), 999983).as("skey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 25)
        .orderBy(col("lang"), col("rn"))
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
    "q160_distribution_drift" -> ((s, dir) => {
      // Snapshot drift monitoring: quality-score bin distributions of two
      // corpus versions (even/odd doc halves as stand-ins) compared per
      // language by exact-integer total variation distance — the
      // feed-change alarm of an ingest pipeline. Bin = floor(10·quality).
      val docs = t(s, dir, "documents")
      val bin = floor(TA.qualityScore(col("text")) * 10).cast("long")
      Curation.distributionDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          col("lang"), bin)
        .withColumnRenamed("stratum", "lang")
        .orderBy(col("lang"))
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
    "q157_ann_ivfpq" -> ((s, dir) => {
      // IVF+PQ composed index (coarse cells + residual product codes): a
      // query probes nprobe cells, builds one ADC lookup table per probed
      // cell from its own residual, and candidates meet on (cell, j, code)
      // equality — the IVF restriction and PQ lookup in one equi-join;
      // exact cosine re-ranks the survivors. The oracle replays every
      // stage in integer arithmetic.
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), k = 3, nlist = 8,
          nprobe = 4, m = 4, subDim = 16, ksub = 8, iters = 2,
          nq = 10, kCand = 20)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q156_domain_pagerank" -> ((s, dir) => {
      // Domain authority for crawl curation: integer-scaled weighted
      // PageRank over the cross-source gram-overlap graph (q139's matrix
      // read as edges) — the CommonCrawl domain-ranking pattern that feeds
      // mixture weights. 3 iterations, each one rank-to-edge join + one
      // target-keyed sum; floor-division arithmetic keeps every rank
      // bit-identical across engines, and the oracle replays the chain.
      val docs = t(s, dir, "documents")
      val g = docs.select(col("source"),
          explode(array_distinct(Dedup.wordNgrams(col("text"), 5))).as("ng"))
        .distinct()
      val shared = g.as("a").join(g.as("b"),
          col("a.ng") === col("b.ng") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("w"))
      val edges = graft.ext.GraphOps.symmetricEdges(
        shared, col("sa"), col("sb"), col("w"))
      graft.ext.GraphOps.pageRank(edges, iters = 3)
        .orderBy(col("rank").desc, col("node"))
    }),
    "q155_ann_pq_index" -> ((s, dir) => {
      // PQ index persisted as tables (books + corpus codes), then searched
      // — the build-once/search-many contract: the round-trip must not
      // change a single row vs q148's in-memory computation, so q148's
      // oracle applies verbatim (the q125 pattern for the PQ half).
      val tmpRoot = java.nio.file.Files.createTempDirectory("graft-q155-pq")
      try {
        val emb = t(s, dir, "embeddings")
        Similarity.writePqIndex(emb, tmpRoot.toString)
        materialize(s,
          Similarity.searchPqIndex(s, tmpRoot.toString, emb, k = 3)
            .orderBy(col("q_id"), col("rnk")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(tmpRoot.toFile)
      }
    }),
    "q153_dataset_manifest" -> ((s, dir) => {
      // Order-invariant dataset fingerprint per source — the manifest a
      // reproducible training run records: same rows (any order, any
      // partitioning, any engine) => same (n, fp_sum, fp_sq). The oracle
      // recomputes the identical md5-fold multiset hash in DuckDB.
      Curation.manifest(t(s, dir, "documents"), col("source"),
          Seq(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")))
        .withColumnRenamed("stratum", "source")
        .orderBy(col("source"))
    }),
    "q150_jsonl_roundtrip" -> ((s, dir) => {
      // JSON-lines I/O round trip — the interchange format half the
      // training-data world ships in: documents export to JSONL shards,
      // re-mount under an EXPLICIT schema (schema inference over JSONL is
      // a full extra pass at 100 TB — never pay it twice), and the rollup
      // over the mounted copy must equal the parquet original (the oracle).
      val tmp = java.nio.file.Files.createTempDirectory("graft-q150").toString
      try {
        t(s, dir, "documents").write.mode("overwrite").json(tmp)
        val back = s.read.schema(
          "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          .json(tmp)
        materialize(s, back.groupBy(col("lang")).agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("doc_id")).as("checksum"),
            sum(length(col("text"))).as("sum_len"))
          .orderBy(col("lang")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
    }),
    "q151_orc_roundtrip" -> ((s, dir) => {
      // ORC I/O round trip — the other columnar container Spark ships
      // natively; same contract as q150: mounted copy ≡ parquet original.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q151").toString
      try {
        t(s, dir, "documents").write.mode("overwrite").orc(tmp)
        materialize(s, s.read.orc(tmp).groupBy(col("lang")).agg(
            count(lit(1)).as("n"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("doc_id")).as("checksum"))
          .orderBy(col("lang")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
    }),
    "q152_text_gz" -> ((s, dir) => {
      // Gzipped line-text ingestion — the WET/CommonCrawl shape: documents
      // serialize to one delimited line each in .gz shards (gzip splits at
      // FILE granularity, so shard count = read parallelism — the reason
      // crawl dumps ship as many small .gz files), then parse back at scan
      // speed and roll up; must equal the parquet original.
      val tmp = java.nio.file.Files.createTempDirectory("graft-q152").toString
      try {
        val sep = "\u0007"
        t(s, dir, "documents")
          .select(concat_ws(sep, col("doc_id"), col("lang"), col("text")).as("value"))
          .repartition(8) // shard count = future read parallelism
          .write.mode("overwrite").option("compression", "gzip").text(tmp)
        val back = s.read.text(tmp)
          .select(split(col("value"), sep, 3).as("p"))
          .select(element_at(col("p"), 1).cast("long").as("doc_id"),
            element_at(col("p"), 2).as("lang"),
            element_at(col("p"), 3).as("text"))
        materialize(s, back.groupBy(col("lang")).agg(
            count(lit(1)).as("n"),
            sum(length(col("text"))).as("sum_len"),
            sum(col("doc_id")).as("checksum"))
          .orderBy(col("lang")))
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
    }),
    "q148_ann_pq" -> ((s, dir) => {
      // Product-quantization ANN: per-subspace integer Lloyd codebooks,
      // corpus compressed to m=4 codes, queries score the corpus via a
      // broadcast ADC lookup table (sum of m table lookups, never a full
      // dot product), exact cosine re-ranks the top-20 ADC candidates.
      // Training, codes, ADC order, and re-rank are integer/tie-broken —
      // the oracle replays all four stages.
      Similarity.pqTopK(t(s, dir, "embeddings"), k = 3, m = 4, subDim = 16,
          ksub = 8, iters = 2, nq = 10, kCand = 20)
        .orderBy(col("q_id"), col("rnk"))
    }),
    "q147_collocations" -> ((s, dir) => {
      // Collocation mining: adjacent word pairs ranked by integer-scaled
      // lift (PMI sans log) over a min-support floor — fixed phrases and
      // boilerplate templates surface above raw frequency. Two corpus
      // aggregations; scoring joins touch aggregated tables only.
      Curation.collocations(t(s, dir, "documents"), col("text"),
        minCount = 10L, topK = 30)
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
    "q145_multimodal_imageio" -> ((s, dir) => {
      // Real-codec multimodal decode under the oracle gate: deterministic
      // synthetic PNGs (formula-sized, ImageIO-ENCODED per row) round-trip
      // through actual PNG bytes and [[Multimodal.ImageIoCodec]]'s decode —
      // the full encode→bytes→decode loop with a real codec, batch-wise in
      // mapPartitions. The oracle recomputes width/height from the sizing
      // formula: the decode must reproduce them from the bytes alone.
      val withPng = Multimodal.withSyntheticPng(
        t(s, dir, "documents").filter(col("doc_id") < 100).select(col("doc_id")))
      Multimodal.decodeImages(withPng, codec = Multimodal.ImageIoCodec)
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("format"),
          Multimodal.payloadBytes(col("payload")).as("png_bytes"))
        .filter(col("png_bytes") > 0) // real PNGs are never empty
        .drop("png_bytes")
        .orderBy(col("doc_id"))
    }),
  )

  /** Keep-rates (permille) for the stratified-sampling queries — the
    * "mixture weights" knob; mirrored literally in the oracle SQL. */
  private val sampleRates =
    Map("en" -> 300, "fr" -> 200, "de" -> 150, "es" -> 150)

  private val sampleRateCase =
    """CASE %s WHEN 'en' THEN 300 WHEN 'fr' THEN 200 WHEN 'de' THEN 150
      |       WHEN 'es' THEN 150 ELSE 100 END""".stripMargin

  private val sampleKeySql = "((%s %% 1000003) * 2654435761) %% 1000"

  private val stopList = "['the','a','an','of','to','in','is','and','or','for']"

  /** The shared symbol layout of the q172/q173/q174 probe oracles: the 3×3
    * Gram matrix over (bias, x1, x2) and the column-j replacement for the
    * Cramer solve. */
  private val gramA = Array(
    Array("hn", "s1", "s2"),
    Array("s1", "s11", "s12"),
    Array("s2", "s12", "s22"))
  private def gramRepl(j: Int): Array[Array[String]] =
    Array.tabulate(3, 3)((r, c) => if (c == j) s"b$r" else gramA(r)(c))

  /** 3×3 determinant as a SQL expression string (cofactor expansion along
    * the first row) — generates the Cramer solve the q172 oracle runs in
    * HUGEINT, mirroring [[graft.ext.Regression.det]] term for term. */
  private def det3Sql(m: Array[Array[String]]): String = {
    def minor(r0: Int, r1: Int, c0: Int, c1: Int) =
      s"(${m(r0)(c0)}*${m(r1)(c1)} - ${m(r0)(c1)}*${m(r1)(c0)})"
    s"(${m(0)(0)}*${minor(1, 2, 1, 2)} - ${m(0)(1)}*${minor(1, 2, 0, 2)}" +
      s" + ${m(0)(2)}*${minor(1, 2, 0, 1)})"
  }

  /** Exact word-3-gram Jaccard pairs (J ≥ 0.2) — the oracle for q45 (exact
    * inverted-index) and q46 (MinHash+LSH, whose verified candidates equal
    * the exact answer on the planted-dup corpus). */
  private def ngramJaccardOracle(minJ: Double): String =
    raw"""WITH toks AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS tk FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, source, unnest(
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
      |j AS (
      |  SELECT d1, d2, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = d1
      |  JOIN sizes sb ON sb.doc_id = d2)
      |SELECT d1, d2, jaccard FROM j WHERE jaccard >= $minJ ORDER BY d1, d2""".stripMargin

  /** Unrolled-SQL restatement of [[graft.ext.Similarity.kmeansFit]]: `iters`
    * rounds of (assign, floor-div centroid update) CTEs over c0 = the k
    * lowest-id quantized vectors, then the final assignment. Every step is
    * integer arithmetic, so the SQL is exact — `(s - ((s % cnt + cnt) %
    * cnt)) / cnt` is floor division spelled portably (nonneg mod works under
    * both truncating and flooring `%`). */
  private def kmeansAssign(i: Int, cPrev: String, dim: Int): String =
    s"""d$i AS (
       |  SELECT q.vec_id, q.qv, c.cell,
       |    CAST(list_sum(list_transform(generate_series(1, $dim),
       |      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT) AS dist
       |  FROM qe q CROSS JOIN $cPrev c),
       |a$i AS (SELECT vec_id, qv, cell, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM d$i) WHERE rn = 1)""".stripMargin

  /** The Lloyd-training CTE chain: qe (quantized vectors), c0 (seed
    * centroids), then `iters` rounds of (assign, floor-div update) ending at
    * centroid CTE `c{iters}`. `(s - ((s % cnt + cnt) % cnt)) / cnt` is floor
    * division spelled portably (nonneg mod works under both truncating and
    * flooring `%`). */
  /** [[kmeansCtes]] with the cluster count as a SQL EXPRESSION instead of
    * a literal — the oracle-side mirror of [[graft.ext.Similarity
    * .semDedupClustersFor]]-auto geometry. k appears in exactly one place
    * (the c0 seed cut), so a scalar subquery recomputing the rule from
    * `count(*)` makes one static oracle string correct at EVERY verify
    * scale (a baked `8` was right at sf0.01's 500 vectors and wrong at
    * sf0.1's 2000 — the round-8 finding). */
  private def semDedupK: String =
    "(SELECT least(65536, greatest(8, (count(*) + 63) // 64)) FROM embeddings)"

  private def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtesE(k.toString, iters, dim)

  private def kmeansCtesE(k: String, iters: Int, dim: Int): String = {
    def update(i: Int, cPrev: String): String =
      s"""s$i AS (
         |  SELECT cell, ii.i AS pos, sum(qv[ii.i]) AS s, count(*) AS cnt
         |  FROM a$i CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS i) ii
         |  GROUP BY cell, ii.i),
         |n$i AS (SELECT cell,
         |    list(CAST((s - ((s % cnt + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cv
         |  FROM s$i GROUP BY cell),
         |c$i AS (SELECT p.cell, COALESCE(n$i.cv, p.cv) AS cv
         |  FROM $cPrev p LEFT JOIN n$i ON n$i.cell = p.cell)""".stripMargin
    val rounds = (1 to iters)
      .map(i => kmeansAssign(i, s"c${i - 1}", dim) + ",\n" + update(i, s"c${i - 1}"))
      .mkString(",\n")
    s"""qe AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cell, qv AS cv FROM qe WHERE vec_id < $k),
       |$rounds""".stripMargin
  }

  /** Unrolled-SQL restatement of [[graft.ext.Similarity.kmeansFit]]. */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    val fin = iters + 1
    s"""WITH ${kmeansCtes(k, iters, dim)},
       |${kmeansAssign(fin, s"c$iters", dim)}
       |SELECT vec_id, cell, dist FROM a$fin ORDER BY vec_id""".stripMargin
  }

  /** Unrolled-SQL restatement of [[graft.ext.Similarity.ivfTopKTrained]]:
    * the Lloyd chain, corpus cell assignment under the trained centroids,
    * query-side top-`nprobe` probe ranking over the same distance CTE, and
    * q103's exact-cosine re-rank tail. */
  private def ivfTrainedSql(nlist: Int, iters: Int, dim: Int,
      nprobe: Int, k: Int, nq: Int): String = {
    val fin = iters + 1
    s"""WITH ${kmeansCtes(nlist, iters, dim)},
       |${kmeansAssign(fin, s"c$iters", dim)},
       |cells AS (SELECT vec_id AS c_id, cell FROM a$fin),
       |qp AS (SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM d$fin WHERE vec_id < $nq) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT DISTINCT q_id, c_id FROM qp JOIN cells USING (cell)
       |  WHERE c_id != q_id),
       |s AS (
       |  SELECT q_id, c_id, round(
       |    list_sum(list_transform(generate_series(1, $dim),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(c2e.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE))))), 5) AS sim
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
       |            JOIN embeddings c2e ON c2e.vec_id = cand.c_id),
       |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)
       |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= $k ORDER BY q_id, rnk""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "q114_kmeans" -> kmeansSql(k = 8, iters = 2, dim = 64),
    "q118_ann_ivf_trained" ->
      ivfTrainedSql(nlist = 16, iters = 2, dim = 64, nprobe = 4, k = 3, nq = 10),
    // identical computation to q118 — the index round-trip must not change
    // a single row
    "q125_ann_ivf_index" ->
      ivfTrainedSql(nlist = 16, iters = 2, dim = 64, nprobe = 4, k = 3, nq = 10),
    // the Lloyd chain + per-cell quantile_cont threshold + gate tail
    "q124_embedding_outliers" ->
      s"""WITH ${kmeansCtes(8, 2, 64)},
         |${kmeansAssign(3, "c2", 64)},
         |cd AS (SELECT vec_id, cell, dist,
         |    cume_dist() OVER (PARTITION BY cell ORDER BY dist) AS cd
         |  FROM a3)
         |SELECT cell, CAST(count(*) AS BIGINT) AS n_out,
         |  CAST(min(dist) AS BIGINT) AS min_dist,
         |  CAST(sum(vec_id) AS BIGINT) AS checksum
         |FROM cd WHERE cd >= 0.95
         |GROUP BY cell ORDER BY cell""".stripMargin,
    "q40_dedup_exact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
        |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_rows,
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS n_removable
        |FROM (SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |      HAVING count(*) > 1) g""".stripMargin,
    "q41_text_quality" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 6) AS alpha,
         |    round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stop_ratio,
         |    round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mtl
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id, n_tok, alpha, stop_ratio, mtl,
         |  round(0.5 * alpha + 0.3 * least(stop_ratio * 3, 1.0)
         |    + 0.2 * least(mtl / 8, 1.0), 6) AS quality
         |FROM b ORDER BY doc_id""".stripMargin,
    "q42_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tok,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tok,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q43_lang_id" ->
      """WITH s AS (
        |  SELECT
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['le','la','les','de','et','un','est'], t))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['der','die','das','und','ist','ein','nicht'], t))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> list_contains(['el','los','las','y','un','es','que'], t))) AS BIGINT) AS s_es,
        |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
        |  FROM documents),
        |p AS (
        |  SELECT CASE WHEN has_cjk THEN 'zh'
        |    WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
        |    WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
        |    WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
        |    WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
        |    ELSE 'es' END AS pred
        |  FROM s)
        |SELECT pred, count(*) AS n FROM p GROUP BY pred ORDER BY pred""".stripMargin,
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
    // MinHash+LSH's verified candidate set equals the exact inverted-index
    // answer on this corpus (every true pair has J ≥ 0.9 → per-pair miss
    // odds ~2e-4 with 8 bands) — the exact-pairs oracle applies verbatim.
    "q46_minhash_lsh" -> ngramJaccardOracle(0.2),
    "q48_ann_brute" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
        |s AS (
        |  SELECT q_id, c_id, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE))))), 5) AS sim
        |  FROM c, q WHERE q_id != c_id),
        |r AS (SELECT q_id, c_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)
        |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    // IVF is deterministic end-to-end (no random hyperplanes): centroids are
    // the 16 lowest-id vectors L2-normalized, corpus cell = argmax centroid
    // dot (first max → lowest cid), query probes = top-4 cells by
    // (score DESC, cid DESC) — Spark's reverse(array_sort(struct)) order —
    // and the re-rank rounds to 5. Every step is the same IEEE op sequence
    // in DuckDB, so the full operator is oracle-expressible.
    "q49b_ann_ivf" ->
      (s"WITH $ivfTopKCtes\n" +
        "SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk"),
    "q227_bm25_search" ->
      (s"WITH $bm25SearchCtes\n" +
        """SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, n_terms, score_ppm, rnk
          |FROM r WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin),
    "q228_bradley_terry" ->
      (raw"""WITH tok AS (
          |  SELECT doc_id, source,
          |    unnest(string_split_regex(trim(text), '\s+')) AS w
          |  FROM documents),
          |cnt AS (SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS c
          |  FROM tok GROUP BY doc_id, source, w),
          |gd AS (SELECT doc_id, source, CAST(sum(c) AS BIGINT) AS n_tok,
          |  CAST(sum(c * c) AS BIGINT) AS sumsq
          |  FROM cnt GROUP BY doc_id, source),
          |g AS (SELECT doc_id, source,
          |  1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS g FROM gd),
          |pa AS (SELECT doc_id // 2 AS pid, source, g FROM g WHERE doc_id % 2 = 0),
          |pb AS (SELECT doc_id // 2 AS pid, source, g FROM g WHERE doc_id % 2 = 1),
          |o AS (SELECT
          |    CASE WHEN pa.g > pb.g THEN pa.source ELSE pb.source END AS winner,
          |    CASE WHEN pa.g > pb.g THEN pb.source ELSE pa.source END AS loser
          |  FROM pa JOIN pb USING (pid)
          |  WHERE pa.source <> pb.source AND pa.g <> pb.g),
          |wins AS (SELECT winner AS p, CAST(count(*) AS BIGINT) AS n_wins
          |  FROM o GROUP BY winner),
          |sym AS (SELECT i, j, CAST(count(*) AS BIGINT) AS c FROM (
          |    SELECT winner AS i, loser AS j FROM o
          |    UNION ALL SELECT loser AS i, winner AS j FROM o)
          |  GROUP BY i, j),
          |pl AS (SELECT p, CAST(coalesce(n_wins, 0) AS BIGINT) AS n_wins
          |  FROM (SELECT DISTINCT i AS p FROM sym) LEFT JOIN wins USING (p)),
          |np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pl),
          |w0 AS (SELECT p, CAST(1000000 AS BIGINT) AS w FROM pl),
          |""".stripMargin +
        btRoundCtes(3) +
        """,
          |ng AS (SELECT i AS p, CAST(sum(c) AS BIGINT) AS n_games
          |  FROM sym GROUP BY i)
          |SELECT pl.p, ng.n_games, pl.n_wins, w3.w AS strength_ppm
          |FROM pl JOIN w3 USING (p) JOIN ng USING (p) ORDER BY p""".stripMargin),
    "q229_constraint_audit" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 53 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 31 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
        |  FROM orders),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_compl,
        |    CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_uniq,
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d_uniq,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_price,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND NOT (o_totalprice BETWEEN 0 AND 1000000) THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_status,
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_fk
        |  FROM o),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS v_fk FROM o
        |  WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
        |    (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)),
        |u AS (
        |  SELECT 'custkey_fk' AS cname, n AS n_rows, c_fk AS n_checked,
        |    v_fk AS n_violations, 0 AS is_compl FROM base, fk
        |  UNION ALL SELECT 'orderkey_unique', n, k_uniq, k_uniq - d_uniq, 0 FROM base
        |  UNION ALL SELECT 'price_range', n, c_price, v_price, 0 FROM base
        |  UNION ALL SELECT 'status_complete', n, n, v_compl, 1 FROM base
        |  UNION ALL SELECT 'status_domain', n, c_status, v_status, 0 FROM base),
        |m AS (SELECT cname, n_rows, n_checked, n_violations, is_compl,
        |  CAST(CASE WHEN n_checked = 0 THEN 1000000
        |    ELSE ((n_checked - n_violations) * 1000000) // n_checked END AS BIGINT) AS metric_ppm
        |  FROM u)
        |SELECT cname AS "constraint", n_rows, n_checked, n_violations, metric_ppm,
        |  CAST(CASE WHEN is_compl = 1
        |    THEN CASE WHEN metric_ppm >= 990000 THEN 1 ELSE 0 END
        |    ELSE CASE WHEN n_violations = 0 THEN 1 ELSE 0 END END AS BIGINT) AS pass
        |FROM m ORDER BY cname""".stripMargin,
    "q230_annotator_agreement" ->
      raw"""WITH l AS (
         |  SELECT
         |    CASE WHEN n_chars < 120 THEN 'short'
         |         WHEN n_chars < 200 THEN 'mid' ELSE 'long' END AS a,
         |    CASE WHEN len(string_split_regex(trim(text), '\s+')) < 25 THEN 'short'
         |         WHEN len(string_split_regex(trim(text), '\s+')) < 40 THEN 'mid'
         |         ELSE 'long' END AS b
         |  FROM documents),
         |l2 AS (SELECT coalesce(a, 'null') AS a, coalesce(b, 'null') AS b FROM l),
         |conf AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM l2 GROUP BY a, b),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree FROM conf),
         |ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS na FROM conf GROUP BY a),
         |mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS nb FROM conf GROUP BY b),
         |pe AS (SELECT coalesce(sum(CAST(na AS HUGEINT) * nb), 0) AS pe_num
         |  FROM ma JOIN mb ON ma.a = mb.b),
         |x AS (SELECT n, n_agree,
         |  CAST((n_agree * 1000000) // n AS BIGINT) AS po_ppm,
         |  CAST((pe_num * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm
         |  FROM tot, pe)
         |SELECT n, n_agree, po_ppm, pe_ppm,
         |  CAST(CASE WHEN pe_ppm = 1000000 THEN NULL
         |    WHEN po_ppm >= pe_ppm
         |      THEN ((po_ppm - pe_ppm) * 1000000) // (1000000 - pe_ppm)
         |    ELSE -(((pe_ppm - po_ppm) * 1000000) // (1000000 - pe_ppm))
         |  END AS BIGINT) AS kappa_ppm
         |FROM x""".stripMargin,
    "q231_sft_turns" ->
      raw"""WITH e AS (
         |  SELECT user_id AS conv_id,
         |    list(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END
         |      ORDER BY ts, event_id) AS us,
         |    list(CAST(len(string_split_regex(trim(props), '\s+')) AS BIGINT)
         |      ORDER BY ts, event_id) AS tks
         |  FROM events GROUP BY user_id),
         |m AS (
         |  SELECT conv_id, CAST(len(us) AS BIGINT) AS n_turns,
         |    CAST(list_sum(us) AS BIGINT) AS n_user_turns,
         |    CAST(list_sum(list_transform(range(1, len(us) + 1),
         |      i -> CASE WHEN us[i] = 0 THEN tks[i] ELSE 0 END)) AS BIGINT) AS asst_tok,
         |    CAST(list_sum(list_transform(range(1, len(us) + 1),
         |      i -> CASE WHEN us[i] = 1 THEN tks[i] ELSE 0 END)) AS BIGINT) AS user_tok,
         |    CAST(CASE WHEN us[1] = 1 THEN 1 ELSE 0 END AS BIGINT) AS starts_user,
         |    CAST(CASE WHEN len(us) < 2 OR len(list_filter(range(2, len(us) + 1),
         |      i -> us[i] = us[i-1])) = 0 THEN 1 ELSE 0 END AS BIGINT) AS alternates
         |  FROM e)
         |SELECT conv_id, n_turns, n_user_turns,
         |  n_turns - n_user_turns AS n_asst_turns,
         |  asst_tok, user_tok, starts_user, alternates,
         |  CAST(CASE WHEN starts_user = 1 AND alternates = 1 THEN 1 ELSE 0 END
         |    AS BIGINT) AS valid
         |FROM m ORDER BY conv_id""".stripMargin,
    "q232_mojibake_audit" ->
      (s"""WITH d AS (
         |  SELECT doc_id, source, text ||
         |    CASE WHEN doc_id % 13 = 0 THEN '$mojiTail1' ELSE '' END ||
         |    CASE WHEN doc_id % 29 = 0 THEN '$mojiTail2' ELSE '' END AS text
         |  FROM documents),
         |h AS (SELECT doc_id, source,
         |  CAST(len(regexp_extract_all(text,
         |    '${graft.ext.TextAnalysis.mojibakePattern}')) AS BIGINT) AS hits
         |  FROM d)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(hits) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN hits > 0 THEN doc_id ELSE 0 END) AS BIGINT) AS checksum,
         |  (CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS flagged_ppm
         |FROM h GROUP BY source ORDER BY source""".stripMargin),
    "q233_tokenizer_fertility" ->
      (s"WITH ${bpeCtes(4)},\n" +
        raw"""vocab AS (
           |  SELECT w, CAST(len(list_filter(string_split(s, chr(1)||chr(1)),
           |    t -> t <> '')) AS BIGINT) AS n_tok FROM s4),
           |dtk AS (
           |  SELECT doc_id, lang,
           |    unnest(string_split_regex(trim(text), '\s+')) AS w
           |  FROM documents)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
           |  CAST(sum(n_tok) AS BIGINT) AS n_bpe_tok,
           |  (CAST(sum(length(w)) AS BIGINT) * 1000000)
           |    // CAST(sum(n_tok) AS BIGINT) AS chars_per_tok_ppm,
           |  (CAST(sum(n_tok) AS BIGINT) * 1000000)
           |    // CAST(count(*) AS BIGINT) AS tok_per_word_ppm
           |FROM dtk JOIN vocab USING (w) WHERE w <> ''
           |GROUP BY lang ORDER BY lang""".stripMargin),
    "q234_ndcg_audit" ->
      (s"WITH $bm25SearchCtes,\n" +
        s"""dsc AS (SELECT rr, CAST(dv AS BIGINT) AS dv FROM (VALUES
           |  ${graft.ext.Curation.ndcgDiscounts(10).zipWithIndex
                .map { case (d, i) => s"(${i + 1}, $d)" }.mkString(", ")})
           |  AS d(rr, dv)),
           |""".stripMargin +
        """base AS (SELECT q_id, n_terms AS rel, rnk FROM r WHERE rnk <= 10),
          |i AS (SELECT q_id, rel, rnk,
          |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, rnk)
          |    AS BIGINT) AS irnk FROM base),
          |a AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_ranked,
          |    CAST(sum(rel * d1.dv) AS BIGINT) AS dcg_n,
          |    CAST(sum(rel * d2.dv) AS BIGINT) AS idcg_n
          |  FROM i JOIN dsc d1 ON d1.rr = i.rnk JOIN dsc d2 ON d2.rr = i.irnk
          |  GROUP BY q_id)
          |SELECT CAST(q_id AS BIGINT) AS q_id, n_ranked, dcg_n, idcg_n,
          |  CAST(CASE WHEN idcg_n = 0 THEN NULL
          |    ELSE (dcg_n * 1000000) // idcg_n END AS BIGINT) AS ndcg_ppm
          |FROM a ORDER BY q_id""".stripMargin),
    "q235_rrf_fusion" ->
      (s"WITH $bm25SearchCtes,\n" +
        """tfr AS (SELECT qt.q_id, p.doc_id, CAST(sum(p.tf) AS BIGINT) AS s2
          |  FROM p JOIN qt USING (t) GROUP BY qt.q_id, p.doc_id),
          |tr2 AS (SELECT q_id, doc_id,
          |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY s2 DESC, doc_id)
          |    AS BIGINT) AS rnk FROM tfr),
          |u AS (SELECT q_id, doc_id, rnk FROM r WHERE rnk <= 10
          |  UNION ALL SELECT q_id, doc_id, rnk FROM tr2 WHERE rnk <= 10),
          |f AS (SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_rankers,
          |    CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf_ppm
          |  FROM u GROUP BY q_id, doc_id),
          |rr AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id
          |    ORDER BY rrf_ppm DESC, doc_id) AS BIGINT) AS rnk2 FROM f)
          |SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, n_rankers, rrf_ppm,
          |  rnk2 AS rnk
          |FROM rr WHERE rnk2 <= 10 ORDER BY q_id, rnk2""".stripMargin),
    "q236_ece_calibration" ->
      (s"WITH ${kmeansCtes(8, 2, 64)},\n" +
        """dd AS (
          |  SELECT q.vec_id, c.cell,
          |    CAST(list_sum(list_transform(generate_series(1, 64),
          |      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT) AS dist
          |  FROM qe q CROSS JOIN c2 c),
          |rk AS (SELECT vec_id, cell, dist,
          |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
          |  FROM dd),
          |asg AS (SELECT a.vec_id, a.cell AS cell, a.dist AS d1, b.dist AS d2
          |  FROM rk a JOIN rk b USING (vec_id) WHERE a.rn = 1 AND b.rn = 2),
          |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
          |  FROM embeddings WHERE label IS NOT NULL),
          |aj AS (SELECT asg.*, lab.label FROM asg JOIN lab USING (vec_id)),
          |mj AS (SELECT cell, label AS pred_label FROM (
          |    SELECT cell, label,
          |      row_number() OVER (PARTITION BY cell ORDER BY count(*) DESC, label) AS rn
          |    FROM aj GROUP BY cell, label) WHERE rn = 1),
          |cf AS (SELECT aj.vec_id, aj.label, mj.pred_label,
          |    CAST(CASE WHEN d1 + d2 = 0 THEN 500000
          |      ELSE (CAST(d2 AS HUGEINT) * 1000000) // (d1 + d2) END AS BIGINT)
          |      AS conf_ppm
          |  FROM aj JOIN mj USING (cell)),
          |bk AS (SELECT least((conf_ppm - 500000) // 50000, CAST(9 AS BIGINT)) AS bucket,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN label = pred_label THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_correct,
          |    CAST(sum(conf_ppm) AS BIGINT) AS sum_conf
          |  FROM cf GROUP BY bucket),
          |m AS (SELECT bucket, n, n_correct,
          |    CAST((n_correct * 1000000) // n AS BIGINT) AS acc_ppm,
          |    CAST(sum_conf // n AS BIGINT) AS conf_avg_ppm
          |  FROM bk),
          |g AS (SELECT *, abs(acc_ppm - conf_avg_ppm) AS gap_ppm FROM m),
          |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
          |  CAST(sum(gap_ppm * n) AS BIGINT) AS gw FROM g)
          |SELECT bucket, n, n_correct, acc_ppm, conf_avg_ppm, gap_ppm,
          |  CAST(gw // tn AS BIGINT) AS ece_ppm
          |FROM g, tt ORDER BY bucket""".stripMargin),
    "q237_weighted_sample" ->
      raw"""WITH h AS (
         |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS w,
         |    list_reduce(
         |      list_transform(string_split(md5('ws1:' || CAST(doc_id AS VARCHAR)), '')[1:15],
         |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                  ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) AS hv
         |  FROM documents WHERE n_chars > 0),
         |p AS (SELECT doc_id, lang, w, hv // w AS priority FROM h),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY priority, doc_id) AS BIGINT) AS rnk FROM p)
         |SELECT lang, doc_id, w, CAST(priority AS BIGINT) AS priority, rnk
         |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,
    "q238_kendall_tau" ->
      (s"WITH $bm25SearchCtes,\n" +
        """tfr AS (SELECT qt.q_id, p.doc_id, CAST(sum(p.tf) AS BIGINT) AS s2
          |  FROM p JOIN qt USING (t) GROUP BY qt.q_id, p.doc_id),
          |tr2 AS (SELECT q_id, doc_id,
          |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY s2 DESC, doc_id)
          |    AS BIGINT) AS rnk FROM tfr),
          |ja AS (SELECT r.q_id, r.doc_id, r.rnk AS ra, tr2.rnk AS rb
          |  FROM r JOIN tr2 USING (q_id, doc_id)
          |  WHERE r.rnk <= 10 AND tr2.rnk <= 10),
          |pr AS (SELECT x.q_id, (x.ra - y.ra) * (x.rb - y.rb) AS sg
          |  FROM ja x JOIN ja y ON x.q_id = y.q_id AND x.doc_id < y.doc_id),
          |per AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_pairs,
          |    CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
          |    CAST(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc
          |  FROM pr GROUP BY q_id),
          |nc AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_common
          |  FROM ja GROUP BY q_id),
          |fin AS (SELECT nc.q_id, nc.n_common,
          |    coalesce(per.n_pairs, 0) AS n_pairs,
          |    coalesce(per.n_conc, 0) AS n_conc,
          |    coalesce(per.n_disc, 0) AS n_disc
          |  FROM nc LEFT JOIN per USING (q_id))
          |SELECT CAST(q_id AS BIGINT) AS q_id, n_common, n_pairs, n_conc,
          |  n_disc,
          |  CAST(CASE WHEN n_pairs = 0 THEN NULL
          |    WHEN n_conc >= n_disc
          |      THEN ((n_conc - n_disc) * 1000000) // n_pairs
          |    ELSE -(((n_disc - n_conc) * 1000000) // n_pairs)
          |  END AS BIGINT) AS tau_ppm
          |FROM fin ORDER BY q_id""".stripMargin),
    "q239_hits" ->
      ("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS src, event_type AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM events GROUP BY 1, 2),
         |hn AS (SELECT DISTINCT src FROM e),
         |an AS (SELECT DISTINCT dst FROM e),
         |nh AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hn),
         |na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM an),
         |h0 AS (SELECT src, CAST(1000000 AS BIGINT) AS h FROM hn),
         |""".stripMargin +
        hitsRoundCtes(2) +
        """
          |SELECT node, role, score_ppm FROM (
          |  SELECT src AS node, 'hub' AS role, h AS score_ppm FROM h2
          |  UNION ALL
          |  SELECT dst AS node, 'authority' AS role, a AS score_ppm FROM a2)
          |ORDER BY role, node""".stripMargin),
    "q240_embedding_spectrum" ->
      ("""WITH qe AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qe),
         |su AS (SELECT ii.i AS j, CAST(sum(qv[ii.i]) AS BIGINT) AS s
         |  FROM qe CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) ii
         |  GROUP BY ii.i),
         |mn AS (SELECT j, CAST((s - ((s % n + n) % n)) / n AS BIGINT) AS m
         |  FROM su, nn),
         |cvl AS (SELECT qe.vec_id, mn.j, qe.qv[mn.j] - mn.m AS c
         |  FROM qe CROSS JOIN mn),
         |cov AS (SELECT a.j AS i, b.j AS j, CAST(sum(a.c * b.c) AS BIGINT) AS cij
         |  FROM cvl a JOIN cvl b USING (vec_id) GROUP BY a.j, b.j),
         |v0 AS (SELECT unnest(generate_series(1, 64)) AS j,
         |  CAST(1000000 AS HUGEINT) AS v),
         |""".stripMargin +
        spectralRoundCtes(3) +
        """,
          |num AS (SELECT sum(a.v * CAST(cij AS HUGEINT) * b.v) AS nm
          |  FROM cov JOIN v3 a ON a.j = cov.i JOIN v3 b ON b.j = cov.j),
          |den AS (SELECT sum(v * v) AS dn FROM v3),
          |tr AS (SELECT CAST(sum(cij) AS BIGINT) AS trace FROM cov WHERE i = j),
          |lam AS (SELECT CAST(nm // dn AS BIGINT) AS lambda_top FROM num, den),
          |pd AS (SELECT CAST(j AS BIGINT) AS principal_dim FROM v3
          |  ORDER BY abs(v) DESC, j LIMIT 1)
          |SELECT nn.n, CAST(64 AS BIGINT) AS dim, tr.trace, lam.lambda_top,
          |  CAST((CAST(lam.lambda_top AS HUGEINT) * 1000000) // tr.trace
          |    AS BIGINT) AS anisotropy_ppm,
          |  pd.principal_dim
          |FROM nn, tr, lam, pd""".stripMargin),
    "q241_ngram_diversity" ->
      raw"""WITH tw AS (
         |  SELECT source, string_split_regex(trim(text), '\s+') AS w
         |  FROM documents),
         |g1 AS (SELECT source, CAST(1 AS BIGINT) AS n, unnest(w) AS g FROM tw),
         |g2 AS (SELECT source, CAST(2 AS BIGINT) AS n,
         |  unnest(CASE WHEN len(w) >= 2
         |    THEN list_transform(generate_series(1, len(w) - 1),
         |      i -> w[i] || ' ' || w[i+1]) ELSE [] END) AS g FROM tw),
         |g3 AS (SELECT source, CAST(3 AS BIGINT) AS n,
         |  unnest(CASE WHEN len(w) >= 3
         |    THEN list_transform(generate_series(1, len(w) - 2),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END) AS g
         |  FROM tw),
         |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
         |  UNION ALL SELECT * FROM g3),
         |a AS (SELECT source, n, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
         |  FROM u GROUP BY source, n)
         |SELECT source, n, n_grams, n_distinct,
         |  (n_distinct * 1000000) // n_grams AS distinct_ppm
         |FROM a ORDER BY source, n""".stripMargin,
    "q242_vocab_concentration" ->
      raw"""WITH tok AS (
         |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |v AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
         |  WHERE w <> '' GROUP BY w),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS hapax_types FROM v),
         |h AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS head_mass
         |  FROM (SELECT c FROM v ORDER BY c DESC, w LIMIT 100))
         |SELECT n_tokens, n_types, hapax_types,
         |  (hapax_types * 1000000) // n_types AS hapax_ppm,
         |  (n_types * 1000000) // n_tokens AS type_token_ppm,
         |  (head_mass * 1000000) // n_tokens AS top100_coverage_ppm
         |FROM t, h""".stripMargin,
    "q243_winsorized_stats" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |tiers AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY g, v),
        |offs AS (SELECT g, v, cnt, coalesce(sum(cnt) OVER (PARTITION BY g
        |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS off FROM tiers),
        |ns AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY g),
        |rk AS (SELECT g, n,
        |    greatest(1, (n * 50000 + 999999) // 1000000) AS rlo,
        |    greatest(1, (n * 950000 + 999999) // 1000000) AS rhi FROM ns),
        |lo AS (SELECT rk.g, offs.v AS lo_milli FROM rk JOIN offs
        |  ON offs.g = rk.g AND rk.rlo > offs.off
        |    AND rk.rlo <= offs.off + offs.cnt),
        |hi AS (SELECT rk.g, offs.v AS hi_milli FROM rk JOIN offs
        |  ON offs.g = rk.g AND rk.rhi > offs.off
        |    AND rk.rhi <= offs.off + offs.cnt),
        |cl AS (SELECT b.g, b.v,
        |    least(greatest(b.v, lo.lo_milli), hi.hi_milli) AS vw,
        |    lo.lo_milli, hi.hi_milli
        |  FROM b JOIN lo USING (g) JOIN hi USING (g)),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    min(lo_milli) AS lo_milli, min(hi_milli) AS hi_milli,
        |    CAST(sum(v) AS BIGINT) AS rs, CAST(sum(vw) AS BIGINT) AS ws
        |  FROM cl GROUP BY g)
        |SELECT g AS event_type, n, lo_milli, hi_milli,
        |  CAST(CASE WHEN rs >= 0 THEN (rs * 1000) // n
        |    ELSE -((-rs * 1000) // n) END AS BIGINT) AS raw_mean_micro,
        |  CAST(CASE WHEN ws >= 0 THEN (ws * 1000) // n
        |    ELSE -((-ws * 1000) // n) END AS BIGINT) AS win_mean_micro
        |FROM a ORDER BY event_type""".stripMargin,
    "q244_poisson_bootstrap" ->
      """WITH base AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS m
        |  FROM documents),
        |e AS (SELECT id, m, unnest(generate_series(1, 32)) AS b FROM base),
        |h AS (SELECT b, m, list_reduce(
        |    list_transform(string_split(md5('pb1:' || CAST(b AS VARCHAR)
        |        || ':' || CAST(id AS VARCHAR)), '')[1:15],
        |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v) % 1000000 AS hv FROM e),
        |w AS (SELECT b, m, CASE WHEN hv < 367879 THEN 0
        |    WHEN hv < 735759 THEN 1 WHEN hv < 919699 THEN 2
        |    WHEN hv < 981012 THEN 3 WHEN hv < 996340 THEN 4
        |    WHEN hv < 999406 THEN 5 ELSE 6 END AS w FROM h),
        |a AS (SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
        |    CAST(sum(w * m) AS BIGINT) AS sum_m FROM w GROUP BY b)
        |SELECT b, n_eff, sum_m,
        |  CAST(CASE WHEN n_eff = 0 THEN NULL
        |    WHEN sum_m >= 0 THEN (sum_m * 1000000) // n_eff
        |    ELSE -((-sum_m * 1000000) // n_eff) END AS BIGINT) AS mean_ppm
        |FROM a ORDER BY b""".stripMargin,
    "q246_length_bias" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |cnt AS (
         |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY doc_id, lang, w),
         |d AS (
         |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tok,
         |    CAST(sum(c * c) AS BIGINT) AS sumsq
         |  FROM cnt GROUP BY doc_id, lang),
         |g AS (
         |  SELECT doc_id, lang AS strat,
         |    1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS x
         |  FROM d),
         |r AS (
         |  SELECT doc_id, strat, x,
         |    CAST(row_number() OVER (PARTITION BY strat ORDER BY x DESC, doc_id) AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY strat) AS BIGINT) // 2 AS h
         |  FROM g),
         |top AS (SELECT strat, doc_id AS chosen_id, x AS cs, r + h AS pr FROM r WHERE r <= h),
         |bot AS (SELECT strat, doc_id AS rejected_id, x AS rs, r AS pr FROM r),
         |p AS (
         |  SELECT top.strat, chosen_id, rejected_id
         |  FROM top JOIN bot USING (strat, pr)
         |  WHERE cs - rs >= 100000),
         |len AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS nc FROM documents),
         |pl AS (SELECT p.strat, lc.nc AS c_len, lr.nc AS r_len
         |  FROM p JOIN len lc ON lc.doc_id = p.chosen_id
         |    JOIN len lr ON lr.doc_id = p.rejected_id),
         |a AS (SELECT strat, CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(CASE WHEN c_len > r_len THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_chosen_longer,
         |    CAST(sum(CASE WHEN c_len = r_len THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ties
         |  FROM pl GROUP BY strat)
         |SELECT strat, n_pairs, n_chosen_longer, n_ties,
         |  CAST(CASE WHEN n_pairs = n_ties THEN NULL
         |    ELSE (n_chosen_longer * 1000000) // (n_pairs - n_ties)
         |  END AS BIGINT) AS length_bias_ppm
         |FROM a ORDER BY strat""".stripMargin,
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
    "q248_pack_utilization" ->
      raw"""WITH b AS (
         |  SELECT lang AS stratum, doc_id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |    doc_id // 1000 AS shard
         |  FROM documents),
         |c AS (SELECT *, sum(n_tok) OVER (
         |    PARTITION BY stratum, shard ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM b),
         |p AS (SELECT stratum, shard, (cum - n_tok) // 512 AS pack_id, n_tok FROM c),
         |pk AS (SELECT stratum, shard, pack_id,
         |    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tok
         |  FROM p GROUP BY stratum, shard, pack_id),
         |a AS (SELECT stratum AS lang, CAST(count(*) AS BIGINT) AS n_packs,
         |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |    CAST(sum(pack_tok) AS BIGINT) AS sum_tok,
         |    CAST(sum(CASE WHEN pack_tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_over_packs
         |  FROM pk GROUP BY stratum)
         |SELECT lang, n_packs, n_docs, sum_tok, n_over_packs,
         |  (sum_tok * 1000000) // (n_packs * 512) AS util_ppm
         |FROM a ORDER BY lang""".stripMargin,
    "q249_mixture_feasibility" ->
      raw"""WITH toks AS (
         |  SELECT source,
         |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
         |      AS avail_tok
         |  FROM documents GROUP BY source),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM toks),
         |tg AS (SELECT source, avail_tok,
         |  CAST(1000000 // ns.n_src AS BIGINT) AS target_ppm FROM toks, ns),
         |cap AS (SELECT CAST(min((avail_tok * 1000000) // target_ppm) AS BIGINT)
         |  AS t_star FROM tg WHERE target_ppm > 0)
         |SELECT source, avail_tok, target_ppm, cap.t_star,
         |  CAST(CASE WHEN target_ppm = 0 THEN 0
         |    ELSE (cap.t_star * target_ppm) // 1000000 END AS BIGINT) AS alloc_tok,
         |  avail_tok - CAST(CASE WHEN target_ppm = 0 THEN 0
         |    ELSE (cap.t_star * target_ppm) // 1000000 END AS BIGINT)
         |    AS headroom_tok,
         |  CAST(CASE WHEN target_ppm > 0
         |    AND (avail_tok * 1000000) // target_ppm = cap.t_star
         |    THEN 1 ELSE 0 END AS BIGINT) AS binding
         |FROM tg, cap ORDER BY source""".stripMargin,
    "q251_fd_audit" -> {
      def fdCte(tag: String, lexpr: String, rexpr: String, fd: String) =
        s"""a$tag AS (SELECT l, count(DISTINCT r) AS nd, count(*) AS n FROM (
           |    SELECT $lexpr AS l, $rexpr AS r FROM documents) GROUP BY l),
           |r$tag AS (SELECT '$fd' AS fd,
           |    CAST(count(*) AS BIGINT) AS n_groups,
           |    CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_violating_groups,
           |    CAST(sum(CASE WHEN nd >= 2 THEN n ELSE 0 END) AS BIGINT)
           |      AS n_rows_in_violation,
           |    CAST(CASE WHEN sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) = 0
           |      THEN 1 ELSE 0 END AS BIGINT) AS holds
           |  FROM a$tag)""".stripMargin
      "WITH " +
        fdCte("1", "coalesce(CAST(doc_id AS VARCHAR), chr(2))",
          "coalesce(lang, chr(2))", "doc_id->lang") + ",\n" +
        fdCte("2", "coalesce(lang, chr(2))",
          "coalesce(source, chr(2))", "lang->source") + ",\n" +
        fdCte("3",
          "concat_ws(chr(1), coalesce(lang, chr(2)), coalesce(source, chr(2)))",
          "coalesce(CAST(n_chars // 100 AS VARCHAR), chr(2))",
          "lang,source->len_band") + "\n" +
        """SELECT * FROM r1 UNION ALL SELECT * FROM r2
          |UNION ALL SELECT * FROM r3 ORDER BY fd""".stripMargin
    },
    "q252_trend_slope" ->
      """WITH b AS (SELECT event_type AS g,
        |    epoch_us(ts) // 3600000000 AS h FROM events),
        |h0 AS (SELECT min(h) AS h0 FROM b),
        |c AS (SELECT g, x, CAST(count(*) AS BIGINT) AS y FROM (
        |    SELECT g, h - h0.h0 AS x FROM b, h0) GROUP BY g, x),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n_hours,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM c GROUP BY g),
        |s AS (SELECT g, n_hours, sy,
        |    CAST(n_hours AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |    CAST(n_hours AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
        |  FROM a)
        |SELECT g AS event_type, n_hours, sy AS n_events,
        |  CAST(CASE WHEN den = 0 THEN NULL
        |    WHEN num >= 0 THEN (num * 1000000) // den
        |    ELSE -((-num * 1000000) // den) END AS BIGINT) AS slope_micro
        |FROM s ORDER BY event_type""".stripMargin,
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
    "q254_json_props" ->
      """WITH e AS (SELECT event_type AS g,
        |    CASE WHEN event_id % 17 = 0 THEN '{"other": 1}' ELSE props END
        |      AS props
        |  FROM events),
        |v AS (SELECT g,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS v FROM e),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_missing,
        |    CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |    CAST(min(v) AS BIGINT) AS v_min, CAST(max(v) AS BIGINT) AS v_max,
        |    CAST(sum(coalesce(v, 0)) AS BIGINT) AS v_sum
        |  FROM v GROUP BY g)
        |SELECT g AS event_type, n, n_missing,
        |  (n_missing * 1000000) // n AS missing_ppm,
        |  n_distinct, v_min, v_max, v_sum
        |FROM a ORDER BY event_type""".stripMargin,
    "q255_churn_hazard" ->
      """WITH lt AS (
        |  SELECT user_id,
        |    max(epoch_us(ts) // 86400000000) - min(epoch_us(ts) // 86400000000)
        |      AS lifetime
        |  FROM events GROUP BY user_id),
        |h AS (SELECT lifetime AS t, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM lt GROUP BY lifetime),
        |r AS (SELECT t, n_churned, CAST(sum(n_churned) OVER (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |    AS n_at_risk
        |  FROM h)
        |SELECT CAST(t AS BIGINT) AS t, n_at_risk, n_churned,
        |  (n_churned * 1000000) // n_at_risk AS hazard_ppm
        |FROM r ORDER BY t""".stripMargin,
    "q256_rbo_agreement" ->
      (s"WITH $bm25SearchCtes,\n" +
        s"""wt AS (SELECT rr, CAST(dv AS BIGINT) AS dv FROM (VALUES
           |  ${graft.ext.Curation.rboWeights(10, 900L).zipWithIndex
                .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")})
           |  AS d(rr, dv)),
           |""".stripMargin +
        """tfr AS (SELECT qt.q_id, p.doc_id, CAST(sum(p.tf) AS BIGINT) AS s2
          |  FROM p JOIN qt USING (t) GROUP BY qt.q_id, p.doc_id),
          |tr2 AS (SELECT q_id, doc_id,
          |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY s2 DESC, doc_id)
          |    AS BIGINT) AS rnk FROM tfr),
          |joint AS (SELECT r.q_id, greatest(r.rnk, tr2.rnk) AS m
          |  FROM r JOIN tr2 USING (q_id, doc_id)
          |  WHERE r.rnk <= 10 AND tr2.rnk <= 10),
          |dep AS (SELECT q_id, unnest(generate_series(m, 10)) AS d FROM joint),
          |ov AS (SELECT q_id, d, CAST(count(*) AS BIGINT) AS ov
          |  FROM dep GROUP BY q_id, d),
          |tm AS (SELECT q_id, CAST(sum((wt.dv * ov.ov) // ov.d) AS BIGINT)
          |    AS num, CAST(max(ov) AS BIGINT) AS n_common
          |  FROM ov JOIN wt ON wt.rr = ov.d GROUP BY q_id),
          |qs AS (SELECT DISTINCT q_id FROM q)
          |SELECT CAST(qs.q_id AS BIGINT) AS q_id,
          |  coalesce(tm.n_common, 0) AS n_common,
          |  CAST((coalesce(tm.num, 0) * 1000000) // """.stripMargin +
        s"${graft.ext.Curation.rboWeights(10, 900L).sum} AS BIGINT) AS rbo_ppm\n" +
        "FROM qs LEFT JOIN tm USING (q_id) ORDER BY q_id"),
    "q257_fellegi_sunter" -> {
      val (wa0, wd0) = graft.ext.Dedup.fsWeights(900L, 150L)
      val (wa1, wd1) = graft.ext.Dedup.fsWeights(800L, 100L)
      val (wa2, wd2) = graft.ext.Dedup.fsWeights(850L, 200L)
      raw"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |cnt AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY doc_id, w),
         |gd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |  CAST(sum(c * c) AS BIGINT) AS sumsq FROM cnt GROUP BY doc_id),
         |gi AS (SELECT doc_id,
         |  1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS g, n_tok
         |  FROM gd),
         |f AS (SELECT d.doc_id, d.lang, d.n_chars // 50 AS band, d.source,
         |    gi.g // 50000 AS f1, gi.n_tok // 10 AS f2
         |  FROM documents d JOIN gi USING (doc_id)),
         |p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
         |    (CASE WHEN a.source IS NOT DISTINCT FROM b.source
         |       THEN $wa0 ELSE $wd0 END)
         |    + (CASE WHEN a.f1 IS NOT DISTINCT FROM b.f1
         |       THEN $wa1 ELSE $wd1 END)
         |    + (CASE WHEN a.f2 IS NOT DISTINCT FROM b.f2
         |       THEN $wa2 ELSE $wd2 END) AS score
         |  FROM f a JOIN f b ON a.lang = b.lang AND a.band = b.band
         |    AND a.doc_id < b.doc_id),
         |c AS (SELECT CASE WHEN score >= 4000000 THEN 'link'
         |    WHEN score <= 0 THEN 'nonlink' ELSE 'possible' END AS cls,
         |    score, id1 + id2 AS ps FROM p)
         |SELECT cls, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(score) AS BIGINT) AS sum_score_micro,
         |  CAST(sum(ps) AS BIGINT) AS checksum
         |FROM c GROUP BY cls ORDER BY cls""".stripMargin
    },
    "q258_term_movers" ->
      raw"""WITH mx AS (SELECT max(doc_id) // 2 AS h FROM documents),
         |o AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
         |  FROM documents, mx WHERE doc_id <= mx.h),
         |nn AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
         |  FROM documents, mx WHERE doc_id > mx.h),
         |co AS (SELECT term, CAST(count(*) AS BIGINT) AS c_old FROM o
         |  WHERE term <> '' GROUP BY term),
         |cn AS (SELECT term, CAST(count(*) AS BIGINT) AS c_new FROM nn
         |  WHERE term <> '' GROUP BY term),
         |j AS (SELECT coalesce(co.term, cn.term) AS term,
         |    coalesce(c_old, 0) AS c_old, coalesce(c_new, 0) AS c_new
         |  FROM co FULL OUTER JOIN cn ON co.term = cn.term),
         |g AS (SELECT term, c_old, c_new,
         |    ((c_new + 1) * 1000000) // (c_old + 1) AS lift_ppm
         |  FROM j WHERE c_new >= 5),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY lift_ppm DESC, term)
         |    AS BIGINT) AS rnk FROM g)
         |SELECT term, c_old, c_new, lift_ppm, rnk
         |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    "q259_sim_histogram" ->
      raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
         |  FROM documents),
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
         |j AS (
         |  SELECT d1, d2, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = d1
         |  JOIN sizes sb ON sb.doc_id = d2)
         |SELECT CAST(floor(jaccard * 10) AS BIGINT) AS sim_decile,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(d1 + d2) AS BIGINT) AS checksum
         |FROM j WHERE jaccard >= 0.1
         |GROUP BY sim_decile ORDER BY sim_decile""".stripMargin,
    "q260_conversion_latency" ->
      """WITH f AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |t AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS p
        |  FROM events WHERE event_type = 'purchase'),
        |lat AS (SELECT (min(p) - c) // 1000000 AS lat_s
        |  FROM f JOIN t USING (user_id) WHERE p >= c GROUP BY user_id, c),
        |tiers AS (SELECT lat_s, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lat GROUP BY lat_s),
        |offs AS (SELECT lat_s, cnt, coalesce(sum(cnt) OVER (ORDER BY lat_s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM tiers),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(lat_s) AS BIGINT) AS s FROM lat),
        |p50 AS (SELECT lat_s AS p50_s FROM tot, offs
        |  WHERE greatest(1, (n * 500000 + 999999) // 1000000) > off
        |    AND greatest(1, (n * 500000 + 999999) // 1000000) <= off + cnt),
        |p90 AS (SELECT lat_s AS p90_s FROM tot, offs
        |  WHERE greatest(1, (n * 900000 + 999999) // 1000000) > off
        |    AND greatest(1, (n * 900000 + 999999) // 1000000) <= off + cnt)
        |SELECT tot.n AS n_converted, p50.p50_s, p90.p90_s,
        |  (tot.s * 1000000) // tot.n AS mean_micro_s
        |FROM tot, p50, p90""".stripMargin,
    "q261_benford_audit" ->
      (s"""WITH ex AS (SELECT rr, CAST(dv AS BIGINT) AS dv FROM (VALUES
          |  ${graft.ext.Quality.benfordExpectedPpm.zipWithIndex
               .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")})
          |  AS d(rr, dv)),
          |""".stripMargin +
        """b AS (SELECT CAST(substr(CAST(CAST(floor(value * 1000) AS BIGINT)
          |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
          |  FROM events WHERE value > 0),
          |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM b
          |  GROUP BY digit),
          |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM g),
          |per AS (SELECT digit, n, (n * 1000000) // tn AS obs_ppm, ex.dv
          |    AS exp_ppm
          |  FROM g, tt JOIN ex ON ex.rr = g.digit),
          |dv AS (SELECT *, abs(obs_ppm - exp_ppm) AS dev_ppm FROM per),
          |tv AS (SELECT CAST(sum(dev_ppm) // 2 AS BIGINT) AS tvd_ppm FROM dv)
          |SELECT digit, n, obs_ppm, exp_ppm, dev_ppm, tv.tvd_ppm
          |FROM dv, tv ORDER BY digit""".stripMargin),
    "q262_centroid_shift" ->
      """WITH qe AS (
        |  SELECT CAST(label AS BIGINT) AS lab, vec_id % 2 AS h,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |su AS (SELECT lab, h, ii.i AS pos, CAST(sum(qv[ii.i]) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM qe CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) ii
        |  GROUP BY lab, h, ii.i),
        |mn AS (SELECT lab, h, pos,
        |  CAST((s - ((s % cnt + cnt) % cnt)) / cnt AS BIGINT) AS m, cnt
        |  FROM su)
        |SELECT a.lab AS label, CAST(min(a.cnt) AS BIGINT) AS n_a,
        |  CAST(min(b.cnt) AS BIGINT) AS n_b,
        |  CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS shift_sq
        |FROM mn a JOIN mn b ON a.lab = b.lab AND a.pos = b.pos
        |  AND a.h = 0 AND b.h = 1
        |GROUP BY a.lab ORDER BY label""".stripMargin,
    "q263_did_uplift" ->
      """WITH b AS (SELECT user_id AS u, epoch_us(ts) AS t,
        |    CAST(floor(value * 1000) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'error' AND value >= 300.0
        |      THEN 1 ELSE 0 END AS im
        |  FROM events),
        |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM b),
        |tr AS (SELECT DISTINCT u FROM b WHERE im = 1),
        |f AS (SELECT b.u,
        |    CASE WHEN tr.u IS NULL THEN 0 ELSE 1 END AS trf,
        |    CASE WHEN b.t >= mid.mid THEN 1 ELSE 0 END AS post, b.v
        |  FROM b LEFT JOIN tr ON tr.u = b.u, mid WHERE b.im = 0),
        |a AS (SELECT
        |    CAST(count(DISTINCT CASE WHEN trf = 1 THEN u END) AS BIGINT)
        |      AS n_treated,
        |    CAST(count(DISTINCT CASE WHEN trf = 0 THEN u END) AS BIGINT)
        |      AS n_control,
        |    CAST(sum(CASE WHEN trf = 1 AND post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_t0,
        |    CAST(sum(CASE WHEN trf = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
        |    CAST(sum(CASE WHEN trf = 1 AND post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_t1,
        |    CAST(sum(CASE WHEN trf = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
        |    CAST(sum(CASE WHEN trf = 0 AND post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_c0,
        |    CAST(sum(CASE WHEN trf = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
        |    CAST(sum(CASE WHEN trf = 0 AND post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_c1,
        |    CAST(sum(CASE WHEN trf = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1
        |  FROM f),
        |m AS (SELECT n_treated, n_control,
        |    CAST(CASE WHEN n_t0 = 0 THEN NULL WHEN s_t0 >= 0 THEN (s_t0 * 1000) // n_t0
        |      ELSE -((-s_t0 * 1000) // n_t0) END AS BIGINT) AS pre_t,
        |    CAST(CASE WHEN n_t1 = 0 THEN NULL WHEN s_t1 >= 0 THEN (s_t1 * 1000) // n_t1
        |      ELSE -((-s_t1 * 1000) // n_t1) END AS BIGINT) AS post_t,
        |    CAST(CASE WHEN n_c0 = 0 THEN NULL WHEN s_c0 >= 0 THEN (s_c0 * 1000) // n_c0
        |      ELSE -((-s_c0 * 1000) // n_c0) END AS BIGINT) AS pre_c,
        |    CAST(CASE WHEN n_c1 = 0 THEN NULL WHEN s_c1 >= 0 THEN (s_c1 * 1000) // n_c1
        |      ELSE -((-s_c1 * 1000) // n_c1) END AS BIGINT) AS post_c
        |  FROM a)
        |SELECT n_treated, n_control, pre_t, post_t, pre_c, post_c,
        |  (post_t - pre_t) - (post_c - pre_c) AS did_micro
        |FROM m""".stripMargin,
    "q264_capture_recapture" ->
      raw"""WITH b AS (SELECT doc_id,
         |    md5(array_to_string(list_sort(list_distinct(
         |      string_split_regex(trim(text), '\s+'))), ' ')) AS fp
         |  FROM documents),
         |ga AS (SELECT DISTINCT fp FROM b WHERE list_reduce(
         |    list_transform(string_split(md5('cra:' || CAST(doc_id AS VARCHAR)), '')[1:15],
         |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                ELSE unicode(c) - 48 END AS BIGINT)),
         |    (a, v) -> a * 16 + v) % 1000000 < 300000),
         |gb AS (SELECT DISTINCT fp FROM b WHERE list_reduce(
         |    list_transform(string_split(md5('crb:' || CAST(doc_id AS VARCHAR)), '')[1:15],
         |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                ELSE unicode(c) - 48 END AS BIGINT)),
         |    (a, v) -> a * 16 + v) % 1000000 < 300000),
         |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM ga),
         |n2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM gb),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ga JOIN gb USING (fp)),
         |tt AS (SELECT CAST(count(DISTINCT fp) AS BIGINT) AS true_distinct FROM b),
         |e AS (SELECT n1, n2, m, true_distinct,
         |    CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS est
         |  FROM n1, n2, mm, tt)
         |SELECT n1, n2, m, true_distinct, est,
         |  (abs(est - true_distinct) * 1000000) // true_distinct AS err_ppm
         |FROM e""".stripMargin,
    "q265_transition_rules" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |mt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM mt GROUP BY from_type),
        |tt AS (SELECT to_type, CAST(sum(n) AS BIGINT) AS n_to
        |  FROM mt GROUP BY to_type),
        |al AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM mt),
        |r AS (SELECT mt.from_type, mt.to_type, mt.n, ft.n_from,
        |    CAST((mt.n * 1000000) // ft.n_from AS BIGINT) AS confidence_ppm,
        |    tt.n_to, al.n_all
        |  FROM mt JOIN ft USING (from_type) JOIN tt USING (to_type), al
        |  WHERE mt.n >= 50)
        |SELECT from_type, to_type, n, n_from, confidence_ppm,
        |  CAST((CAST(confidence_ppm AS HUGEINT) * n_all) // n_to AS BIGINT)
        |    AS lift_ppm
        |FROM r ORDER BY from_type, to_type""".stripMargin,
    "q266_opening_paths" ->
      """WITH p AS (SELECT user_id,
        |    array_to_string(list(event_type ORDER BY ts, event_id)[1:4], '>')
        |      AS path
        |  FROM events GROUP BY user_id),
        |g AS (SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |  FROM p GROUP BY path),
        |r AS (SELECT path, n_users, CAST(row_number() OVER (
        |    ORDER BY n_users DESC, path) AS BIGINT) AS rnk FROM g)
        |SELECT path, n_users, rnk FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
    "q267_label_noise" ->
      (s"WITH ${knnVoteCtes("")},\n" +
        """fin AS (SELECT c1.q_id, eo.label AS own_label, c1.voted_label,
          |    c1.n_votes, tot.n_neighbors
          |  FROM c1 JOIN tot USING (q_id)
          |    JOIN embeddings eo ON eo.vec_id = c1.q_id),
          |fl AS (SELECT *, (n_votes * 1000000) // n_neighbors AS margin_ppm
          |  FROM fin WHERE own_label != voted_label)
          |SELECT CAST(own_label AS BIGINT) AS own_label,
          |  CAST(voted_label AS BIGINT) AS voted_label,
          |  CAST(count(*) AS BIGINT) AS n_flagged,
          |  CAST(sum(q_id) AS BIGINT) AS checksum
          |FROM fl WHERE margin_ppm >= 600000
          |GROUP BY own_label, voted_label
          |ORDER BY own_label, voted_label""".stripMargin),
    "q268_order_reconcile" ->
      """WITH l AS (SELECT l_orderkey AS k,
        |    CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |      AS DECIMAL(30,10))), 2) AS DOUBLE) AS l_total
        |  FROM lineitem GROUP BY l_orderkey),
        |j AS (SELECT o.o_orderkey AS k, o.o_totalprice AS h_total, l.l_total,
        |    CASE WHEN l.l_total IS NULL THEN NULL
        |      ELSE round(abs(l.l_total - o.o_totalprice), 2) END AS diff
        |  FROM orders o LEFT JOIN l ON l.k = o.o_orderkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_headers,
        |  CAST(sum(CASE WHEN l_total IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_no_lines,
        |  CAST(sum(CASE WHEN diff <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  CAST(sum(CASE WHEN diff > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatched,
        |  round(coalesce(max(diff), 0), 2) AS max_diff,
        |  CAST(round(sum(CAST(coalesce(diff, 0) AS DECIMAL(30,10))), 2)
        |    AS DOUBLE) AS sum_diff
        |FROM j""".stripMargin,
    "q272_script_audit" ->
      raw"""WITH d AS (SELECT lang, text ||
         |    (CASE WHEN doc_id % 13 = 0 THEN ' привет мир' ELSE '' END) ||
         |    (CASE WHEN doc_id % 29 = 0 THEN ' 你好世界' ELSE '' END) ||
         |    (CASE WHEN doc_id % 37 = 0 THEN ' αβγδ' ELSE '' END) AS text
         |  FROM documents),
         |p AS (SELECT lang,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS cyr,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS grk,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS ara,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS cjk
         |  FROM d),
         |f AS (SELECT lang, cyr, grk, ara, cjk,
         |    CASE WHEN greatest(cyr, grk, ara, cjk) = 0 THEN 'none'
         |         WHEN cyr = greatest(cyr, grk, ara, cjk) THEN 'cyrillic'
         |         WHEN grk = greatest(cyr, grk, ara, cjk) THEN 'greek'
         |         WHEN ara = greatest(cyr, grk, ara, cjk) THEN 'arabic'
         |         ELSE 'cjk' END AS foreign_script
         |  FROM p)
         |SELECT lang, foreign_script, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(cyr + grk + ara + cjk) AS BIGINT) AS n_foreign_chars
         |FROM f GROUP BY lang, foreign_script
         |ORDER BY lang, foreign_script""".stripMargin,
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
    "q274_cluster_split" ->
      (s"WITH RECURSIVE $ccJaccardCtes,\n" +
        """lab AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
          |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
          |sp AS (SELECT doc_id, comp,
          |    CASE WHEN ((comp % 1000003) * 2654435761) % 1000 < 800
          |      THEN 'train' ELSE 'eval' END AS split
          |  FROM lab),
          |lk AS (SELECT CAST(coalesce(sum(CASE WHEN a.split != b.split
          |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_leaky_pairs
          |  FROM pairs p JOIN sp a ON a.doc_id = p.d1
          |               JOIN sp b ON b.doc_id = p.d2)
          |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(DISTINCT comp) AS BIGINT) AS n_clusters,
          |  CAST(sum(doc_id) AS BIGINT) AS checksum, lk.n_leaky_pairs
          |FROM sp CROSS JOIN lk
          |GROUP BY split, lk.n_leaky_pairs ORDER BY split""".stripMargin),
    "q275_zipf_slope" ->
      raw"""WITH w AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w
         |  WHERE len(w) > 0 GROUP BY w),
         |r AS (SELECT * FROM (SELECT w, c, CAST(row_number() OVER (
         |    ORDER BY c DESC, w) AS BIGINT) AS rank FROM cnt)
         |  WHERE rank <= 1000),
         |p AS (SELECT CAST(length(bin(rank)) AS BIGINT) AS x,
         |    CAST(length(bin(c)) AS BIGINT) AS y FROM r),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         |    sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
         |  FROM p),
         |s AS (SELECT n_points, sy,
         |    CAST(CAST(n_points AS DECIMAL(38,0)) * sxy
         |      - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS num,
         |    CAST(CAST(n_points AS DECIMAL(38,0)) * sxx
         |      - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS den
         |  FROM m)
         |SELECT n_points, sy AS checksum,
         |  CAST(CASE WHEN den = 0 THEN NULL
         |    WHEN num >= 0 THEN (num * 1000000) // den
         |    ELSE -((-num * 1000000) // den) END AS BIGINT) AS slope_micro
         |FROM s""".stripMargin,
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
    "q281_skew_forecast" ->
      """WITH ev AS (SELECT CASE WHEN user_id % 10 = 0 THEN 1
        |    ELSE user_id END AS user_id FROM events),
        |b AS (SELECT user_id, (list_reduce(list_transform(
        |    string_split(md5(CAST(user_id AS VARCHAR)), '')[1:15],
        |    c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |              ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v) % 16) AS bucket FROM ev),
        |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
        |  FROM b GROUP BY bucket),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS nb FROM g)
        |SELECT bucket, n_rows, n_keys,
        |  CAST((n_rows * nb * 1000000) // t AS BIGINT) AS load_ppm
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
    "q282_lineage_chain" ->
      """WITH v1 AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 400),
        |v2 AS (SELECT * FROM v1 UNION ALL
        |  SELECT doc_id, n_chars FROM documents WHERE doc_id >= 400),
        |v3 AS (SELECT * FROM v2 WHERE doc_id % 7 != 0),
        |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(doc_id AS HUGEINT) * 1000003 + n_chars) AS VARCHAR)
        |    AS cs FROM v1),
        |m2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(doc_id AS HUGEINT) * 1000003 + n_chars) AS VARCHAR)
        |    AS cs FROM v2),
        |m3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(doc_id AS HUGEINT) * 1000003 + n_chars) AS VARCHAR)
        |    AS cs FROM v3),
        |c1 AS (SELECT CAST(1 AS BIGINT) AS version, n, cs,
        |  md5('1:' || CAST(n AS VARCHAR) || ':' || cs || ':genesis') AS h
        |  FROM m1),
        |c2 AS (SELECT CAST(2 AS BIGINT) AS version, m2.n, m2.cs,
        |  md5('2:' || CAST(m2.n AS VARCHAR) || ':' || m2.cs || ':' || c1.h)
        |    AS h FROM m2, c1),
        |c3 AS (SELECT CAST(3 AS BIGINT) AS version, m3.n, m3.cs,
        |  md5('3:' || CAST(m3.n AS VARCHAR) || ':' || m3.cs || ':' || c2.h)
        |    AS h FROM m3, c2)
        |SELECT version, n AS n_rows, cs AS checksum, h AS chain_hash
        |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |      UNION ALL SELECT * FROM c3) ORDER BY version""".stripMargin,
    "q286_column_diff" ->
      """WITH o AS (SELECT doc_id, text, lang, n_chars FROM documents),
        |n AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN 'v2 ' || text ELSE text END AS text,
        |    CASE WHEN doc_id % 9 = 0 THEN 'xx' ELSE lang END AS lang,
        |    n_chars
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text, lang, n_chars FROM documents
        |  WHERE doc_id < 20),
        |j AS (SELECT o.doc_id AS ok, n.doc_id AS nk,
        |    o.text AS ot, n.text AS nt, o.lang AS ol, n.lang AS nl,
        |    o.n_chars AS oc, n.n_chars AS nc
        |  FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(sum(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |    AND NOT (ot IS NOT DISTINCT FROM nt) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS chg_text,
        |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |    AND NOT (ol IS NOT DISTINCT FROM nl) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS chg_lang,
        |  CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
        |    AND NOT (oc IS NOT DISTINCT FROM nc) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS chg_n_chars
        |  FROM j)
        |SELECT * FROM (
        |  SELECT 'text' AS column, chg_text AS n_changed, n_added,
        |    n_removed, n_common FROM a
        |  UNION ALL SELECT 'lang', chg_lang, n_added, n_removed, n_common
        |    FROM a
        |  UNION ALL SELECT 'n_chars', chg_n_chars, n_added, n_removed,
        |    n_common FROM a)
        |ORDER BY "column"""".stripMargin,
    "q285_source_influence" ->
      (s"""WITH b AS (SELECT source,
          |    CAST(floor(round(
          |      0.5 * round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '',
          |        'g')) AS DOUBLE) / greatest(length(text), 1), 6)
          |      + 0.3 * least(round(CAST(len(list_filter(
          |          string_split_regex(trim(text), '\\s+'),
          |          t -> list_contains($stopList, t))) AS DOUBLE)
          |        / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
          |        6) * 3, 1.0)
          |      + 0.2 * least(round(CAST(length(regexp_replace(text, '\\s+',
          |          '', 'g')) AS DOUBLE)
          |        / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
          |        6) / 8, 1.0), 6) * 1000000) AS BIGINT) AS m
          |  FROM documents),
          |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
          |    CAST(sum(m) AS BIGINT) AS s_s FROM b GROUP BY source),
          |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS N,
          |    CAST(sum(s_s) AS BIGINT) AS S FROM per)
          |SELECT source, n_s AS n_docs,
          |  CAST(CASE WHEN s_s >= 0 THEN s_s // n_s
          |    ELSE -((-s_s) // n_s) END AS BIGINT) AS mean_micro,
          |  CAST(CASE WHEN N = n_s THEN NULL
          |    WHEN (CAST(s_s AS HUGEINT) * N - CAST(S AS HUGEINT) * n_s) >= 0
          |      THEN (CAST(s_s AS HUGEINT) * N - CAST(S AS HUGEINT) * n_s)
          |        // (CAST(N AS HUGEINT) * (N - n_s))
          |    ELSE -((CAST(S AS HUGEINT) * n_s - CAST(s_s AS HUGEINT) * N)
          |        // (CAST(N AS HUGEINT) * (N - n_s)))
          |    END AS BIGINT) AS influence_micro
          |FROM per CROSS JOIN tot ORDER BY source""".stripMargin),
    "q283_rendezvous_shards" ->
      """WITH n8 AS (SELECT unnest(['n0','n1','n2','n3','n4','n5','n6','n7'])
        |    AS node),
        |n9 AS (SELECT node FROM n8 UNION ALL SELECT 'n8'),
        |w8 AS (SELECT d.doc_id, n.node, (list_reduce(list_transform(
        |    string_split(md5(n.node || ':' || CAST(d.doc_id AS VARCHAR)),
        |      '')[1:15],
        |    c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |              ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v)) AS h
        |  FROM documents d CROSS JOIN n8 n),
        |a8 AS (SELECT doc_id, node FROM (SELECT doc_id, node,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, node DESC)
        |      AS rn FROM w8) WHERE rn = 1),
        |w9 AS (SELECT d.doc_id, n.node, (list_reduce(list_transform(
        |    string_split(md5(n.node || ':' || CAST(d.doc_id AS VARCHAR)),
        |      '')[1:15],
        |    c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |              ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v)) AS h
        |  FROM documents d CROSS JOIN n9 n),
        |a9 AS (SELECT doc_id, node FROM (SELECT doc_id, node,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, node DESC)
        |      AS rn FROM w9) WHERE rn = 1)
        |SELECT a8.node, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN a9.node != a8.node THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved,
        |  CAST(sum(a8.doc_id) AS BIGINT) AS checksum
        |FROM a8 JOIN a9 ON a9.doc_id = a8.doc_id
        |GROUP BY a8.node ORDER BY a8.node""".stripMargin,
    "q284_source_centroids" ->
      """WITH q AS (SELECT label AS g, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |s AS (SELECT g, dd.i AS d, CAST(sum(qv[dd.i]) AS BIGINT) AS sv
        |  FROM q CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dd
        |  GROUP BY g, dd.i),
        |p AS (SELECT a.g AS ga, b.g AS gb,
        |    sum(CAST(a.sv AS HUGEINT) * b.sv) AS dot
        |  FROM s a JOIN s b ON a.d = b.d AND a.g <= b.g GROUP BY 1, 2),
        |nrm AS (SELECT ga AS g, dot AS nsq FROM p WHERE ga = gb)
        |SELECT p.ga, p.gb, round(CAST(p.dot AS DOUBLE)
        |    / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))),
        |  5) AS cos
        |FROM p JOIN nrm na ON na.g = p.ga JOIN nrm nb ON nb.g = p.gb
        |WHERE p.ga != p.gb ORDER BY p.ga, p.gb""".stripMargin,
    "q278_approx_groupby" ->
      (s"""WITH base AS (SELECT l_returnflag AS g,
          |    CAST(l_orderkey AS VARCHAR) || '_' ||
          |      CAST(l_linenumber AS VARCHAR) AS k,
          |    CAST(floor(l_quantity * 1000) AS BIGINT) AS m FROM lineitem),
          |samp AS (SELECT * FROM base
          |  WHERE ${md5ModSql("'aq:' || k")} < 100000),
          |est AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sampled,
          |    CAST(sum(m) AS BIGINT) AS s_m FROM samp GROUP BY g),
          |rep0 AS (SELECT g, m, bb.b AS b,
          |    ${md5ModSql("'aqb:' || CAST(bb.b AS VARCHAR) || ':' || k")} AS h
          |  FROM samp CROSS JOIN
          |    (SELECT unnest(generate_series(1, 16)) AS b) bb),
          |rep1 AS (SELECT g, b, m,
          |    CASE WHEN h < 367879 THEN 0 WHEN h < 735759 THEN 1
          |         WHEN h < 919699 THEN 2 WHEN h < 981012 THEN 3
          |         WHEN h < 996340 THEN 4 WHEN h < 999406 THEN 5
          |         ELSE 6 END AS w
          |  FROM rep0),
          |rep2 AS (SELECT g, b, CAST(sum(w) AS BIGINT) AS n_eff,
          |    CAST(sum(w * m) AS BIGINT) AS wm FROM rep1 GROUP BY g, b),
          |rep3 AS (SELECT g, b,
          |    CASE WHEN wm >= 0 THEN wm // n_eff
          |      ELSE -((-wm) // n_eff) END AS mean_b
          |  FROM rep2 WHERE n_eff > 0),
          |ci AS (SELECT g, CAST(min(mean_b) AS BIGINT) AS ci_lo_milli,
          |    CAST(max(mean_b) AS BIGINT) AS ci_hi_milli FROM rep3 GROUP BY g),
          |tr AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
          |    CAST(sum(m) AS BIGINT) AS t_m FROM base GROUP BY g)
          |SELECT tr.g, tr.n_rows,
          |  coalesce(est.n_sampled, 0) AS n_sampled,
          |  CAST(CASE WHEN t_m >= 0 THEN t_m // n_rows
          |    ELSE -((-t_m) // n_rows) END AS BIGINT) AS true_mean_milli,
          |  CAST(CASE WHEN s_m IS NULL THEN NULL
          |    WHEN s_m >= 0 THEN s_m // n_sampled
          |    ELSE -((-s_m) // n_sampled) END AS BIGINT) AS est_mean_milli,
          |  ci.ci_lo_milli, ci.ci_hi_milli,
          |  CAST(CASE WHEN t_m >= 0 THEN t_m // n_rows
          |      ELSE -((-t_m) // n_rows) END
          |    BETWEEN ci.ci_lo_milli AND ci.ci_hi_milli AS BIGINT) AS inside
          |FROM tr LEFT JOIN est ON est.g = tr.g
          |        LEFT JOIN ci ON ci.g = tr.g
          |ORDER BY tr.g""".stripMargin),
    "q279_join_size_estimate" ->
      """WITH sa AS (SELECT r, b, CAST(count(*) AS BIGINT) AS ca FROM (
        |    SELECT rr.r AS r, (list_reduce(list_transform(
        |        string_split(md5(CAST(rr.r AS VARCHAR) || ':' ||
        |          CAST(o_orderkey AS VARCHAR)), '')[1:11],
        |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                  ELSE unicode(c) - 48 END AS BIGINT)),
        |      (a, v) -> a * 16 + v) % 256) AS b
        |    FROM orders CROSS JOIN
        |      (SELECT unnest(generate_series(0, 3)) AS r) rr)
        |  GROUP BY r, b),
        |sb AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cb FROM (
        |    SELECT rr.r AS r, (list_reduce(list_transform(
        |        string_split(md5(CAST(rr.r AS VARCHAR) || ':' ||
        |          CAST(l_orderkey AS VARCHAR)), '')[1:11],
        |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                  ELSE unicode(c) - 48 END AS BIGINT)),
        |      (a, v) -> a * 16 + v) % 256) AS b
        |    FROM lineitem CROSS JOIN
        |      (SELECT unnest(generate_series(0, 3)) AS r) rr)
        |  GROUP BY r, b),
        |ip AS (SELECT sa.r, sum(CAST(ca AS HUGEINT) * cb) AS ip
        |  FROM sa JOIN sb ON sa.r = sb.r AND sa.b = sb.b GROUP BY sa.r),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
        |ca2 AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na
        |  FROM orders GROUP BY o_orderkey),
        |cb2 AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
        |  FROM lineitem GROUP BY l_orderkey),
        |tr AS (SELECT CAST(coalesce(sum(CAST(na AS HUGEINT) * nb), 0)
        |    AS BIGINT) AS true_join_rows
        |  FROM ca2 JOIN cb2 ON ca2.k = cb2.k)
        |SELECT est_join_rows, true_join_rows,
        |  CAST((abs(est_join_rows - true_join_rows) * 1000000)
        |    // greatest(true_join_rows, 1) AS BIGINT) AS err_ppm
        |FROM est CROSS JOIN tr""".stripMargin,
    "q276_truncation_audit" ->
      """WITH d AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || '.' ELSE text END AS text
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN trim(text) != '' AND NOT regexp_matches(
        |    trim(text), '[.!?…。！？]$') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_truncated
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q269_length_histogram" ->
      raw"""WITH b AS (SELECT source,
         |    CAST(length(bin(CAST(len(string_split_regex(trim(text), '\s+'))
         |      AS BIGINT))) AS BIGINT) AS bucket
         |  FROM documents)
         |SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,
    "q270_text_hygiene" ->
      """WITH d AS (SELECT source,
        |    (CASE WHEN doc_id % 11 = 0 THEN '  ' ELSE '' END) || text ||
        |    (CASE WHEN doc_id % 23 = 0 THEN chr(160) ELSE '' END) ||
        |    (CASE WHEN doc_id % 31 = 0 THEN chr(7) ELSE '' END) AS text
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_empty,
        |  CAST(sum(CASE WHEN regexp_matches(text, '^ | $') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_untrimmed,
        |  CAST(sum(CASE WHEN regexp_matches(text, '  ') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_multispace,
        |  CAST(sum(CASE WHEN regexp_matches(text,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_control,
        |  CAST(sum(CASE WHEN regexp_matches(text, chr(160)) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_nbsp
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q271_cell_label_noise" ->
      (s"WITH ${kmeansCtesE(semDedupK, 2, 64)},\n${kmeansAssign(3, "c2", 64)},\n" +
        """lab AS (SELECT vec_id, label FROM embeddings),
          |wc AS (SELECT a3.vec_id, a3.cell, l.label
          |  FROM a3 JOIN lab l USING (vec_id)),
          |sims AS (SELECT x.vec_id AS q_id, y.vec_id AS c_id,
          |    x.label AS own_label, y.label AS c_label,
          |    round(list_sum(list_transform(generate_series(1, 64),
          |      i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
          |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
          |         i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(eq.embedding[i] AS DOUBLE))))
          |     * sqrt(list_sum(list_transform(generate_series(1, 64),
          |         i -> CAST(ec.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE))))), 5)
          |      AS sim
          |  FROM wc x JOIN wc y ON x.cell = y.cell AND x.vec_id != y.vec_id
          |    JOIN embeddings eq ON eq.vec_id = x.vec_id
          |    JOIN embeddings ec ON ec.vec_id = y.vec_id),
          |nn AS (SELECT * FROM (SELECT q_id, c_id, own_label, c_label, sim,
          |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
          |      AS rnk FROM sims) t
          |  WHERE rnk <= 5 AND c_label IS NOT NULL),
          |v AS (SELECT q_id, own_label, c_label,
          |    CAST(count(*) AS BIGINT) AS n_votes
          |  FROM nn GROUP BY q_id, own_label, c_label),
          |tot AS (SELECT q_id, CAST(sum(n_votes) AS BIGINT) AS n_neighbors
          |  FROM v GROUP BY q_id),
          |cons AS (SELECT q_id, own_label, c_label AS voted_label, n_votes
          |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          |    ORDER BY n_votes DESC, c_label) AS vrnk FROM v) t
          |  WHERE vrnk = 1),
          |fl AS (SELECT cons.q_id, own_label, voted_label, n_votes,
          |    (n_votes * 1000000) // tot.n_neighbors AS margin_ppm
          |  FROM cons JOIN tot USING (q_id)
          |  WHERE own_label != voted_label)
          |SELECT CAST(own_label AS BIGINT) AS own_label,
          |  CAST(voted_label AS BIGINT) AS voted_label,
          |  CAST(count(*) AS BIGINT) AS n_flagged,
          |  CAST(sum(q_id) AS BIGINT) AS checksum
          |FROM fl WHERE margin_ppm >= 600000
          |GROUP BY own_label, voted_label
          |ORDER BY own_label, voted_label""".stripMargin),
    "q226_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, n_chars // 50 AS len_band,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT doc_id % 7) AS BIGINT) AS ldiv
        |  FROM documents GROUP BY lang, source, len_band)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
        |  CAST(sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_ldiv_groups,
        |  CAST(sum(CASE WHEN n < 5 OR ldiv < 3 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
        |  CAST(min(n) AS BIGINT) AS min_group_size,
        |  CAST(min(ldiv) AS BIGINT) AS min_ldiv
        |FROM g""".stripMargin,
    "q225_term_associations" ->
      raw"""WITH dt AS (
         |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
         |  FROM documents),
         |total AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dt),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM dt GROUP BY t),
         |probes AS (SELECT * FROM (VALUES ('table'), ('slow'), ('merge')) AS x(p)),
         |pd AS (SELECT p, doc_id FROM dt JOIN probes ON dt.t = probes.p),
         |co AS (
         |  SELECT pd.p, dt.t, CAST(count(*) AS BIGINT) AS n_xy
         |  FROM pd JOIN dt USING (doc_id)
         |  WHERE dt.t <> pd.p
         |  GROUP BY pd.p, dt.t
         |  HAVING count(*) >= 5),
         |lift AS (
         |  SELECT co.p, co.t, co.n_xy,
         |    CAST((CAST(co.n_xy AS HUGEINT) * 1000000 * total.n_docs) //
         |         (px.n_t * dy.n_t) AS BIGINT) AS lift_ppm
         |  FROM co JOIN df px ON px.t = co.p
         |          JOIN df dy ON dy.t = co.t, total),
         |r AS (
         |  SELECT p, t, n_xy, lift_ppm, CAST(row_number() OVER (
         |    PARTITION BY p ORDER BY lift_ppm DESC, t) AS BIGINT) AS rnk
         |  FROM lift)
         |SELECT p AS probe, t AS term, n_xy, lift_ppm, rnk
         |FROM r WHERE rnk <= 5 ORDER BY probe, rnk""".stripMargin,
    "q224_mixed_language" ->
      (raw"""WITH uni AS (
          |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
          |    THEN text || ' le la les de et un est le la de et est'
          |    ELSE text END AS text
          |  FROM documents),
          |tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM uni),
          |hv AS (
          |  SELECT doc_id,
          |    array_to_string(w[1 : (len(w) + 1) // 2], ' ') AS t1,
          |    array_to_string(w[(len(w) + 1) // 2 + 1 :], ' ') AS t2
          |  FROM tk),
          |""".stripMargin +
        s"sc AS (\n  SELECT doc_id,\n    ${langScoreCols("t1", "h")},\n    ${langScoreCols("t2", "t")}\n  FROM hv),\n" +
        s"p AS (\n  SELECT doc_id,\n    ${langPredSql("h")} AS lang_head,\n    ${langPredSql("t")} AS lang_tail\n  FROM sc),\n" +
        """m AS (
          |  SELECT doc_id, lang_head, lang_tail,
          |    CAST(CASE WHEN lang_head <> lang_tail AND lang_head <> 'und'
          |         AND lang_tail <> 'und' THEN 1 ELSE 0 END AS BIGINT) AS mixed
          |  FROM p)
          |SELECT lang_head, lang_tail, mixed, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(doc_id) AS BIGINT) AS checksum
          |FROM m GROUP BY lang_head, lang_tail, mixed
          |ORDER BY lang_head, lang_tail, mixed""".stripMargin),
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
    "q222_preference_pairs" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |cnt AS (
         |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY doc_id, lang, w),
         |d AS (
         |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tok,
         |    CAST(sum(c * c) AS BIGINT) AS sumsq
         |  FROM cnt GROUP BY doc_id, lang),
         |g AS (
         |  SELECT doc_id, lang AS strat,
         |    1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS x
         |  FROM d),
         |r AS (
         |  SELECT doc_id, strat, x,
         |    CAST(row_number() OVER (PARTITION BY strat ORDER BY x DESC, doc_id) AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY strat) AS BIGINT) // 2 AS h
         |  FROM g),
         |top AS (SELECT strat, doc_id AS chosen_id, x AS cs, r + h AS pr FROM r WHERE r <= h),
         |bot AS (SELECT strat, doc_id AS rejected_id, x AS rs, r AS pr FROM r),
         |p AS (
         |  SELECT top.strat, chosen_id, rejected_id, cs, rs, cs - rs AS gap
         |  FROM top JOIN bot USING (strat, pr)
         |  WHERE cs - rs >= 100000)
         |SELECT strat, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(gap) AS BIGINT) AS sum_gap, CAST(min(gap) AS BIGINT) AS min_gap,
         |  CAST(sum(chosen_id - rejected_id) AS BIGINT) AS pair_checksum
         |FROM p GROUP BY strat ORDER BY strat""".stripMargin,
    "q221_exact_split" ->
      """WITH b AS (
        |  SELECT doc_id, source AS strat,
        |    md5('split' || ':' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, strat,
        |    CAST(row_number() OVER (PARTITION BY strat ORDER BY sk, doc_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY strat) AS BIGINT) AS n
        |  FROM b),
        |sp AS (
        |  SELECT doc_id, strat,
        |    CASE WHEN r <= (n * 800) // 1000 THEN 'train'
        |         WHEN r <= (n * 900) // 1000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM r)
        |SELECT strat, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM sp GROUP BY strat, split ORDER BY strat, split""".stripMargin,
    "q220_quantile_normalize" ->
      """WITH b AS (
        |  SELECT doc_id, source AS strat, CAST(n_chars AS BIGINT) AS x FROM documents),
        |t AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY x),
        |o AS (SELECT x AS vx, cnt, CAST(coalesce(sum(cnt) OVER (
        |    ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
        |  FROM t),
        |r AS (
        |  SELECT doc_id, strat, x,
        |    CAST(row_number() OVER (PARTITION BY strat ORDER BY x, doc_id) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY strat) AS BIGINT) AS n_s,
        |    (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_total
        |  FROM b),
        |m AS (
        |  SELECT doc_id, strat, x, ((r - 1) * n_total) // n_s + 1 AS i FROM r),
        |j AS (
        |  SELECT m.doc_id, m.strat, m.x, o.vx AS norm
        |  FROM m JOIN o ON m.i > o.off AND m.i <= o.off + o.cnt)
        |SELECT strat, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(x) AS BIGINT) AS sum_raw, CAST(sum(norm) AS BIGINT) AS sum_norm,
        |  CAST(min(norm) AS BIGINT) AS min_norm, CAST(max(norm) AS BIGINT) AS max_norm
        |FROM j GROUP BY strat ORDER BY strat""".stripMargin,
    "q218_rate_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, h),
        |med AS (SELECT event_type, CAST(4 * quantile_cont(x, 0.5) AS BIGINT) AS med4
        |        FROM hourly GROUP BY event_type),
        |dev AS (SELECT b.event_type, b.h, b.x, m.med4, abs(b.x * 4 - m.med4) AS dev4
        |        FROM hourly b JOIN med m ON m.event_type = b.event_type),
        |mad AS (SELECT event_type, CAST(2 * quantile_cont(dev4, 0.5) AS BIGINT) AS mad8
        |        FROM dev GROUP BY event_type),
        |z AS (SELECT d.event_type, d.h,
        |        (2000000 * (d.x * 4 - d.med4)) // greatest(mad8, 1) AS z_ppm
        |      FROM dev d JOIN mad ON mad.event_type = d.event_type)
        |SELECT event_type AS strat, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(CASE WHEN abs(z_ppm) > 4000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
        |  CAST(max(abs(z_ppm)) AS BIGINT) AS max_abs_z_ppm
        |FROM z GROUP BY event_type ORDER BY strat""".stripMargin,
    "q217_freshness_decay" ->
      """WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
        |w AS (
        |  SELECT event_type,
        |    1000000 // (1 << least(
        |      (epoch_us(ref_ts) // 3600000000 - epoch_us(ts) // 3600000000) // 72,
        |      20)) AS w_ppm
        |  FROM events, ref)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(w_ppm) AS BIGINT) AS decayed_mass_ppm,
        |  CAST(max(w_ppm) AS BIGINT) AS max_w, CAST(min(w_ppm) AS BIGINT) AS min_w
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q216_ann_recall_audit" ->
      (s"WITH $ivfTopKCtes,\n" +
        """ivf AS (SELECT q_id, c_id, rnk FROM r WHERE rnk <= 3),
          |bs AS (
          |  SELECT q.vec_id AS q_id, c2.vec_id AS c_id, round(
          |    list_sum(list_transform(generate_series(1, 64),
          |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
          |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
          |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
          |     * sqrt(list_sum(list_transform(generate_series(1, 64),
          |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
          |  FROM embeddings q, embeddings c2
          |  WHERE q.vec_id < 10 AND c2.vec_id != q.vec_id),
          |gold AS (
          |  SELECT q_id, c_id AS gold_id FROM (
          |    SELECT q_id, c_id, row_number() OVER (
          |      PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn FROM bs)
          |  WHERE rn = 1)
          |SELECT g.q_id, g.gold_id,
          |  CAST(coalesce(min(i.rnk), 0) AS BIGINT) AS found_rank,
          |  CAST(CASE WHEN min(i.rnk) IS NULL THEN 0
          |       ELSE 1000000 // min(i.rnk) END AS BIGINT) AS mrr_ppm
          |FROM gold g LEFT JOIN ivf i ON i.q_id = g.q_id AND i.c_id = g.gold_id
          |GROUP BY g.q_id, g.gold_id ORDER BY g.q_id""".stripMargin),
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
    // q49 = the deterministic LSH-ANN restatement (q103's CTEs) at k = 5
    // over the second query decade.
    "q49_ann_lsh" ->
      """WITH qe AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |bt AS (
        |  SELECT vec_id, tt.t AS t,
        |    CAST(list_sum(list_transform(generate_series(0, 5), p ->
        |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
        |        i -> qv[i] * (((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071)
        |          * ((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071) % 131071 - 65535))) > 0
        |      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM qe CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS t) tt),
        |ckeys AS (SELECT vec_id AS c_id, (t << 20) | bucket AS bkt FROM bt),
        |qkeys AS (
        |  SELECT vec_id AS q_id, (t << 20) | bucket AS bkt FROM bt
        |  WHERE vec_id >= 10 AND vec_id < 20
        |  UNION
        |  SELECT vec_id, (t << 20) | xor(bucket, CAST(1 AS BIGINT) << p)
        |  FROM bt CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS p) pp
        |  WHERE vec_id >= 10 AND vec_id < 20),
        |cand AS (
        |  SELECT DISTINCT q_id, c_id FROM qkeys JOIN ckeys USING (bkt)
        |  WHERE c_id != q_id),
        |s AS (
        |  SELECT q_id, c_id, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |            JOIN embeddings c2 ON c2.vec_id = cand.c_id),
        |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)
        |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // Full restatement of the deterministic LSH-ANN twin: integer plane
    // weights from the public formula, exact integer projections over
    // quantized embeddings, packed (table << 20) | bucket keys, radius-1
    // probes, q48's cosine/rank tail.
    "q103_ann_lsh_oracle" ->
      """WITH qe AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |bt AS (
        |  SELECT vec_id, tt.t AS t,
        |    CAST(list_sum(list_transform(generate_series(0, 5), p ->
        |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
        |        i -> qv[i] * (((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071)
        |          * ((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071) % 131071 - 65535))) > 0
        |      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM qe CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS t) tt),
        |ckeys AS (SELECT vec_id AS c_id, (t << 20) | bucket AS bkt FROM bt),
        |qkeys AS (
        |  SELECT vec_id AS q_id, (t << 20) | bucket AS bkt FROM bt WHERE vec_id < 10
        |  UNION
        |  SELECT vec_id, (t << 20) | xor(bucket, CAST(1 AS BIGINT) << p)
        |  FROM bt CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS p) pp
        |  WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT q_id, c_id FROM qkeys JOIN ckeys USING (bkt)
        |  WHERE c_id != q_id),
        |s AS (
        |  SELECT q_id, c_id, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |            JOIN embeddings c2 ON c2.vec_id = cand.c_id),
        |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)
        |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    // Full restatement of the deterministic near-dup twin (q49's pattern
    // at planes=6/tables=16): integer plane weights from the public
    // squared-mix formula, exact integer projections over quantized embeddings,
    // packed (table << 20) | bucket keys, base keys vs base+radius-1
    // probes with v1 < v2, exact-cosine verify — the oracle computes the
    // same candidate set the engine does, at any corpus size.
    "q50_embedding_neardup" ->
      """WITH qe AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |bt AS (
        |  SELECT vec_id, tt.t AS t,
        |    CAST(list_sum(list_transform(generate_series(0, 5), p ->
        |      CASE WHEN list_sum(list_transform(generate_series(1, 64),
        |        i -> qv[i] * (((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071)
        |          * ((((tt.t * 6 + p) * 64 + i - 1) * 2654435761) % 131071) % 131071 - 65535))) > 0
        |      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS bucket
        |  FROM qe CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS t) tt),
        |base AS (SELECT vec_id, (t << 20) | bucket AS bkt FROM bt),
        |probe AS (
        |  SELECT vec_id, bkt FROM base
        |  UNION
        |  SELECT vec_id, (t << 20) | xor(bucket, CAST(1 AS BIGINT) << p)
        |  FROM bt CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS p) pp),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
        |  FROM probe a JOIN base b USING (bkt) WHERE a.vec_id < b.vec_id),
        |s AS (
        |  SELECT v1, v2, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.v1
        |            JOIN embeddings c2 ON c2.vec_id = cand.v2)
        |SELECT v1, v2, sim FROM s WHERE sim >= 0.45 ORDER BY v1, v2""".stripMargin,
    "q51_embedding_neardup_exact" ->
      """WITH a AS (SELECT vec_id AS v1, embedding AS e1 FROM embeddings),
        |b AS (SELECT vec_id AS v2, embedding AS e2 FROM embeddings),
        |s AS (
        |  SELECT v1, v2, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e1[i] AS DOUBLE) * CAST(e2[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(e1[i] AS DOUBLE) * CAST(e1[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(e2[i] AS DOUBLE) * CAST(e2[i] AS DOUBLE))))), 5) AS sim
        |  FROM a JOIN b ON v1 < v2)
        |SELECT v1, v2, sim FROM s WHERE sim >= 0.45 ORDER BY v1, v2""".stripMargin,
    "q52_embedding_stats" ->
      """SELECT label, count(*) AS n,
        |  round(CAST(sum(CAST(nrm AS DECIMAL(30,10))) AS DOUBLE) / count(nrm), 4) AS avg_norm
        |FROM (SELECT label,
        |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
        |  FROM embeddings) t
        |GROUP BY label ORDER BY label""".stripMargin,
    "q55_quality_quantiles" ->
      s"""WITH comp AS (
         |  SELECT
         |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 6) AS alpha,
         |    round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stop_ratio,
         |    round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mtl,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['le','la','les','de','et','un','est'], t))) AS BIGINT) AS s_fr,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['der','die','das','und','ist','ein','nicht'], t))) AS BIGINT) AS s_de,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['el','los','las','y','un','es','que'], t))) AS BIGINT) AS s_es,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk
         |  FROM documents),
         |scored AS (
         |  SELECT
         |    CASE WHEN has_cjk THEN 'zh'
         |      WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
         |      WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
         |      WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
         |      ELSE 'es' END AS lang,
         |    round(0.5 * alpha + 0.3 * least(stop_ratio * 3, 1.0)
         |      + 0.2 * least(mtl / 8, 1.0), 6) AS q
         |  FROM comp)
         |SELECT lang, count(*) AS n,
         |  round(quantile_cont(q, 0.5), 6) AS p50,
         |  round(quantile_cont(q, 0.9), 6) AS p90,
         |  round(quantile_cont(q, 0.99), 6) AS p99
         |FROM scored GROUP BY lang ORDER BY lang""".stripMargin,
    "q53_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(text) AS BIGINT) AS first_cp
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "q54_multimodal_decode" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents WHERE doc_id < 100),
        |m AS (
        |  SELECT doc_id, len,
        |    64 + (len * 2654435761) % 1856 AS width,
        |    64 + (len * 40503) % 1016 AS height,
        |    CASE WHEN (len * 7919) % 4 = 0 THEN 1 ELSE 3 END AS channels,
        |    CASE WHEN len % 2 = 0 THEN 'fake/png' ELSE 'fake/jpeg' END AS format
        |  FROM b),
        |r AS (SELECT *, least(256.0 / greatest(width, height), 1.0) AS scale FROM m)
        |SELECT doc_id,
        |  CAST(width AS BIGINT) AS width,
        |  CAST(height AS BIGINT) AS height,
        |  CAST(channels AS BIGINT) AS channels,
        |  format,
        |  CAST(floor(width * scale) AS BIGINT) AS resized_w,
        |  CAST(floor(height * scale) AS BIGINT) AS resized_h,
        |  array_to_string(list_transform(generate_series(0, 3), i -> (i * len) // 4), ',') AS frames
        |FROM r ORDER BY doc_id""".stripMargin,
    "q105_multimodal_audio" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents WHERE doc_id < 100),
        |m AS (
        |  SELECT doc_id,
        |    CASE (len * 2654435761) % 5
        |      WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
        |      WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
        |    CASE WHEN (len * 7919) % 3 = 0 THEN 1 ELSE 2 END AS audio_channels,
        |    len * 4 + 1000 AS n_frames,
        |    CASE WHEN len % 2 = 0 THEN 'fake/wav' ELSE 'fake/flac' END AS audio_format
        |  FROM b),
        |w AS (
        |  SELECT *, (sample_rate * 250) // 1000 AS win_frames,
        |    greatest(least((n_frames + (sample_rate * 250) // 1000 - 1)
        |      // ((sample_rate * 250) // 1000), 16), 1) AS n_win
        |  FROM m)
        |SELECT doc_id,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(audio_channels AS BIGINT) AS audio_channels,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  audio_format,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS dur_ms,
        |  array_to_string(list_transform(generate_series(0, CAST(n_win - 1 AS BIGINT)),
        |    i -> i * win_frames), ',') AS win_starts
        |FROM w ORDER BY doc_id""".stripMargin,
    "q106_multimodal_video" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS len
        |  FROM documents WHERE doc_id < 100),
        |m AS (
        |  SELECT doc_id,
        |    160 + (len * 2654435761) % 1760 AS v_width,
        |    120 + (len * 40503) % 960 AS v_height,
        |    24 + (len * 7919) % 2400 AS v_frames,
        |    CASE WHEN len % 2 = 0 THEN 24000 ELSE 29970 END AS fps_milli,
        |    'fake/mp4' AS video_format
        |  FROM b),
        |r AS (SELECT *, least(384.0 / greatest(v_width, v_height), 1.0) AS scale FROM m)
        |SELECT doc_id,
        |  CAST(v_width AS BIGINT) AS v_width,
        |  CAST(v_height AS BIGINT) AS v_height,
        |  CAST(v_frames AS BIGINT) AS v_frames,
        |  CAST(fps_milli AS BIGINT) AS fps_milli,
        |  video_format,
        |  CAST(floor(v_width * scale) AS BIGINT) AS resized_w,
        |  CAST(floor(v_height * scale) AS BIGINT) AS resized_h,
        |  CAST(v_frames * 1000000 // fps_milli AS BIGINT) AS dur_ms,
        |  CASE WHEN v_frames >= 8
        |    THEN array_to_string(list_transform(generate_series(0, 7),
        |      i -> (i * v_frames) // 8), ',')
        |    ELSE array_to_string(generate_series(0, v_frames - 1), ',')
        |  END AS sample_idx
        |FROM r ORDER BY doc_id""".stripMargin,
    "q59_stratified_sample" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS checksum
         |FROM documents
         |WHERE ${sampleKeySql.format("doc_id")} < ${sampleRateCase.format("lang")}
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "q60_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents),
        |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT tok, df, round(CAST(df AS DOUBLE) / n_docs, 6) AS doc_frac
        |FROM dfreq, t WHERE df >= n_docs * 0.3
        |ORDER BY df DESC, tok""".stripMargin,
    "q61_tfidf" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tk GROUP BY tok),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
        |    CAST(tf.tf * ((n_docs * 1000000) // dfreq.df) AS BIGINT) AS score
        |  FROM tf JOIN dfreq USING (tok), t),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, tok, tf, df, score, rnk FROM r
        |WHERE rnk <= 3 AND doc_id < 50 ORDER BY doc_id, rnk""".stripMargin,
    "q62_kmeans_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, embedding AS vemb FROM embeddings),
        |s AS (
        |  SELECT vec_id, cid, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(vemb[i] AS DOUBLE) * CAST(cemb[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(vemb[i] AS DOUBLE) * CAST(vemb[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(cemb[i] AS DOUBLE) * CAST(cemb[i] AS DOUBLE))))), 5) AS sim
        |  FROM v, c),
        |a AS (SELECT vec_id, cid, sim, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s)
        |SELECT CAST(cid AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(sim AS DECIMAL(30,10))) AS DOUBLE) / count(sim), 4) AS avg_sim
        |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cell""".stripMargin,
    "q63_repetition" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents WHERE doc_id < 100),
        |c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS top_tok_ratio,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT), 6) AS distinct_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q64_curation_pipeline" ->
      s"""WITH comp AS (
         |  SELECT doc_id,
         |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 6) AS alpha,
         |    round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stop_ratio,
         |    round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mtl,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['the','a','of','and','to','is','in'], t))) AS BIGINT) AS s_en,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['le','la','les','de','et','un','est'], t))) AS BIGINT) AS s_fr,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['der','die','das','und','ist','ein','nicht'], t))) AS BIGINT) AS s_de,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      t -> list_contains(['el','los','las','y','un','es','que'], t))) AS BIGINT) AS s_es,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk,
         |    md5(array_to_string(list_sort(list_distinct(
         |      string_split_regex(trim(text), '\\s+'))), ' ')) AS cfp,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, cfp, n_tok,
         |    CASE WHEN has_cjk THEN 'zh'
         |      WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
         |      WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
         |      WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
         |      ELSE 'es' END AS plang,
         |    round(0.5 * alpha + 0.3 * least(stop_ratio * 3, 1.0)
         |      + 0.2 * least(mtl / 8, 1.0), 6) AS q
         |  FROM comp),
         |dd AS (
         |  SELECT *, row_number() OVER (PARTITION BY cfp ORDER BY doc_id) AS rn
         |  FROM scored WHERE q >= 0.5),
         |smp AS (
         |  SELECT * FROM dd WHERE rn = 1
         |    AND ${sampleKeySql.format("doc_id")} < ${sampleRateCase.format("plang")})
         |SELECT plang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(sum(doc_id) AS BIGINT) AS checksum
         |FROM smp GROUP BY plang ORDER BY plang""".stripMargin,
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
    "q100_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok FROM t),
        |c AS (
        |  SELECT doc_id, tk, n_tok, unnest(generate_series(0,
        |    CASE WHEN n_tok <= 64 THEN 0
        |         ELSE CAST(ceil((n_tok - 16.0) / 48) AS BIGINT) - 1 END)) AS chunk_id
        |  FROM n)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(len(tk[chunk_id*48+1 : least(chunk_id*48+64, n_tok)]) AS BIGINT) AS chunk_tok,
        |  md5(array_to_string(tk[chunk_id*48+1 : least(chunk_id*48+64, n_tok)], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q98_pack_concat" ->
      """WITH b AS (
        |  SELECT lang AS stratum, doc_id, text,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
        |    doc_id // 1000 AS shard
        |  FROM documents),
        |c AS (SELECT *, sum(n_tok) OVER (
        |    PARTITION BY stratum, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM b),
        |p AS (SELECT stratum, shard, (cum - n_tok) // 4096 AS pack_id,
        |             doc_id, text, n_tok FROM c)
        |SELECT stratum, CAST(shard AS BIGINT) AS shard,
        |  CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS pack_tok,
        |  md5(string_agg(text, '<|eos|>' ORDER BY doc_id)) AS pack_md5
        |FROM p GROUP BY stratum, shard, pack_id
        |ORDER BY stratum, shard, pack_id""".stripMargin,
    "q99_epoch_mixture" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CASE lang WHEN 'en' THEN 2300 WHEN 'fr' THEN 1500
        |              WHEN 'de' THEN 500 ELSE 1000 END AS rate
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, lang, rate // 1000 +
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < rate % 1000
        |         THEN 1 ELSE 0 END AS copies
        |  FROM base),
        |x AS (
        |  SELECT doc_id, lang, unnest(generate_series(1, copies)) AS copy
        |  FROM n WHERE copies >= 1)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(doc_id * copy) AS BIGINT) AS checksum,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    // the partitioned rewrite is row-preserving — plain filter+rollup oracle
    "q97_partitioned_read" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM documents WHERE lang = 'en'""".stripMargin,
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
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a)
        |SELECT CAST(comp AS BIGINT) AS comp, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(node) AS BIGINT) AS checksum
        |FROM comp GROUP BY comp ORDER BY comp""".stripMargin,
    // per-column stats restated as one UNION ALL branch per column
    "q112_corpus_profile" ->
      """WITH d AS (SELECT *, md5(text) AS text_md5 FROM documents)
        |SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_str,
        |    CAST(max(doc_id) AS VARCHAR) AS max_str FROM d
        |  UNION ALL
        |  SELECT 'lang', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT lang) AS BIGINT),
        |    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM d
        |  UNION ALL
        |  SELECT 'source', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT source) AS BIGINT),
        |    CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM d
        |  UNION ALL
        |  SELECT 'n_chars', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT n_chars) AS BIGINT),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM d
        |  UNION ALL
        |  SELECT 'text_md5', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN text_md5 IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT text_md5) AS BIGINT),
        |    CAST(min(text_md5) AS VARCHAR), CAST(max(text_md5) AS VARCHAR) FROM d
        |) ORDER BY col_name""".stripMargin,
    "q93_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM r WHERE rn <= 10
        |GROUP BY source ORDER BY source""".stripMargin,
    "q94_token_budget" ->
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tok) OVER (
        |    PARTITION BY lang ORDER BY n_chars DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM b)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM c WHERE cum <= 2000
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the clustered rewrite is row-preserving — plain filter+rollup oracle
    "q85_layout_pruning" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 300 AND l_partkey BETWEEN 50 AND 250""".stripMargin,
    // full restatement of the hashing-trick margin: md5 60-bit fold per
    // feature (q102's token-hash idiom), bucket mod, formula weights
    "q116_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE doc_id < 300),
        |feats AS (
        |  SELECT doc_id, list_concat(t,
        |    list_transform(generate_series(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i + 1])) AS fs
        |  FROM toks),
        |m AS (
        |  SELECT doc_id, CAST(list_sum(list_transform(fs, f ->
        |      ((list_reduce(list_transform(string_split(md5(f), '')[1:15],
        |          c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                    ELSE unicode(c) - 48 END AS BIGINT)),
        |        (a, v) -> a * 16 + v) % 262144) * 2654435761) % 8191 - 4095))
        |    AS BIGINT) AS margin
        |  FROM feats)
        |SELECT doc_id, margin, CAST(margin >= 0 AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q117_range_join" ->
      """WITH w AS (
        |  SELECT user_id AS w_user,
        |    epoch_us(min(ts)) AS ws,
        |    epoch_us(min(ts)) + 2 * 86400 * CAST(1000000 AS BIGINT) AS we
        |  FROM events WHERE user_id % 20 = 0 GROUP BY user_id)
        |SELECT w_user, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(e.event_id) AS BIGINT) AS checksum
        |FROM events e JOIN w ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
        |GROUP BY w_user ORDER BY w_user""".stripMargin,
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
        |pairs AS (
        |  SELECT d1, d2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = d1
        |  JOIN sizes sb ON sb.doc_id = d2
        |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
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
    "q178_line_boilerplate" ->
      raw"""WITH synth AS (
         |  SELECT doc_id, source,
         |    regexp_replace(trim(text), '((?:\S+ ){7}\S+) ', '\1' || chr(10), 'g') AS s2
         |  FROM documents),
         |lsx AS (SELECT doc_id, source, string_split(s2, chr(10)) AS ls FROM synth),
         |l AS (SELECT doc_id, source, i, ls[i] AS line
         |      FROM lsx, unnest(generate_series(1, len(ls))) AS u(i)),
         |thr AS (SELECT source,
         |  greatest(2, (count(*) * 40000 + 999999) // 1000000) AS thr
         |  FROM documents GROUP BY source),
         |f0 AS (SELECT source, line, count(DISTINCT doc_id) AS df
         |       FROM l GROUP BY source, line),
         |f AS (SELECT f0.source, f0.line FROM f0 JOIN thr USING (source)
         |      WHERE df >= thr),
         |j AS (SELECT l.doc_id, l.i, l.line, f.line IS NOT NULL AS boiler
         |      FROM l LEFT JOIN f ON f.source = l.source AND f.line = l.line)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN boiler THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |  md5(coalesce(string_agg(CASE WHEN boiler THEN NULL ELSE line END,
         |    chr(10) ORDER BY i), '')) AS clean_md5
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q179_waterfill_budget" ->
      raw"""WITH per AS (
         |  SELECT lang,
         |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tok
         |  FROM documents GROUP BY lang),
         |r AS (SELECT lang, n_tok,
         |  CAST(row_number() OVER (ORDER BY n_tok, lang) AS BIGINT) AS j,
         |  coalesce(sum(n_tok) OVER (ORDER BY n_tok, lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev,
         |  coalesce(lag(n_tok) OVER (ORDER BY n_tok, lang), 0) AS t_prev,
         |  CAST(count(*) OVER () AS BIGINT) AS n,
         |  sum(n_tok) OVER () AS total FROM per),
         |r2 AS (SELECT *, (CAST(total AS HUGEINT) * 850000) // 1000000 AS budget FROM r),
         |r3 AS (SELECT *, (budget - s_prev) // (n - j + 1) AS cand FROM r2),
         |cap AS (SELECT min(cand) AS cap FROM r3
         |        WHERE cand >= t_prev AND cand < n_tok
         |          AND s_prev + cand * (n - j + 1) <= budget)
         |SELECT lang, n_tok,
         |  CAST(least(n_tok, coalesce(cap, n_tok)) AS BIGINT) AS alloc,
         |  CAST(cap AS BIGINT) AS cap
         |FROM r2, cap ORDER BY lang""".stripMargin,
    "q215_cm_sketch" ->
      raw"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
         |cells AS (
         |  SELECT r, list_reduce(
         |      list_transform(string_split(md5(CAST(r AS VARCHAR) || ':' || w), '')[1:11],
         |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                  ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) % 64 AS b
         |  FROM toks, unnest(generate_series(0, 3)) AS t(r)),
         |sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY r, b),
         |probes AS (SELECT * FROM (VALUES ('table'), ('slow'), ('merge'),
         |  ('spark'), ('window'), ('zz-absent')) AS t(probe)),
         |pc AS (
         |  SELECT probe, r, list_reduce(
         |      list_transform(string_split(md5(CAST(r AS VARCHAR) || ':' || probe), '')[1:11],
         |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                  ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) % 64 AS b
         |  FROM probes, unnest(generate_series(0, 3)) AS t(r)),
         |est AS (
         |  SELECT probe, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est
         |  FROM pc LEFT JOIN sk USING (r, b) GROUP BY probe),
         |tr AS (SELECT w, CAST(count(*) AS BIGINT) AS true_cnt FROM toks GROUP BY w)
         |SELECT e.probe, e.est, coalesce(tr.true_cnt, 0) AS true_cnt,
         |  e.est - coalesce(tr.true_cnt, 0) AS over
         |FROM est e LEFT JOIN tr ON tr.w = e.probe
         |ORDER BY e.probe""".stripMargin,
    "q214_incremental_rollup" ->
      """WITH h AS (
        |  SELECT DISTINCT source AS stratum, list_reduce(
        |    list_transform(string_split(md5(text), '')[1:15],
        |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h
        |  FROM documents),
        |topk AS (
        |  SELECT stratum, h FROM (
        |    SELECT stratum, h, row_number() OVER (
        |      PARTITION BY stratum ORDER BY h) AS r FROM h)
        |  WHERE r <= 16),
        |est AS (
        |  SELECT stratum, max(h) AS h_k, CAST(count(*) AS BIGINT) AS m
        |  FROM topk GROUP BY stratum),
        |e AS (
        |  SELECT stratum, CASE WHEN m < 16 THEN m ELSE
        |    CAST((CAST(15 AS HUGEINT) * 1152921504606846976) // h_k AS BIGINT) END AS n_est
        |  FROM est),
        |c AS (
        |  SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY source)
        |SELECT c.stratum, c.n_docs, c.sum_chars, e.n_est
        |FROM c JOIN e USING (stratum) ORDER BY c.stratum""".stripMargin,
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
    "q212_garbage_gate" ->
      raw"""WITH uni AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000,
         |    text || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) || repeat('z', 30)
         |  FROM documents WHERE doc_id % 5 = 0),
         |chars AS (
         |  SELECT doc_id, unnest(string_split(text, '')) AS c,
         |    unnest(generate_series(1, length(text))) AS i
         |  FROM uni),
         |bnd AS (
         |  SELECT doc_id, i, CASE WHEN lag(c) OVER
         |      (PARTITION BY doc_id ORDER BY i) IS DISTINCT FROM c
         |    THEN 1 ELSE 0 END AS nb
         |  FROM chars),
         |rid AS (
         |  SELECT doc_id, i, sum(nb) OVER
         |    (PARTITION BY doc_id ORDER BY i
         |     ROWS UNBOUNDED PRECEDING) AS run_id
         |  FROM bnd),
         |runs AS (SELECT doc_id, run_id, count(*) AS rl FROM rid GROUP BY doc_id, run_id),
         |mr AS (SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_run FROM runs GROUP BY doc_id),
         |sig AS (
         |  SELECT u.doc_id,
         |    (1000000 * length(regexp_replace(u.text, '[^\x20-\x7e\t\n\r]', '', 'g')))
         |      // greatest(length(u.text), 1) AS printable_ppm,
         |    coalesce(mr.max_run, 0) AS max_run
         |  FROM uni u LEFT JOIN mr ON mr.doc_id = u.doc_id),
         |g AS (
         |  SELECT doc_id, printable_ppm, max_run,
         |    CAST(CASE WHEN printable_ppm >= 990000 AND max_run <= 10
         |         THEN 1 ELSE 0 END AS BIGINT) AS keep,
         |    CAST(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END AS BIGINT) AS is_twin
         |  FROM sig)
         |SELECT is_twin, keep, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(printable_ppm) AS BIGINT) AS sum_ppm,
         |  CAST(sum(max_run) AS BIGINT) AS sum_run
         |FROM g GROUP BY is_twin, keep ORDER BY is_twin, keep""".stripMargin,
    "q211_lexicon_filter" ->
      raw"""WITH lex AS (
         |  SELECT * FROM (VALUES
         |    ('slow', 'latency', 5), ('fast', 'latency', 1),
         |    ('merge', 'ops', 2), ('window', 'ops', 1),
         |    ('slow fast', 'latency', 7)) AS t(term, category, weight)),
         |tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
         |  FROM documents),
         |tw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1])) AS t
         |  FROM tw WHERE len(w) >= 2),
         |hits AS (
         |  SELECT doc_id, category, CAST(weight AS BIGINT) AS w FROM tok JOIN lex ON tok.t = lex.term
         |  UNION ALL
         |  SELECT doc_id, category, CAST(weight AS BIGINT) FROM bg JOIN lex ON bg.t = lex.term),
         |per AS (
         |  SELECT doc_id, category, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(sum(w) AS BIGINT) AS sum_weight
         |  FROM hits GROUP BY doc_id, category)
         |SELECT d.source, p.category, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(p.n_hits) AS BIGINT) AS n_hits,
         |  CAST(sum(CASE WHEN p.sum_weight >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM per p JOIN documents d USING (doc_id)
         |GROUP BY d.source, p.category ORDER BY d.source, p.category""".stripMargin,
    "q210_phrase_search" ->
      raw"""WITH ph AS (
         |  SELECT doc_id AS phrase_id,
         |    string_split_regex(trim(text), '\s+')[1:6] AS ptk
         |  FROM documents WHERE doc_id IN (3, 77, 123)),
         |dt AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
         |m AS (
         |  SELECT p.phrase_id, d.doc_id,
         |    unnest(list_filter(range(1, greatest(1, len(d.tk) - 4)),
         |      i -> d.tk[i : i + 5] = p.ptk)) AS s
         |  FROM ph p, dt d)
         |SELECT phrase_id, doc_id, CAST(s - 1 AS BIGINT) AS start
         |FROM m ORDER BY phrase_id, doc_id, start""".stripMargin,
    "q209_split_leakage" ->
      raw"""WITH fp AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp
         |  FROM documents),
         |naive AS (
         |  SELECT fp, CASE WHEN doc_id % 10 <= 7 THEN 'train'
         |    WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split
         |  FROM fp),
         |keyed AS (
         |  SELECT fp,
         |    CASE WHEN h % 10 <= 7 THEN 'train' WHEN h % 10 = 8 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT fp, list_reduce(
         |      list_transform(string_split(fp, '')[1:11],
         |        c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                  ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) % 1000003 AS h FROM fp)),
         |audit AS (
         |  SELECT 'naive' AS mode, fp AS k, count(DISTINCT split) AS n_splits,
         |    CAST(count(*) AS BIGINT) AS n_rows FROM naive GROUP BY fp
         |  UNION ALL
         |  SELECT 'keyed', fp, count(DISTINCT split), CAST(count(*) AS BIGINT)
         |  FROM keyed GROUP BY fp)
         |SELECT mode, CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups,
         |  CAST(sum(CASE WHEN n_splits >= 2 THEN n_rows ELSE 0 END) AS BIGINT) AS n_docs_at_risk
         |FROM audit GROUP BY mode ORDER BY mode""".stripMargin,
    "q208_snake_shards" ->
      raw"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, w, CAST(row_number() OVER (ORDER BY w DESC, doc_id) AS BIGINT) AS rn
         |  FROM d),
         |a AS (
         |  SELECT doc_id, w,
         |    CASE WHEN ((rn - 1) // 8) % 2 = 0 THEN (rn - 1) % 8
         |         ELSE 7 - ((rn - 1) % 8) END AS shard
         |  FROM r)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS sum_tok,
         |  CAST(sum(doc_id) AS BIGINT) AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
    "q207_url_canonical" ->
      raw"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 400),
         |raw_urls AS (
         |  SELECT 'http://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) ||
         |    '.Ex' || CAST(doc_id % 3 AS VARCHAR) ||
         |    '.COM:80/p/' || CAST(doc_id % 97 AS VARCHAR) ||
         |    '/?utm_source=feed&id=' || CAST(doc_id % 41 AS VARCHAR) ||
         |    '&utm_campaign=x#sec2' AS u FROM ids
         |  UNION ALL
         |  SELECT 'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
         |    '.ex' || CAST(doc_id % 3 AS VARCHAR) ||
         |    '.com/p/' || CAST(doc_id % 97 AS VARCHAR) ||
         |    '?id=' || CAST(doc_id % 41 AS VARCHAR) FROM ids),
         |p1 AS (
         |  SELECT u, regexp_replace(u, '#.*', '') AS nf FROM raw_urls),
         |p2 AS (
         |  SELECT u,
         |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
         |      '^www\.', '') AS host0,
         |    regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
         |  FROM p1),
         |p3 AS (
         |  SELECT u, scheme,
         |    CASE scheme WHEN 'http' THEN regexp_replace(host0, ':80$$', '')
         |      WHEN 'https' THEN regexp_replace(host0, ':443$$', '')
         |      ELSE host0 END AS host,
         |    regexp_replace(regexp_replace(rest, '\?.*', ''), '/+$$', '') AS path,
         |    list_filter(string_split(regexp_extract(rest, '\?(.*)', 1), '&'),
         |      p -> NOT (regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)=') OR p = '')) AS kept
         |  FROM p2),
         |cus AS (
         |  SELECT u, scheme || '://' || host || path ||
         |    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END AS cu
         |  FROM p3),
         |dom AS (
         |  SELECT cu, regexp_extract(cu, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS h2 FROM cus),
         |fin AS (
         |  SELECT cu, CASE WHEN regexp_matches(h2, '[^.]+\.[^.]+$$')
         |    THEN regexp_extract(h2, '([^.]+\.[^.]+)$$', 1) ELSE h2 END AS dom
         |  FROM dom)
         |SELECT dom, CAST(count(*) AS BIGINT) AS n_raw,
         |  CAST(count(DISTINCT cu) AS BIGINT) AS n_canon,
         |  min(cu) AS sample_cu
         |FROM fin GROUP BY dom ORDER BY dom""".stripMargin,
    "q206_int8_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |a AS (
        |  SELECT vec_id, qv,
        |    CAST(list_max(list_transform(qv, x -> abs(x))) AS BIGINT) AS amax,
        |    CAST(greatest(list_max(list_transform(qv, x -> abs(x))), 1) AS BIGINT) AS d
        |  FROM q)
        |SELECT vec_id, amax,
        |  CAST(list_sum(list_transform(qv, x -> CASE WHEN x < 0
        |    THEN -((127 * abs(x)) // d) ELSE (127 * abs(x)) // d END)) AS BIGINT) AS code_sum,
        |  CAST(list_max(list_transform(qv, x ->
        |    abs(x) - ((((127 * abs(x)) // d) * d) // 127))) AS BIGINT) AS max_err,
        |  CAST(list_sum(list_transform(qv, x ->
        |    abs(x) - ((((127 * abs(x)) // d) * d) // 127))) AS BIGINT) AS sum_err
        |FROM a ORDER BY vec_id""".stripMargin,
    "q204_mmr_select" -> mmrSql(queryId = 0L, nCand = 30, k = 5),
    "q203_bitext_margin" ->
      """WITH q AS (
        |  SELECT vec_id AS x_id,
        |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xv
        |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 100),
        |c AS (
        |  SELECT vec_id AS y_id,
        |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS yv
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |dots AS (
        |  SELECT x_id, y_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64), i -> xv[i] * yv[i])) AS BIGINT) AS d
        |  FROM q, c),
        |pos AS (SELECT * FROM dots WHERE d > 0),
        |fwd AS (
        |  SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY d DESC, y_id) AS rf FROM pos),
        |f AS (SELECT x_id, y_id, d FROM fwd WHERE rf <= 4),
        |sx AS (SELECT x_id, CAST(sum(d) AS BIGINT) AS sum_x,
        |       CAST(count(*) AS BIGINT) AS k_x FROM f GROUP BY x_id),
        |bwd AS (
        |  SELECT *, row_number() OVER (PARTITION BY y_id ORDER BY d DESC, x_id) AS rb FROM pos),
        |b AS (SELECT y_id, CAST(sum(d) AS BIGINT) AS sum_y, CAST(count(*) AS BIGINT) AS k_y
        |      FROM (SELECT * FROM bwd WHERE rb <= 4) GROUP BY y_id),
        |m AS (
        |  SELECT f.x_id, f.y_id, f.d,
        |    CAST((CAST(f.d AS HUGEINT) * 1000000 * (sx.k_x + b.k_y)) // (sx.sum_x + b.sum_y) AS BIGINT) AS margin_ppm
        |  FROM f JOIN sx USING (x_id) JOIN b USING (y_id)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY x_id ORDER BY margin_ppm DESC, y_id) AS rm FROM m)
        |SELECT x_id, y_id, d, margin_ppm FROM r WHERE rm = 1 ORDER BY x_id""".stripMargin,
    "q202_pseudonymize" ->
      raw"""WITH p0 AS (
         |  SELECT doc_id, text || ' contact user' || CAST(doc_id % 50 AS VARCHAR) ||
         |    '@mail.example.com via https://ex.example/u/' || CAST(doc_id % 30 AS VARCHAR) ||
         |    ' acct 99' || CAST(doc_id % 20 AS VARCHAR) || '001122' AS x
         |  FROM documents WHERE doc_id < 300),
         |p1 AS (SELECT doc_id, list_reduce(list_prepend(x,
         |    list_transform(list_sort(list_transform(
         |      list_distinct(regexp_extract_all(x, 'https?://[^ \t\r\n]+')),
         |      m -> lpad(CAST(10000 - length(m) AS VARCHAR), 5, '0') || m)),
         |      y -> y[6:])),
         |    (a, m) -> replace(a, m, '<URL_' ||
         |      translate(md5(m)[1:8], '0123456789', 'ghijklmnop') || '>')) AS x
         |  FROM p0),
         |p2 AS (SELECT doc_id, list_reduce(list_prepend(x,
         |    list_transform(list_sort(list_transform(
         |      list_distinct(regexp_extract_all(x, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
         |      m -> lpad(CAST(10000 - length(m) AS VARCHAR), 5, '0') || m)),
         |      y -> y[6:])),
         |    (a, m) -> replace(a, m, '<EMAIL_' ||
         |      translate(md5(m)[1:8], '0123456789', 'ghijklmnop') || '>')) AS x
         |  FROM p1),
         |p3 AS (SELECT doc_id, list_reduce(list_prepend(x,
         |    list_transform(list_sort(list_transform(
         |      list_distinct(regexp_extract_all(x, '[0-9]{7,}')),
         |      m -> lpad(CAST(10000 - length(m) AS VARCHAR), 5, '0') || m)),
         |      y -> y[6:])),
         |    (a, m) -> replace(a, m, '<NUM_' ||
         |      translate(md5(m)[1:8], '0123456789', 'ghijklmnop') || '>')) AS x
         |  FROM p2)
         |SELECT doc_id, md5(x) AS ps_md5,
         |  regexp_extract(x, '<EMAIL_([a-p]+)>', 1) AS email_pseudo
         |FROM p3 ORDER BY doc_id""".stripMargin,
    "q201_vocab_oov" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |vocab AS (
         |  SELECT w FROM (
         |    SELECT w, count(*) AS c FROM tok GROUP BY w
         |    ORDER BY c DESC, w LIMIT 16)),
         |per_doc AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM tok t LEFT JOIN vocab v ON t.w = v.w
         |  GROUP BY t.doc_id),
         |j AS (
         |  SELECT p.*, (1000000 * p.n_oov) // p.n_tok AS oov_ppm, d.source
         |  FROM per_doc p JOIN documents d USING (doc_id))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(sum(n_oov) AS BIGINT) AS sum_oov,
         |  CAST(sum(CASE WHEN oov_ppm > 250000 THEN 1 ELSE 0 END) AS BIGINT) AS n_frag,
         |  CAST((1000000 * sum(n_oov)) // sum(n_tok) AS BIGINT) AS corpus_oov_ppm
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q200_dsir_reweight" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, source, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |tb AS (
         |  SELECT doc_id, source,
         |    list_reduce(list_transform(string_split(md5(w), '')[1:11],
         |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
         |                ELSE unicode(c) - 48 END AS BIGINT)),
         |      (a, v) -> a * 16 + v) % 64 AS b
         |  FROM tok),
         |r AS (
         |  SELECT b,
         |    CAST((1000000 * (sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1)) //
         |         (sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) + 1) AS BIGINT) AS r_ppm
         |  FROM tb GROUP BY b),
         |sc AS (
         |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(sum(r.r_ppm) AS BIGINT) AS sum_r
         |  FROM tb t JOIN r USING (b) GROUP BY t.doc_id)
         |SELECT d.doc_id, d.source, sc.n_tok,
         |  CAST(sc.sum_r // sc.n_tok AS BIGINT) AS score_ppm
         |FROM sc JOIN documents d USING (doc_id)
         |WHERE d.source <> 'src0'
         |ORDER BY score_ppm DESC, doc_id LIMIT 50""".stripMargin,
    "q199_gini_diversity" ->
      raw"""WITH tok AS (
         |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w
         |  FROM documents),
         |cnt AS (
         |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY doc_id, lang, w),
         |d AS (
         |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS n_tok,
         |    CAST(sum(c * c) AS BIGINT) AS sumsq
         |  FROM cnt GROUP BY doc_id, lang),
         |g AS (
         |  SELECT doc_id, lang, n_tok,
         |    1000000 - (1000000 * sumsq) // (n_tok * n_tok) AS gini_ppm
         |  FROM d)
         |SELECT lang, CAST(CASE WHEN gini_ppm >= 500000 THEN 1 ELSE 0 END AS BIGINT) AS keep,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(sum(gini_ppm) AS BIGINT) AS sum_gini
         |FROM g GROUP BY lang, keep ORDER BY lang, keep""".stripMargin,
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
    "q196_markup_strip" ->
      raw"""WITH page AS (
         |  SELECT doc_id,
         |    '<html><head><title>d</title><style type="text/css">p { color: #333; }</style></head>' ||
         |    '<body><h1 id="t">Doc ' || CAST(doc_id AS VARCHAR) ||
         |    '</h1><p class="main">' || text ||
         |    ' &amp; more &lt;raw&gt; &quot;quoted&quot;&nbsp;tail</p>' ||
         |    '<script>if (a < b && c > d) { go("x"); }</script>' ||
         |    '<!-- hidden comment --></body></html>' AS h
         |  FROM documents),
         |stripped AS (
         |  SELECT doc_id, trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(h, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |        '<[^>]*>', ' ', 'g'),
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
         |    '\s+', ' ', 'g')) AS clean
         |  FROM page)
         |SELECT doc_id, md5(clean) AS clean_md5,
         |  CAST(length(clean) AS BIGINT) AS n_chars_clean
         |FROM stripped ORDER BY doc_id""".stripMargin,
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
    "q194_kmv_estimate" ->
      """WITH h AS (
        |  SELECT DISTINCT list_reduce(
        |    list_transform(string_split(md5(text), '')[1:15],
        |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
        |                ELSE unicode(c) - 48 END AS BIGINT)),
        |    (a, v) -> a * 16 + v) AS h
        |  FROM documents),
        |topk AS (SELECT h FROM h ORDER BY h LIMIT 20),
        |s AS (SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS m FROM topk),
        |x AS (SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_exact FROM documents),
        |e AS (SELECT CAST(20 AS BIGINT) AS k, h_k,
        |  CASE WHEN m < 20 THEN m ELSE
        |    CAST((CAST(19 AS HUGEINT) * 1152921504606846976) // h_k AS BIGINT) END AS n_est
        |  FROM s)
        |SELECT k, h_k, n_est, n_exact,
        |  (1000000 * abs(n_est - n_exact)) // n_exact AS err_ppm
        |FROM e, x""".stripMargin,
    // q49b's deterministic IVF at k=5 feeding a per-query label vote —
    // the argmax tie rule (most votes, then lowest label) restated.
    "q193_knn_label_vote" ->
      (s"WITH ${knnVoteCtes("WHERE vec_id < 20")}\n" +
        """SELECT c1.q_id, eo.label AS own_label, c1.voted_label, c1.n_votes,
          |  tot.n_neighbors, eo.label = c1.voted_label AS agree
          |FROM c1 JOIN tot USING (q_id) JOIN embeddings eo ON eo.vec_id = c1.q_id
          |ORDER BY c1.q_id""".stripMargin),
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
    "q191_robust_outliers" ->
      """WITH base AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents),
        |med AS (SELECT source, CAST(4 * quantile_cont(x, 0.5) AS BIGINT) AS med4
        |        FROM base GROUP BY source),
        |dev AS (SELECT b.doc_id, b.source, b.x, m.med4, abs(b.x * 4 - m.med4) AS dev4
        |        FROM base b JOIN med m ON m.source = b.source),
        |mad AS (SELECT source, CAST(2 * quantile_cont(dev4, 0.5) AS BIGINT) AS mad8
        |        FROM dev GROUP BY source),
        |z AS (SELECT d.doc_id, d.source, d.x AS score,
        |        (2000000 * (d.x * 4 - d.med4)) // greatest(mad8, 1) AS z_ppm
        |      FROM dev d JOIN mad ON mad.source = d.source)
        |SELECT doc_id, source, score, CAST(z_ppm AS BIGINT) AS z_ppm
        |FROM z WHERE abs(z_ppm) >= 2000000 ORDER BY doc_id""".stripMargin,
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
    "q189_mixture_reweight" ->
      raw"""WITH tc AS (
         |  SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS t
         |    FROM documents) GROUP BY lang, t),
         |s0 AS (SELECT lang AS k, (1000000 * count(*)) // sum(c) AS r
         |       FROM tc GROUP BY lang),
         |w0 AS (SELECT k, CAST(r AS BIGINT) AS r, CAST(1000000 AS BIGINT) AS w FROM s0),
         |w1 AS (SELECT k, r, CAST((wu * 1000000) // sum(wu) OVER () AS BIGINT) AS w FROM (
         |  SELECT k, r, (w * (1000000 + (500000 * r) // 1000000)) // 1000000 AS wu FROM w0)),
         |w2 AS (SELECT k, r, CAST((wu * 1000000) // sum(wu) OVER () AS BIGINT) AS w FROM (
         |  SELECT k, r, (w * (1000000 + (500000 * r) // 1000000)) // 1000000 AS wu FROM w1)),
         |w3 AS (SELECT k, r, CAST((wu * 1000000) // sum(wu) OVER () AS BIGINT) AS w FROM (
         |  SELECT k, r, (w * (1000000 + (500000 * r) // 1000000)) // 1000000 AS wu FROM w2))
         |SELECT k AS lang, r AS reward_ppm, w AS share_ppm
         |FROM w3 ORDER BY lang""".stripMargin,
    "q188_trigram_lm" ->
      (s"WITH $trigramLmCtes\n" +
        """SELECT sc.doc_id, d.lang, sc.m, CAST(sc.tot // sc.m AS BIGINT) AS fluency3
          |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
          |ORDER BY fluency3, sc.doc_id LIMIT 20""".stripMargin),
    "q205_ccnet_buckets" ->
      (s"WITH $trigramLmCtes,\n" +
        """scored AS (
          |  SELECT sc.doc_id, d.lang, CAST(sc.tot // sc.m AS BIGINT) AS fluency3
          |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
          |r AS (
          |  SELECT *, CAST(row_number() OVER (
          |      PARTITION BY lang ORDER BY fluency3 DESC, doc_id) AS BIGINT) AS rn,
          |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS cnt
          |  FROM scored),
          |b AS (
          |  SELECT lang, doc_id, fluency3,
          |    CASE ((rn - 1) * 3) // cnt WHEN 0 THEN 'head'
          |         WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
          |  FROM r)
          |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
          |  min(fluency3) AS min_f, max(fluency3) AS max_f,
          |  CAST(sum(doc_id) AS BIGINT) AS checksum
          |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin),
    "q187_stratified_priority" ->
      raw"""WITH base AS (
         |  SELECT lang, doc_id AS id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
         |  FROM documents),
         |p AS (SELECT lang, id, w,
         |  round(w * 1000000.0 / ((((id % 1000003) * 2654435761) % 1000000) + 1.0), 6) AS priority
         |  FROM base WHERE w > 0),
         |r AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY lang ORDER BY priority DESC, id) AS BIGINT) AS rnk FROM p),
         |tau AS (SELECT lang, coalesce(max(CASE WHEN rnk = 21 THEN priority END), 0.0) AS tau
         |        FROM r WHERE rnk <= 21 GROUP BY lang)
         |SELECT r.lang, id, w, priority,
         |  round(greatest(CAST(w AS DOUBLE), tau), 6) AS est_w
         |FROM r JOIN tau ON tau.lang IS NOT DISTINCT FROM r.lang
         |WHERE rnk <= 20 ORDER BY r.lang, id""".stripMargin,
    "q186_source_diversity" ->
      raw"""WITH toks AS (
         |  SELECT source AS src,
         |    unnest(string_split_regex(trim(text), '\s+')) AS t
         |  FROM documents),
         |tc AS (SELECT src, t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY src, t),
         |ta AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_tok,
         |  CAST(count(*) AS BIGINT) AS distinct_tok, max(c) AS top_tok
         |  FROM tc GROUP BY src),
         |tw AS (SELECT doc_id, source AS src,
         |  string_split_regex(trim(text), '\s+') AS w FROM documents),
         |tri AS (SELECT src, unnest(list_transform(
         |    generate_series(1, len(w) - 2),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |  FROM tw WHERE len(w) >= 3),
         |gc AS (SELECT src, g, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY src, g),
         |ga AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_tri,
         |  CAST(count(*) AS BIGINT) AS distinct_tri FROM gc GROUP BY src),
         |dc AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n_docs
         |       FROM documents GROUP BY source)
         |SELECT dc.src, dc.n_docs,
         |  coalesce(ta.n_tok, 0) AS n_tok,
         |  round(CAST(ta.distinct_tok AS DOUBLE) / ta.n_tok, 6) AS ttr,
         |  round(CAST(ta.top_tok AS DOUBLE) / ta.n_tok, 6) AS top_tok_ratio,
         |  coalesce(ga.n_tri, 0) AS n_tri,
         |  round(CAST(ga.distinct_tri AS DOUBLE) / ga.n_tri, 6) AS tri_diversity
         |FROM dc LEFT JOIN ta ON ta.src = dc.src LEFT JOIN ga ON ga.src = dc.src
         |ORDER BY dc.src""".stripMargin,
    "q185_priority_sample" ->
      raw"""WITH base AS (
         |  SELECT doc_id AS id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
         |  FROM documents),
         |p AS (SELECT id, w,
         |  round(w * 1000000.0 / ((((id % 1000003) * 2654435761) % 1000000) + 1.0), 6) AS priority
         |  FROM base WHERE w > 0),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY priority DESC, id) AS BIGINT) AS rnk
         |      FROM p),
         |tau AS (SELECT coalesce(max(CASE WHEN rnk = 51 THEN priority END), 0.0) AS tau FROM r)
         |SELECT id, w, priority, round(greatest(CAST(w AS DOUBLE), tau), 6) AS est_w
         |FROM r, tau WHERE rnk <= 50 ORDER BY id""".stripMargin,
    "q184_matryoshka_rerank" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
        |p AS (
        |  SELECT q_id, c_id, q_emb, c_emb, round(
        |    list_sum(list_transform(generate_series(1, 16),
        |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 16),
        |         i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 16),
        |         i -> CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE))))), 5) AS psim
        |  FROM c, q WHERE q_id != c_id),
        |cand AS (SELECT q_id, c_id, q_emb, c_emb FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY psim DESC, c_id) AS prnk
        |  FROM p) t WHERE prnk <= 20),
        |s AS (
        |  SELECT q_id, c_id, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE))))), 5) AS sim
        |  FROM cand),
        |r AS (SELECT q_id, c_id, sim,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk
        |  FROM s)
        |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    "q183_filter_attrition" ->
      raw"""WITH base AS (
         |  -- coalesce(cond, false): a NULL predicate FAILS its rule, the
         |  -- operator's semantics — bare NOT(NULL) would skip the rule
         |  SELECT CASE WHEN NOT coalesce(lang IN ('en','es','de','fr'), false) THEN 0
         |              WHEN NOT coalesce(len(string_split_regex(trim(text), '\s+')) >= 25, false) THEN 1
         |              WHEN NOT coalesce(n_chars <= 380, false) THEN 2 ELSE 3 END AS fi
         |  FROM documents),
         |c AS (SELECT fi, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY fi),
         |rules AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT),'lang_allowed'),
         |  (1,'min_tokens'), (2,'max_chars')) t(rule_id, rule)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
         |f AS (SELECT r.rule_id, r.rule, CAST(coalesce(c.c, 0) AS BIGINT) AS n_drop
         |      FROM rules r LEFT JOIN c ON c.fi = r.rule_id)
         |SELECT rule_id, rule,
         |  total - CAST(coalesce(sum(n_drop) OVER (ORDER BY rule_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_in,
         |  n_drop,
         |  total - CAST(coalesce(sum(n_drop) OVER (ORDER BY rule_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS n_out
         |FROM f, tot ORDER BY rule_id""".stripMargin,
    "q182_waterfill_sample" ->
      raw"""WITH base AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
         |  FROM documents),
         |per AS (SELECT lang, CAST(sum(tok) AS BIGINT) AS n_tok FROM base GROUP BY lang),
         |r AS (SELECT lang, n_tok,
         |  CAST(row_number() OVER (ORDER BY n_tok, lang) AS BIGINT) AS j,
         |  coalesce(sum(n_tok) OVER (ORDER BY n_tok, lang
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev,
         |  coalesce(lag(n_tok) OVER (ORDER BY n_tok, lang), 0) AS t_prev,
         |  CAST(count(*) OVER () AS BIGINT) AS n,
         |  sum(n_tok) OVER () AS total FROM per),
         |r2 AS (SELECT *, (CAST(total AS HUGEINT) * 850000) // 1000000 AS budget FROM r),
         |r3 AS (SELECT *, (budget - s_prev) // (n - j + 1) AS cand FROM r2),
         |cap AS (SELECT min(cand) AS cap FROM r3
         |        WHERE cand >= t_prev AND cand < n_tok
         |          AND s_prev + cand * (n - j + 1) <= budget),
         |a AS (SELECT lang, CAST(least(n_tok, coalesce(cap, n_tok)) AS BIGINT) AS alloc
         |      FROM r2, cap),
         |sel AS (
         |  -- IS NOT DISTINCT FROM mirrors the operator's null-safe <=>
         |  -- join: a NULL stratum keeps its own allocation
         |  SELECT base.doc_id, base.lang, base.n_chars, a.alloc,
         |    sum(base.tok) OVER (PARTITION BY base.lang
         |      ORDER BY base.n_chars DESC, base.doc_id) AS cum
         |  FROM base JOIN a ON a.lang IS NOT DISTINCT FROM base.lang)
         |SELECT doc_id, lang, n_chars FROM sel WHERE cum <= alloc
         |ORDER BY doc_id""".stripMargin,
    // q49b's deterministic IVF restatement with the label-exclusion
    // predicate on the probed candidates — hard negatives are fully
    // oracle-expressible because every IVF step already was.
    "q180_hard_negatives" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cemb
        |  FROM embeddings WHERE vec_id < 16),
        |scores AS (
        |  SELECT e.vec_id, c.cid,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * c.cemb[i])) AS score
        |  FROM embeddings e, cents c),
        |cells AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
        |    FROM scores) t WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
        |    FROM scores WHERE vec_id < 10) t WHERE rn <= 4),
        |cand AS (
        |  SELECT p.q_id, c.vec_id AS c_id
        |  FROM probes p JOIN cells c USING (cell)
        |  WHERE c.vec_id != p.q_id),
        |s AS (
        |  SELECT q_id, q.label AS q_label, c_id, c2.label AS c_label, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |            JOIN embeddings c2 ON c2.vec_id = cand.c_id
        |  WHERE q.label != c2.label),
        |r AS (SELECT q_id, q_label, c_id, c_label, sim, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)
        |SELECT q_id, q_label, c_id, c_label, sim, rnk FROM r
        |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
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
    "q176_length_batching" ->
      raw"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, n_tok,
         |    CAST(length(printf('%b', n_tok)) AS BIGINT) AS bucket,
         |    doc_id % 4 AS shard
         |  FROM b),
         |r AS (
         |  SELECT *, (row_number() OVER (PARTITION BY bucket, shard
         |      ORDER BY n_tok, doc_id) - 1) // 8 AS batch
         |  FROM base)
         |SELECT bucket, shard, batch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(n_tok) AS BIGINT) AS max_tok,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS waste
         |FROM r GROUP BY bucket, shard, batch
         |ORDER BY bucket, shard, batch""".stripMargin,
    "q175_hierarchical_cells" ->
      """WITH qe AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cell, qv AS cv, vec_id // 6 AS grp
        |       FROM qe WHERE vec_id < 24),
        |cs AS (
        |  SELECT grp, ii.i AS pos, sum(cv[ii.i]) AS s, count(*) AS cnt
        |  FROM c0 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) ii
        |  GROUP BY grp, ii.i),
        |cm AS (SELECT grp,
        |    list(CAST((s - ((s % cnt + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS mv
        |  FROM cs GROUP BY grp),
        |dg AS (
        |  SELECT q.vec_id, q.qv, m.grp,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> (q.qv[i] - m.mv[i]) * (q.qv[i] - m.mv[i]))) AS BIGINT) AS dist
        |  FROM qe q CROSS JOIN cm m),
        |ag AS (SELECT vec_id, qv, grp FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, grp) AS rn
        |    FROM dg) WHERE rn = 1),
        |df AS (
        |  SELECT a.vec_id, c.cell,
        |    CAST(list_sum(list_transform(generate_series(1, 64),
        |      i -> (a.qv[i] - c.cv[i]) * (a.qv[i] - c.cv[i]))) AS BIGINT) AS dist
        |  FROM ag a JOIN c0 c ON c.grp = a.grp),
        |af AS (SELECT vec_id, cell, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        |    FROM df) WHERE rn = 1)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vec_id) AS BIGINT) AS checksum,
        |  CAST(min(dist) AS BIGINT) AS min_dist
        |FROM af GROUP BY cell ORDER BY cell""".stripMargin,
    "q174_per_group_probe" -> {
      raw"""WITH f AS (
         |  SELECT lang AS grp,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS HUGEINT) AS x1,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         |      t -> list_contains($stopList, t))) AS HUGEINT) AS x2,
         |    CAST(n_chars AS HUGEINT) AS y
         |  FROM documents),
         |g AS (
         |  SELECT grp, CAST(count(*) AS HUGEINT) AS hn, CAST(count(*) AS BIGINT) AS n,
         |    sum(x1) AS s1, sum(x2) AS s2,
         |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         |    sum(y) AS b0, sum(x1*y) AS b1, sum(x2*y) AS b2
         |  FROM f GROUP BY grp),
         |d AS (
         |  SELECT grp, n, ${det3Sql(gramA)} AS dt,
         |    ${det3Sql(gramRepl(0))} AS d0, ${det3Sql(gramRepl(1))} AS d1,
         |    ${det3Sql(gramRepl(2))} AS d2
         |  FROM g)
         |SELECT grp, n,
         |  CASE WHEN dt = 0 THEN NULL
         |    ELSE CAST((CAST(1000000 AS HUGEINT) * d0) // dt AS BIGINT) END AS w_bias_ppm,
         |  CASE WHEN dt = 0 THEN NULL
         |    ELSE CAST((CAST(1000000 AS HUGEINT) * d1) // dt AS BIGINT) END AS w_ntok_ppm,
         |  CASE WHEN dt = 0 THEN NULL
         |    ELSE CAST((CAST(1000000 AS HUGEINT) * d2) // dt AS BIGINT) END AS w_stop_ppm
         |FROM d ORDER BY grp""".stripMargin
    },
    "q173_probe_residual_gate" -> {
      raw"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\s+')) AS HUGEINT) AS x1,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         |      t -> list_contains($stopList, t))) AS HUGEINT) AS x2,
         |    CAST(n_chars AS HUGEINT) AS y
         |  FROM documents),
         |g AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS hn,
         |    sum(x1) AS s1, sum(x2) AS s2,
         |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         |    sum(y) AS b0, sum(x1*y) AS b1, sum(x2*y) AS b2
         |  FROM f),
         |w AS (
         |  SELECT
         |    CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(0))}) // ${det3Sql(gramA)} AS BIGINT) AS w0,
         |    CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(1))}) // ${det3Sql(gramA)} AS BIGINT) AS w1,
         |    CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(2))}) // ${det3Sql(gramA)} AS BIGINT) AS w2
         |  FROM g)
         |SELECT doc_id,
         |  CAST(1000000 * y - (w0 + w1 * x1 + w2 * x2) AS BIGINT) AS resid_ppm,
         |  abs(1000000 * y - (w0 + w1 * x1 + w2 * x2)) <= 20000000 AS keep
         |FROM f, w WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    },
    "q172_linear_probe" -> {
      raw"""WITH f AS (
         |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS HUGEINT) AS x1,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         |      t -> list_contains($stopList, t))) AS HUGEINT) AS x2,
         |    CAST(n_chars AS HUGEINT) AS y
         |  FROM documents),
         |g AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS hn, CAST(count(*) AS BIGINT) AS n,
         |    sum(x1) AS s1, sum(x2) AS s2,
         |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
         |    sum(y) AS b0, sum(x1*y) AS b1, sum(x2*y) AS b2
         |  FROM f)
         |SELECT n,
         |  CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(0))}) // ${det3Sql(gramA)} AS BIGINT) AS w_bias_ppm,
         |  CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(1))}) // ${det3Sql(gramA)} AS BIGINT) AS w_ntok_ppm,
         |  CAST((CAST(1000000 AS HUGEINT) * ${det3Sql(gramRepl(2))}) // ${det3Sql(gramA)} AS BIGINT) AS w_stop_ppm
         |FROM g""".stripMargin
    },
    "q171_source_overlap" ->
      raw"""WITH sh AS (
         |  SELECT DISTINCT src, g FROM (
         |    SELECT source AS src, unnest(list_transform(
         |      generate_series(1, len(t) - 2),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
         |    FROM (SELECT source, string_split_regex(trim(text), '\s+') AS t
         |          FROM documents) q
         |    WHERE len(t) >= 3) q2),
         |tot AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY src),
         |com AS (
         |  SELECT a.src AS s1, b.src AS s2, CAST(count(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.g = b.g AND a.src < b.src
         |  GROUP BY a.src, b.src)
         |SELECT s1, s2, n_common, t1.n AS n1, t2.n AS n2,
         |  (1000000 * n_common) // (t1.n + t2.n - n_common) AS jaccard_ppm
         |FROM com JOIN tot t1 ON t1.src = com.s1 JOIN tot t2 ON t2.src = com.s2
         |ORDER BY s1, s2""".stripMargin,
    "q170_repetition_signals" ->
      raw"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
         |  FROM documents WHERE doc_id < 150),
         |u AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t
         |  FROM toks),
         |g AS (
         |  SELECT doc_id, pos, t[pos] AS tok,
         |    CASE WHEN pos + 1 <= len(t) THEN t[pos] || ' ' || t[pos+1] END AS big,
         |    CASE WHEN pos + 2 <= len(t)
         |      THEN t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] END AS tri
         |  FROM u),
         |base AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
         |  FROM g GROUP BY doc_id),
         |t1 AS (
         |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top1_cnt FROM (
         |    SELECT doc_id, count(*) AS c FROM g GROUP BY doc_id, tok) q
         |  GROUP BY doc_id),
         |t2 AS (
         |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top2_cnt FROM (
         |    SELECT doc_id, count(*) AS c FROM g WHERE big IS NOT NULL
         |    GROUP BY doc_id, big) q
         |  GROUP BY doc_id),
         |rep AS (
         |  SELECT doc_id, tri FROM g WHERE tri IS NOT NULL
         |  GROUP BY doc_id, tri HAVING count(*) >= 2),
         |cov AS (
         |  SELECT k.doc_id, CAST(count(DISTINCT k.pos + d.d) AS BIGINT) AS rep3_cover
         |  FROM g k JOIN rep r ON k.doc_id = r.doc_id AND k.tri = r.tri
         |  CROSS JOIN (SELECT unnest([0,1,2]) AS d) d
         |  GROUP BY k.doc_id)
         |SELECT b.doc_id, b.n_tok, b.n_distinct, t1.top1_cnt,
         |  CAST(coalesce(t2.top2_cnt, 0) AS BIGINT) AS top2_cnt,
         |  CAST(coalesce(cov.rep3_cover, 0) AS BIGINT) AS rep3_cover,
         |  (b.n_tok >= 10 AND t1.top1_cnt * 5 <= b.n_tok
         |    AND coalesce(t2.top2_cnt, 0) * 10 <= b.n_tok
         |    AND coalesce(cov.rep3_cover, 0) * 4 <= b.n_tok) AS keep
         |FROM base b JOIN t1 USING (doc_id)
         |LEFT JOIN t2 USING (doc_id) LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q168_temperature_mixture" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
        |thr AS (SELECT source, n, w,
        |    (600 * w * 1000000) // ((SELECT CAST(sum(w) AS BIGINT) FROM w) * n) AS t
        |  FROM w)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(d.doc_id) AS BIGINT) AS checksum,
        |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d JOIN thr ON d.source = thr.source
        |WHERE ((d.doc_id % 1000003) * 2654435761) % 1000000 < thr.t
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q167_version_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |v3 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 3 = 0 THEN 'w' || CAST(doc_id AS VARCHAR)
        |        ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 13 != 0),
        |d AS (SELECT coalesce(v1.doc_id, v3.doc_id) AS doc_id,
        |    CASE WHEN v1.fp IS NULL THEN 'added'
        |         WHEN v3.fp IS NULL THEN 'removed'
        |         WHEN v1.fp != v3.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v3 ON v1.doc_id = v3.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "q166_versioned_upsert" ->
      """WITH v2 AS (
        |  SELECT doc_id, length('v' || CAST(doc_id AS VARCHAR)) AS n_chars, TRUE AS upd
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, n_chars, FALSE
        |  FROM documents WHERE doc_id % 6 != 0 AND doc_id % 4 != 0),
        |v3 AS (SELECT * FROM v2 WHERE doc_id % 11 != 0)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(CASE WHEN upd THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(4 AS BIGINT) AS final_version
        |FROM v3""".stripMargin,
    "q165_range_join_pairs" ->
      """WITH w AS (
        |  SELECT user_id AS w_user,
        |    epoch_us(min(ts)) AS ws,
        |    epoch_us(min(ts)) + 2 * 86400 * CAST(1000000 AS BIGINT) AS we
        |  FROM events WHERE user_id % 40 = 0 GROUP BY user_id)
        |SELECT w_user, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(e.event_id) AS BIGINT) AS checksum
        |FROM events e JOIN w ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
        |GROUP BY w_user ORDER BY w_user""".stripMargin,
    // scored pairs once; argmax twice via (sim, -id)-ordered windows —
    // the same tie rule as the struct max
    // the q41 quality formula per doc, quantile_cont (= Spark percentile)
    // threshold per lang, gate re-applied in the join condition
    "q123_percentile_gate" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, round(
         |    0.5 * round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 6)
         |    + 0.3 * least(round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) * 3, 1.0)
         |    + 0.2 * least(round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) / 8, 1.0), 6) AS q
         |  FROM documents),
         |cd AS (SELECT doc_id, lang, q,
         |    cume_dist() OVER (PARTITION BY lang ORDER BY q) AS cd
         |  FROM scored)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  round(min(q), 6) AS min_q,
         |  CAST(sum(doc_id) AS BIGINT) AS checksum
         |FROM cd WHERE cd >= 0.8
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // earliest-first chain restated stepwise: t0 = first view, t1 = first
    // click >= t0, t2 = first purchase >= t1; window on integer micros
    "q127_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (
        |  SELECT e.user_id, s0.t0, min(e.ts) AS t1
        |  FROM events e JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s0.t0
        |  GROUP BY e.user_id, s0.t0),
        |s2 AS (
        |  SELECT e.user_id, s1.t0, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
        |  GROUP BY e.user_id, s1.t0)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS step, 'view' AS event_type,
        |    CAST(count(*) AS BIGINT) AS n_users FROM s0
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
        |  WHERE epoch_us(t1) - epoch_us(t0) <= 604800000000
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
        |  WHERE epoch_us(t2) - epoch_us(t0) <= 604800000000
        |) ORDER BY step""".stripMargin,
    // absolute integer week index both sides; distinct (user, week)
    // activity joined to first-event cohorts
    "q128_retention_cohorts" ->
      """WITH wk AS (
        |  SELECT user_id,
        |    CAST((epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000)
        |      % 604800000000)) / 604800000000 AS BIGINT) AS week
        |  FROM events),
        |cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, week FROM wk)
        |SELECT cohort_week, week - cohort_week AS "offset",
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |WHERE week - cohort_week BETWEEN 0 AND 4
        |GROUP BY cohort_week, week - cohort_week
        |ORDER BY cohort_week, week - cohort_week""".stripMargin,
    "q129_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    // the oracle restates the exact side and pins the tolerance flags at 1 —
    // a sketch outside tolerance hash-mismatches the flag column
    "q130_sketch_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniq,
        |  CAST(1 AS INT) AS within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q134_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |p AS (
        |  SELECT substr(w, CAST(i AS INT), 2) AS pair
        |  FROM w, unnest(range(1, length(w))) AS t(i)
        |  WHERE length(w) >= 2),
        |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY pair),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM p)
        |SELECT pair, n, round(CAST(n AS DOUBLE) / n_pairs, 6) AS frac
        |FROM c, t WHERE n >= n_pairs * 0.01
        |ORDER BY n DESC, pair""".stripMargin,
    "q132_sketch_union" ->
      """SELECT CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniq,
        |  CAST(1 AS INT) AS within_tol
        |FROM events""".stripMargin,
    "q131_sketch_quantiles" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
        |  CAST(1 AS INT) AS tol50, CAST(1 AS INT) AS tol95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q126_retention_delete" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 9 != 0""".stripMargin,
    // v2 membership + update arithmetic restated directly
    "q120_upsert" ->
      """WITH v2 AS (
        |  SELECT doc_id, length('u' || CAST(doc_id AS VARCHAR)) AS n_chars, TRUE AS upd
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, n_chars, FALSE
        |  FROM documents WHERE doc_id % 7 != 0 AND doc_id % 5 != 0)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(CASE WHEN upd THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM v2""".stripMargin,
    // diff semantics restated as the modular-arithmetic membership rules
    // (CASE order mirrors the operator: a key absent from v1 is 'added'
    // even if it also hits the mangle rule)
    "q121_snapshot_diff" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN 'added'
        |         WHEN doc_id % 11 = 0 THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM documents)
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "q119_contrastive_triplets" ->
      """WITH s AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, round(
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1, 64),
        |         i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 5) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 20 AND c.vec_id != q.vec_id),
        |p AS (SELECT q_id, c_id AS pos_id, sim AS pos_sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
        |    FROM s) WHERE rn = 1),
        |n AS (SELECT q_id, c_id AS neg_id, sim AS neg_sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
        |    FROM s WHERE sim < 0.30) WHERE rn = 1)
        |SELECT q_id, pos_id, pos_sim, neg_id, neg_sim
        |FROM p JOIN n USING (q_id) ORDER BY q_id""".stripMargin,
    "q115_dpp_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
        |FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') IN (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m')
        |  FROM orders WHERE quarter(o_orderdate) = 1)""".stripMargin,
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
    // full restatement of near-dup ingest: q102's signature, bands split by
    // doc parity, corpus-hit + smaller-batch-hit anti-joins
    "q108_incremental_neardup" ->
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
        |corp_hit AS (
        |  SELECT DISTINCT b.doc_id FROM bands b JOIN bands c
        |    ON b.bidx = c.bidx AND b.bval = c.bval
        |  WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        |    AND bit_count(xor(b.fp, c.fp)) <= 5),
        |batch_hit AS (
        |  SELECT DISTINCT y.doc_id FROM bands x JOIN bands y
        |    ON x.bidx = y.bidx AND x.bval = y.bval AND x.doc_id < y.doc_id
        |  WHERE x.doc_id % 2 = 1 AND y.doc_id % 2 = 1
        |    AND bit_count(xor(x.fp, y.fp)) <= 5)
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 2 = 1
        |  AND doc_id NOT IN (SELECT doc_id FROM corp_hit)
        |  AND doc_id NOT IN (SELECT doc_id FROM batch_hit)
        |ORDER BY doc_id""".stripMargin,
    // identical PII construction + RE2 spelling of the same regex cascade
    "q110_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or https://ex.example/p/'
        |      || CAST(doc_id AS VARCHAR) || '?sid=98765432 ref 123456789' AS pii
        |  FROM documents WHERE doc_id < 200),
        |r AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(pii,
        |      'https?://[^ \t\r\n]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g') AS red
        |  FROM p)
        |SELECT doc_id, md5(red) AS red_md5,
        |  CAST(length(regexp_extract_all(red, '<URL>')) AS BIGINT) AS n_url,
        |  CAST(length(regexp_extract_all(red, '<EMAIL>')) AS BIGINT) AS n_email,
        |  CAST(length(regexp_extract_all(red, '<NUM>')) AS BIGINT) AS n_num
        |FROM r ORDER BY doc_id""".stripMargin,
    // the seeded md5 order is engine-portable — restated verbatim
    "q109_epoch_shuffle" ->
      """SELECT md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  doc_id, lang
        |FROM documents
        |ORDER BY shuffle_key, doc_id""".stripMargin,
    // the bucketed join is row-identical to the plain join — plain SQL oracle
    "q80_bucketed_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the salted join is row-identical to the plain join — plain SQL oracle
    "q79_skew_salted_join" ->
      """SELECT c_mktsegment, event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    "q67_sequence_pack" ->
      """WITH b AS (
        |  SELECT lang AS stratum, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
        |    doc_id // 1000 AS shard
        |  FROM documents),
        |c AS (SELECT *, sum(n_tok) OVER (
        |    PARTITION BY stratum, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM b),
        |p AS (SELECT stratum, shard, (cum - n_tok) // 4096 AS pack_id, n_tok FROM c)
        |SELECT stratum, CAST(shard AS BIGINT) AS shard,
        |  CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tok
        |FROM p GROUP BY stratum, shard, pack_id
        |ORDER BY stratum, shard, pack_id""".stripMargin,
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
    "q135_mg_heavy_hitters" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |tk2 AS (SELECT tok FROM tk WHERE tok <> ''),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk2),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk2 GROUP BY tok)
        |SELECT tok, cnt, round(cnt / (SELECT n * 1.0 FROM t), 6) AS frac
        |FROM c WHERE cnt * 100 >= (SELECT n FROM t) * 3
        |ORDER BY cnt DESC, tok""".stripMargin,
    "q136_bloom_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q137_bottomk_sample" ->
      """SELECT doc_id, lang, n_chars,
        |  ((doc_id % 1000003) * 2654435761) % 999983 AS skey
        |FROM documents ORDER BY skey, doc_id LIMIT 200""".stripMargin,
    "q138_bigram_lm" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        |bgr AS (
        |  SELECT doc_id, unnest([substring(w, i, 2) for i in range(1, length(w))]) AS bg
        |  FROM tk WHERE length(w) >= 2),
        |c AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_bi FROM bgr GROUP BY bg),
        |px AS (SELECT substring(bg, 1, 1) AS x, CAST(sum(c_bi) AS BIGINT) AS c_x
        |       FROM c GROUP BY 1),
        |lm AS (SELECT bg, (1000000 * c_bi) // c_x AS p
        |       FROM c JOIN px ON substring(c.bg, 1, 1) = px.x),
        |sc AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS m,
        |         CAST(sum(p) AS BIGINT) AS tot
        |       FROM bgr b JOIN lm USING (bg) GROUP BY b.doc_id)
        |SELECT sc.doc_id, d.lang, sc.m, CAST(sc.tot // sc.m AS BIGINT) AS fluency
        |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
        |ORDER BY fluency, sc.doc_id LIMIT 20""".stripMargin,
    "q139_source_overlap" ->
      """WITH g AS (
        |  SELECT DISTINCT source, ng FROM (
        |    SELECT source, unnest(list_distinct(
        |      CASE WHEN len(tk) >= 5
        |        THEN list_transform(generate_series(1, len(tk) - 4),
        |               i -> array_to_string(tk[i:i+4], ' '))
        |        ELSE [] END)) AS ng
        |    FROM (SELECT source, string_split_regex(trim(text), '\s+') AS tk
        |          FROM documents))),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY source),
        |shared AS (
        |  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared,
        |  round(CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared), 6) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.source = src_a
        |JOIN sizes sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q140_cluster_split" ->
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
        |pairs AS (
        |  SELECT d1, d2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = d1
        |  JOIN sizes sb ON sb.doc_id = d2
        |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2),
        |edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |assigned AS (
        |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
        |sp AS (
        |  SELECT doc_id, cluster,
        |    CASE WHEN ((cluster % 1000003) * 2654435761) % 10 <= 7 THEN 'train'
        |         WHEN ((cluster % 1000003) * 2654435761) % 10 = 8 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM assigned)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    "q141_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts, value, epoch_us(ts) // 3600000000 AS h
        |  FROM events WHERE user_id < 20),
        |latest AS (
        |  SELECT user_id, h, value FROM (
        |    SELECT user_id, h, value, row_number() OVER (
        |      PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM bounds)
        |SELECT g.user_id, g.h, last_value(l.value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM grid g LEFT JOIN latest l ON l.user_id = g.user_id AND l.h = g.h
        |ORDER BY g.user_id, g.h""".stripMargin,
    "q142_bpe_train" ->
      (s"WITH ${bpeCtes(4)},\n" +
        (1 to 4).map(i =>
          s"SELECT CAST($i AS BIGINT) AS step, x, y, cnt FROM b${i - 1}")
          .mkString("m AS (", " UNION ALL ", ")\n") +
        "SELECT step, x, y, cnt FROM m ORDER BY step"),
    "q143_bpe_encode" ->
      (s"WITH ${bpeCtes(4)},\n" +
        """vocab AS (
          |  SELECT w, CAST(len(list_filter(string_split(s, chr(1)||chr(1)),
          |    t -> t <> '')) AS BIGINT) AS n_tok FROM s4),
          |dtk AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
          |  FROM documents WHERE doc_id < 50)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
          |  CAST(sum(n_tok) AS BIGINT) AS n_bpe_tok
          |FROM dtk JOIN vocab USING (w) WHERE w <> ''
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q148_ann_pq" ->
      pqSql(m = 4, ksub = 8, iters = 2, subDim = 16, nq = 10, kCand = 20, k = 3),
    // identical computation to q148 — the persisted-index round-trip must
    // not change a single row (the q125 contract)
    "q155_ann_pq_index" ->
      pqSql(m = 4, ksub = 8, iters = 2, subDim = 16, nq = 10, kCand = 20, k = 3),
    "q156_domain_pagerank" -> pageRankSql(3),
    "q280_communities" -> lpaSql(4),
    "q157_ann_ivfpq" -> ivfpqSql(nlist = 8, nprobe = 4, m = 4, subDim = 16,
      ksub = 8, iters = 2, nq = 10, kCand = 20, k = 3),
    "q161_stratum_topk_sample" ->
      """SELECT doc_id, lang, n_chars, skey, rn FROM (
        |  SELECT doc_id, lang, n_chars,
        |    ((doc_id % 1000003) * 2654435761) % 999983 AS skey,
        |    CAST(row_number() OVER (
        |      PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 999983, doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents)
        |WHERE rn <= 25 ORDER BY lang, rn""".stripMargin,
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
    "q160_distribution_drift" ->
      s"""WITH comp AS (
         |  SELECT doc_id, lang,
         |    round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 6) AS alpha,
         |    round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        t -> list_contains($stopList, t))) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stop_ratio,
         |    round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |      / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS mtl
         |  FROM documents),
         |q AS (SELECT doc_id, lang,
         |    CAST(floor(round(0.5 * alpha + 0.3 * least(stop_ratio * 3, 1.0)
         |      + 0.2 * least(mtl / 8, 1.0), 6) * 10) AS BIGINT) AS bin
         |  FROM comp),
         |ba AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS na
         |  FROM q WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         |bb AS (SELECT lang, bin, CAST(count(*) AS BIGINT) AS nb
         |  FROM q WHERE doc_id % 2 = 1 GROUP BY 1, 2),
         |ta AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot_a
         |  FROM q WHERE doc_id % 2 = 0 GROUP BY 1),
         |tb AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot_b
         |  FROM q WHERE doc_id % 2 = 1 GROUP BY 1),
         |j AS (SELECT coalesce(ba.lang, bb.lang) AS lang,
         |    coalesce(ba.bin, bb.bin) AS bin,
         |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
         |  FROM ba FULL OUTER JOIN bb ON ba.lang = bb.lang AND ba.bin = bb.bin)
         |SELECT j.lang, max(coalesce(tot_a, 0)) AS n_a, max(coalesce(tot_b, 0)) AS n_b,
         |  CAST(sum(abs(na * coalesce(tot_b, 0) - nb * coalesce(tot_a, 0))) AS BIGINT) AS drift_int,
         |  CASE WHEN max(coalesce(tot_a, 0)) = 0 OR max(coalesce(tot_b, 0)) = 0 THEN 1.0
         |    ELSE round(CAST(sum(abs(na * coalesce(tot_b, 0) - nb * coalesce(tot_a, 0))) AS DOUBLE)
         |      / (2.0 * max(tot_a) * max(tot_b)), 6) END AS tvd
         |FROM j FULL OUTER JOIN ta ON ta.lang = j.lang
         |       FULL OUTER JOIN tb ON tb.lang = j.lang
         |GROUP BY j.lang ORDER BY j.lang""".stripMargin,
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
    "q153_dataset_manifest" ->
      """WITH h AS (
        |  SELECT source, list_reduce(
        |    list_transform(generate_series(1, 32),
        |      i -> CAST(ascii(substring(m, i, 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS h
        |  FROM (SELECT source, md5(coalesce(CAST(doc_id AS VARCHAR), chr(2)) || chr(1) ||
        |          coalesce(text, chr(2)) || chr(1) || coalesce(lang, chr(2)) ||
        |          chr(1) || coalesce(source, chr(2)) || chr(1) ||
        |          coalesce(CAST(n_chars AS VARCHAR), chr(2))) AS m
        |        FROM documents))
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(h) AS BIGINT) AS fp_sum,
        |  CAST(sum(h * h % 1000000007) AS BIGINT) AS fp_sq
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
    // I/O round trips: the mounted copy must reproduce the parquet
    // original, so each oracle is the plain rollup over documents
    "q150_jsonl_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q151_orc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q152_text_gz" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
        |  CAST(sum(doc_id) AS BIGINT) AS checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q147_collocations" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS l FROM documents),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(l) AS w FROM tk) WHERE w <> '' GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |idx AS (SELECT l, unnest(range(1, len(l))) AS i FROM tk WHERE len(l) >= 2),
        |bi AS (SELECT l[i] AS x, l[i+1] AS y, CAST(count(*) AS BIGINT) AS cxy
        |  FROM idx WHERE l[i] <> '' AND l[i+1] <> ''
        |  GROUP BY 1, 2 HAVING count(*) >= 10),
        |sc AS (
        |  SELECT x, y, cxy, ux.c AS cx, uy.c AS cy,
        |    ((cxy * n) // ux.c) * 1000000 // uy.c AS lift
        |  FROM bi JOIN uni ux ON ux.w = x JOIN uni uy ON uy.w = y, tot)
        |SELECT x, y, cxy, cx, cy, CAST(lift AS BIGINT) AS lift FROM sc
        |ORDER BY lift DESC, x, y LIMIT 30""".stripMargin,
    "q145_multimodal_imageio" ->
      """SELECT doc_id,
        |  16 + doc_id % 48 AS width,
        |  16 + doc_id % 32 AS height,
        |  3 AS channels,
        |  'image/png' AS format
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
  )

  /** Unrolled-SQL restatement of [[graft.ext.GraphOps.pageRank]] over the
    * source gram-overlap graph: q139's edge derivation, then `iters` rounds
    * of (contrib join-sum, damped floor-division update). */
  /** Unrolled synchronous-LPA rounds over the q156 gram-overlap graph:
    * per round, incident label weights per dst, argmax with min-label
    * tie-break. All nodes have in-edges on a symmetric graph, so the
    * keep-previous-label fallback never fires and the unroll is exact. */
  private def lpaSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS (
         |  SELECT dst AS node, label FROM (
         |    SELECT e.dst, l.label,
         |      row_number() OVER (PARTITION BY e.dst
         |        ORDER BY sum(e.w) DESC, l.label) AS rn
         |    FROM e JOIN l${i - 1} l ON l.node = e.src
         |    GROUP BY e.dst, l.label)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    raw"""WITH g AS (
         |  SELECT DISTINCT source, ng FROM (
         |    SELECT source, unnest(list_distinct(
         |      CASE WHEN len(tk) >= 5
         |        THEN list_transform(generate_series(1, len(tk) - 4),
         |               i -> array_to_string(tk[i:i+4], ' '))
         |        ELSE [] END)) AS ng
         |    FROM (SELECT source, string_split_regex(trim(text), '\s+') AS tk
         |          FROM documents))),
         |shared AS (
         |  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS w
         |  FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
         |  GROUP BY 1, 2),
         |e AS (SELECT sa AS src, sb AS dst, w FROM shared
         |      UNION ALL SELECT sb, sa, w FROM shared),
         |l0 AS (SELECT DISTINCT node, node AS label FROM (
         |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |$rounds
         |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
  }

  private def pageRankSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, CAST(sum((r.rank * e.w) // o.ow) AS BIGINT) AS contrib
         |  FROM e JOIN ow o ON o.src = e.src JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n2.node,
         |    (1000000000000 * 15) // 100 // (SELECT n FROM nn)
         |      + (85 * coalesce(c.contrib, 0)) // 100 AS rank
         |  FROM nodes n2 LEFT JOIN c$i c ON c.node = n2.node)""".stripMargin
    }.mkString(",\n")
    raw"""WITH g AS (
         |  SELECT DISTINCT source, ng FROM (
         |    SELECT source, unnest(list_distinct(
         |      CASE WHEN len(tk) >= 5
         |        THEN list_transform(generate_series(1, len(tk) - 4),
         |               i -> array_to_string(tk[i:i+4], ' '))
         |        ELSE [] END)) AS ng
         |    FROM (SELECT source, string_split_regex(trim(text), '\s+') AS tk
         |          FROM documents))),
         |shared AS (
         |  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS w
         |  FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
         |  GROUP BY 1, 2),
         |e AS (SELECT sa AS src, sb AS dst, w FROM shared
         |      UNION ALL SELECT sb, sa, w FROM shared),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
         |r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS rank FROM nodes),
         |$rounds
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iters
         |ORDER BY rank DESC, node""".stripMargin
  }

  /** Generic Lloyd-chain CTE builder under a name prefix: `{pfx}qe` (the
    * provided source of (vec_id, qv)), seeds `{pfx}c0`, `iters` rounds of
    * (assign, floor-div update), and a FINAL full-population assignment at
    * round `iters+1` whose d-CTE doubles as a distance table. Shared by the
    * PQ chains (embedding slices) and the IVFPQ chains (residual slices). */
  private def lloydChainSql(pfx: String, ksub: Int, iters: Int, subDim: Int,
      qeSql: String): String = {
    def assign(i: Int, cPrev: String): String =
      s"""${pfx}d$i AS (
         |  SELECT q.vec_id, q.qv, c.cell,
         |    CAST(list_sum(list_transform(generate_series(1, $subDim),
         |      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT) AS dist
         |  FROM ${pfx}qe q CROSS JOIN $cPrev c),
         |${pfx}a$i AS (SELECT vec_id, qv, cell, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |    FROM ${pfx}d$i) WHERE rn = 1)""".stripMargin
    def update(i: Int, cPrev: String): String =
      s"""${pfx}s$i AS (
         |  SELECT cell, ii.i AS pos, sum(qv[ii.i]) AS s, count(*) AS cnt
         |  FROM ${pfx}a$i CROSS JOIN (SELECT unnest(generate_series(1, $subDim)) AS i) ii
         |  GROUP BY cell, ii.i),
         |${pfx}n$i AS (SELECT cell,
         |    list(CAST((s - ((s % cnt + cnt) % cnt)) / cnt AS BIGINT) ORDER BY pos) AS cv
         |  FROM ${pfx}s$i GROUP BY cell),
         |${pfx}c$i AS (SELECT p.cell, COALESCE(${pfx}n$i.cv, p.cv) AS cv
         |  FROM $cPrev p LEFT JOIN ${pfx}n$i ON ${pfx}n$i.cell = p.cell)""".stripMargin
    val rounds = (1 to iters)
      .map(i => assign(i, s"${pfx}c${i - 1}") + ",\n" + update(i, s"${pfx}c${i - 1}"))
      .mkString(",\n")
    s"""${pfx}qe AS ($qeSql),
       |${pfx}c0 AS (SELECT vec_id AS cell, qv AS cv FROM ${pfx}qe WHERE vec_id < $ksub),
       |$rounds,
       |${assign(iters + 1, s"${pfx}c$iters")}""".stripMargin
  }

  /** One subspace's PQ codebook chain (prefix `p{j}`) over the raw
    * embedding slice `[off+1, off+subDim]`. */
  private def pqSubCtes(j: Int, ksub: Int, iters: Int, subDim: Int): String = {
    val off = j * subDim
    lloydChainSql(s"p$j", ksub, iters, subDim,
      s"""SELECT vec_id, list_transform(embedding[${off + 1}:${off + subDim}],
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |  FROM embeddings""".stripMargin)
  }

  /** Unrolled-SQL restatement of [[graft.ext.Similarity.ivfPqTopK]]: the
    * coarse Lloyd chain ([[kmeansCtes]] + final assignment), residual
    * vectors, m residual-codebook chains ([[lloydChainSql]] prefix
    * `rq{j}`), encoding, probe ranking, per-probed-cell ADC lookup tables,
    * the (cell, j, code) equi-join ADC sum, and the exact-cosine re-rank. */
  private def ivfpqSql(nlist: Int, nprobe: Int, m: Int, subDim: Int,
      ksub: Int, iters: Int, nq: Int, kCand: Int, k: Int): String = {
    val dim = m * subDim
    val fin = iters + 1
    val chains = (0 until m).map { j =>
      val off = j * subDim
      lloydChainSql(s"rq$j", ksub, iters, subDim,
        s"SELECT vec_id, rv[${off + 1}:${off + subDim}] AS qv FROM res")
    }.mkString(",\n")
    val codesAll = (0 until m).map(j =>
      s"""SELECT a.vec_id AS c_id, r.cell, CAST($j AS BIGINT) AS j, a.cell AS code
         |  FROM rq${j}a$fin a JOIN res r ON r.vec_id = a.vec_id""".stripMargin)
      .mkString(" UNION ALL ")
    val lutAll = (0 until m).map { j =>
      val off = j * subDim
      s"""SELECT r.q_id, r.cell, CAST($j AS BIGINT) AS j, b.cell AS code,
         |  CAST(list_sum(list_transform(generate_series(1, $subDim),
         |    i -> (r.rv[$off + i] - b.cv[i]) * (r.rv[$off + i] - b.cv[i]))) AS BIGINT) AS d
         |  FROM qres r CROSS JOIN rq${j}c$iters b""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH ${kmeansCtes(nlist, iters, dim)},
       |${kmeansAssign(fin, s"c$iters", dim)},
       |res AS (
       |  SELECT a.vec_id, a.cell,
       |    list_transform(generate_series(1, $dim), i -> a.qv[i] - c.cv[i]) AS rv
       |  FROM a$fin a JOIN c$iters c ON c.cell = a.cell),
       |$chains,
       |codes AS ($codesAll),
       |qp AS (SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM d$fin WHERE vec_id < $nq) WHERE rn <= $nprobe),
       |qres AS (
       |  SELECT qp.q_id, qp.cell,
       |    list_transform(generate_series(1, $dim), i -> q.qv[i] - c.cv[i]) AS rv
       |  FROM qp JOIN qe q ON q.vec_id = qp.q_id JOIN c$iters c ON c.cell = qp.cell),
       |lut AS ($lutAll),
       |adc AS (
       |  SELECT l.q_id, cd.c_id, CAST(sum(l.d) AS BIGINT) AS adc
       |  FROM codes cd JOIN lut l
       |    ON l.cell = cd.cell AND l.j = cd.j AND l.code = cd.code
       |  WHERE l.q_id != cd.c_id
       |  GROUP BY 1, 2),
       |cand AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc, c_id) AS crn FROM adc)
       |  WHERE crn <= $kCand),
       |sc AS (
       |  SELECT q_id, c_id, round(
       |    list_sum(list_transform(generate_series(1, $dim),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(c2e.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE))))), 5) AS sim
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
       |            JOIN embeddings c2e ON c2e.vec_id = cand.c_id),
       |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= $k ORDER BY q_id, rnk""".stripMargin
  }

  /** Restatement of the PQ ENCODING stage alone — q163's oracle (the
    * streaming encode must equal the batch codes): the m codebook chains,
    * final assignments unioned to (c_id, j, code) long form. */
  private[queries] def pqCodesSql(m: Int, ksub: Int, iters: Int,
      subDim: Int): String = {
    val fin = iters + 1
    val chains = (0 until m).map(j => pqSubCtes(j, ksub, iters, subDim))
      .mkString(",\n")
    val codesAll = (0 until m)
      .map(j => s"SELECT vec_id AS c_id, CAST($j AS BIGINT) AS j, cell AS code FROM p${j}a$fin")
      .mkString(" UNION ALL ")
    s"""WITH $chains,
       |codes AS ($codesAll)
       |SELECT c_id, j, code FROM codes ORDER BY c_id, j""".stripMargin
  }

  /** Unrolled-SQL restatement of [[graft.ext.Similarity.pqTopK]]: m
    * codebook chains, code/LUT unions, the ADC aggregation, and q118's
    * exact-cosine re-rank tail over the ADC survivors. */
  private def pqSql(m: Int, ksub: Int, iters: Int, subDim: Int,
      nq: Int, kCand: Int, k: Int): String = {
    val fin = iters + 1
    val dim = m * subDim
    val chains = (0 until m).map(j => pqSubCtes(j, ksub, iters, subDim))
      .mkString(",\n")
    val codesAll = (0 until m)
      .map(j => s"SELECT vec_id AS c_id, cell AS code, CAST($j AS BIGINT) AS j FROM p${j}a$fin")
      .mkString(" UNION ALL ")
    val lutAll = (0 until m)
      .map(j => s"SELECT vec_id AS q_id, cell AS code, CAST($j AS BIGINT) AS j, dist FROM p${j}d$fin WHERE vec_id < $nq")
      .mkString(" UNION ALL ")
    s"""WITH $chains,
       |codes AS ($codesAll),
       |lut AS ($lutAll),
       |adc AS (
       |  SELECT q_id, c_id, CAST(sum(dist) AS BIGINT) AS adc
       |  FROM codes JOIN lut USING (j, code) WHERE q_id != c_id
       |  GROUP BY 1, 2),
       |cand AS (SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc, c_id) AS crn FROM adc)
       |  WHERE crn <= $kCand),
       |sc AS (
       |  SELECT q_id, c_id, round(
       |    list_sum(list_transform(generate_series(1, $dim),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, $dim),
       |         i -> CAST(c2e.embedding[i] AS DOUBLE) * CAST(c2e.embedding[i] AS DOUBLE))))), 5) AS sim
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
       |            JOIN embeddings c2e ON c2e.vec_id = cand.c_id),
       |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM sc)
       |SELECT q_id, c_id, sim, rnk FROM r WHERE rnk <= $k ORDER BY q_id, rnk""".stripMargin
  }

  /** Unrolled-SQL restatement of [[graft.ext.Bpe.trainMerges]]: `n` chained
    * CTE rounds of (pair count → argmax → sentinel-string replace) over the
    * distinct-word table, each bit-identical to the Spark iteration (same
    * double-U+0001 framing, same left-to-right `replace`, same
    * count-desc/lexicographic tie-break). `b{i}` holds round i+1's winning
    * pair; `s{i}` the symbol strings entering round i+1. */
  /** The interpolated char-trigram LM scoring CTE chain (shared by q188
    * and q205): builds both model tables and per-doc (m, tot); final
    * fluency3 = tot // m. */
  // def, not val: referenced from the oracleSql map, which may initialize
  // first in the object body
  private def trigramLmCtes: String =
    """tk AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
      |bgr AS (
      |  SELECT doc_id, unnest([substring(w, i, 2) for i in range(1, length(w))]) AS bg
      |  FROM tk WHERE length(w) >= 2),
      |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_bi FROM bgr GROUP BY bg),
      |px AS (SELECT substring(bg, 1, 1) AS x, CAST(sum(c_bi) AS BIGINT) AS c_x
      |       FROM c2 GROUP BY 1),
      |lm2 AS (SELECT bg, (1000000 * c_bi) // c_x AS p2
      |        FROM c2 JOIN px ON substring(c2.bg, 1, 1) = px.x),
      |tgr AS (
      |  SELECT doc_id, unnest([substring(w, i, 3) for i in range(1, length(w) - 1)]) AS tg
      |  FROM tk WHERE length(w) >= 3),
      |c3 AS (SELECT tg, CAST(count(*) AS BIGINT) AS c_tri FROM tgr GROUP BY tg),
      |pxy AS (SELECT substring(tg, 1, 2) AS xy, CAST(sum(c_tri) AS BIGINT) AS c_xy
      |        FROM c3 GROUP BY 1),
      |lm3 AS (SELECT tg, (1000000 * c_tri) // c_xy AS p3
      |        FROM c3 JOIN pxy ON substring(c3.tg, 1, 2) = pxy.xy),
      |sc AS (
      |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum((600000 * coalesce(p3, 0) + 400000 * coalesce(p2, 0)) // 1000000)
      |         AS BIGINT) AS tot
      |  FROM tgr t LEFT JOIN lm3 USING (tg)
      |       LEFT JOIN lm2 ON lm2.bg = substring(t.tg, 2, 2)
      |  GROUP BY t.doc_id)""".stripMargin

  /** Marker-score columns + prediction CASE for one text column `src`,
    * suffix-tagged — the q43 langId restatement factored for reuse on
    * document halves (q224). */
  private def langScoreCols(src: String, sfx: String): String = {
    val ms = Seq(
      "en" -> "['the','a','of','and','to','is','in']",
      "fr" -> "['le','la','les','de','et','un','est']",
      "de" -> "['der','die','das','und','ist','ein','nicht']",
      "es" -> "['el','los','las','y','un','es','que']")
    ms.map { case (l, lst) =>
      s"CAST(len(list_filter(string_split_regex(trim($src), '\\s+'), x -> list_contains($lst, x))) AS BIGINT) AS ${l}_$sfx"
    }.mkString(",\n    ") +
      s",\n    regexp_matches($src, '[\\x{4e00}-\\x{9fff}]') AS cjk_$sfx"
  }

  private def langPredSql(sfx: String): String = {
    val g = s"greatest(en_$sfx, fr_$sfx, de_$sfx, es_$sfx)"
    s"""CASE WHEN cjk_$sfx THEN 'zh'
       |      WHEN $g = 0 THEN 'und'
       |      WHEN en_$sfx = $g THEN 'en'
       |      WHEN fr_$sfx = $g THEN 'fr'
       |      WHEN de_$sfx = $g THEN 'de'
       |      ELSE 'es' END""".stripMargin
  }

  /** The q49b deterministic-IVF CTE chain (untrained lowest-16 centroids,
    * nprobe 4, queries vec_id < 10, re-ranked by round-5 cosine) ending
    * at ranked candidates `r` — shared by q49b and q216's recall audit. */
  /** The q193 kNN-label-vote chain (normalized centroids, IVF cells,
    * probes filtered by `probeWhere`, exact re-rank at k=5, per-query
    * vote relations c1/tot), shared with the q267 hotspot rollup. */
  private def knnVoteCtes(probeWhere: String): String =
    s"""cents AS (
       |  SELECT vec_id AS cid,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cemb
       |  FROM embeddings WHERE vec_id < 16),
       |scores AS (
       |  SELECT e.vec_id, c.cid,
       |    list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * c.cemb[i])) AS score
       |  FROM embeddings e, cents c),
       |cells AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
       |    FROM scores) t WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
       |    FROM scores $probeWhere) t WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, c.vec_id AS c_id
       |  FROM probes p JOIN cells c USING (cell)
       |  WHERE c.vec_id != p.q_id),
       |s AS (
       |  SELECT q_id, c_id, round(
       |    list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
       |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, 64),
       |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
       |            JOIN embeddings c2 ON c2.vec_id = cand.c_id),
       |r AS (SELECT q_id, c_id FROM (SELECT q_id, c_id, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS rnk FROM s) t WHERE rnk <= 5),
       |v AS (SELECT r.q_id, e.label AS c_label, CAST(count(*) AS BIGINT) AS n_votes
       |      FROM r JOIN embeddings e ON e.vec_id = r.c_id
       |      WHERE e.label IS NOT NULL GROUP BY r.q_id, e.label),
       |tot AS (SELECT q_id, CAST(sum(n_votes) AS BIGINT) AS n_neighbors
       |        FROM v GROUP BY q_id),
       |c1 AS (SELECT q_id, c_label AS voted_label, n_votes FROM (
       |   SELECT *, row_number() OVER (
       |     PARTITION BY q_id ORDER BY n_votes DESC, c_label) AS vrnk FROM v) t
       |   WHERE vrnk = 1)""".stripMargin

  private def ivfTopKCtes: String =
    """cents AS (
      |  SELECT vec_id AS cid,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      |      sqrt(list_sum(list_transform(embedding,
      |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cemb
      |  FROM embeddings WHERE vec_id < 16),
      |scores AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * c.cemb[i])) AS score
      |  FROM embeddings e, cents c),
      |cells AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
      |    FROM scores) t WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS q_id, cid AS cell FROM (
      |    SELECT vec_id, cid, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
      |    FROM scores WHERE vec_id < 10) t WHERE rn <= 4),
      |cand AS (
      |  SELECT p.q_id, c.vec_id AS c_id
      |  FROM probes p JOIN cells c USING (cell)
      |  WHERE c.vec_id != p.q_id),
      |s AS (
      |  SELECT q_id, c_id, round(
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(generate_series(1, 64),
      |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(generate_series(1, 64),
      |         i -> CAST(c2.embedding[i] AS DOUBLE) * CAST(c2.embedding[i] AS DOUBLE))))), 5) AS sim
      |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
      |            JOIN embeddings c2 ON c2.vec_id = cand.c_id),
      |r AS (SELECT q_id, c_id, sim, CAST(row_number() OVER (
      |    PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rnk FROM s)""".stripMargin

  /** Unrolled MMR greedy chain (k rounds): each round scores the remaining
    * candidates as 70·rel − 30·max-dot-to-selected and takes the best
    * (ties → lowest vec_id), mirroring Similarity.mmrSelect exactly. */
  private def mmrSql(queryId: Long, nCand: Int, k: Int): String = {
    val dotQ = "list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * q.qv[i]))"
    def dotCS(c: String, s: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> $c.v[i] * $s.v[i]))"
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""qv AS (
         |  SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |  FROM embeddings WHERE vec_id = $queryId)""".stripMargin,
      s"""base AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
         |  FROM embeddings WHERE vec_id <> $queryId)""".stripMargin,
      s"""cand AS (
         |  SELECT b.vec_id, b.v, CAST($dotQ AS BIGINT) AS rel
         |  FROM base b, qv q ORDER BY rel DESC, vec_id LIMIT $nCand)""".stripMargin,
      s"""selu1 AS (
         |  SELECT vec_id, v, rel, CAST(1 AS BIGINT) AS rank, CAST(70 * rel AS BIGINT) AS gain
         |  FROM cand ORDER BY 70 * rel DESC, vec_id LIMIT 1)""".stripMargin)
    for (i <- 2 to k) {
      parts += s"""g$i AS (
         |  SELECT c.vec_id, c.v, c.rel, max(CAST(${dotCS("c", "s")} AS BIGINT)) AS ms
         |  FROM cand c, selu${i - 1} s
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM selu${i - 1})
         |  GROUP BY c.vec_id, c.v, c.rel)""".stripMargin
      parts += s"""pick$i AS (
         |  SELECT vec_id, v, rel, CAST($i AS BIGINT) AS rank,
         |    CAST(70 * rel - 30 * ms AS BIGINT) AS gain
         |  FROM g$i ORDER BY 70 * rel - 30 * ms DESC, vec_id LIMIT 1)""".stripMargin
      parts += s"selu$i AS (SELECT * FROM selu${i - 1} UNION ALL SELECT * FROM pick$i)"
    }
    s"WITH ${parts.mkString(",\n")}\n" +
      s"SELECT rank, vec_id, rel, gain FROM selu$k ORDER BY rank"
  }

  /** The q228 Bradley–Terry MM rounds, unrolled: each round computes the
    * per-player denominator d (Σ over opponents of c·1e9 // (w_i + w_j)),
    * the raw MM update wr = n_wins·1e9 // d, and the mean-normalized
    * strengths w (Σw pinned to |players|·1e6) — the identical integer
    * sequence [[graft.ext.Curation.bradleyTerryStrength]] runs. */
  /** The q227 BM25 scoring chain (probes → postings slice → integer Okapi →
    * per-query ranking CTE `r`), shared by the retrieval-metric oracles:
    * q234's nDCG audits this ranking, q235 fuses it with the TF ranker
    * (whose CTEs build on the same `p`/`qt` postings). */
  private def bm25SearchCtes: String =
    raw"""dt AS (
       |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
       |    FROM documents)
       |  GROUP BY doc_id, t),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM dt GROUP BY doc_id),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dl) AS BIGINT) AS tt FROM dl),
       |q AS (SELECT * FROM (VALUES (1, 'slow merge table'),
       |  (2, 'hash join fast'), (3, 'window sort batch')) AS x(q_id, q_text)),
       |qt AS (SELECT DISTINCT q_id,
       |  unnest(string_split_regex(trim(q_text), '\s+')) AS t FROM q),
       |qterms AS (SELECT DISTINCT t FROM qt),
       |p AS (SELECT dt.* FROM dt JOIN qterms USING (t)),
       |dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df_t FROM p GROUP BY t),
       |sc AS (
       |  SELECT qt.q_id, p.doc_id,
       |    CAST(((tot.n_docs - dft.df_t + 1) * 1000000) // (dft.df_t + 1)
       |      AS BIGINT) AS idf_ppm,
       |    CAST((CAST(p.tf AS HUGEINT) * 1000000000 * 2200 * tot.tt) //
       |      (CAST(p.tf AS HUGEINT) * 1000000 * tot.tt
       |       + CAST(300000 AS HUGEINT) * tot.tt
       |       + CAST(900000 AS HUGEINT) * dl.dl * tot.n_docs)
       |      AS BIGINT) AS sat_ppm
       |  FROM p JOIN dft USING (t) JOIN dl USING (doc_id)
       |    JOIN qt USING (t), tot),
       |agg AS (
       |  SELECT q_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(sum((CAST(idf_ppm AS HUGEINT) * sat_ppm) // 1000000)
       |      AS BIGINT) AS score_ppm
       |  FROM sc GROUP BY q_id, doc_id),
       |r AS (SELECT q_id, doc_id, n_terms, score_ppm,
       |  CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rnk FROM agg)""".stripMargin

  /** The q95 duplicate-cluster chain (3-gram Jaccard pairs → symmetric
    * edges → recursive transitive closure → min-label `comp`), shared with
    * the canonical-selection oracle. Usage: `WITH RECURSIVE $ccJaccardCtes`. */
  /** DuckDB restatement of the engine's md5-fold-mod-1e6 gate:
    * `pmod(conv(substring(md5(e),1,15),16,10), 1e6)` — the first 15 hex
    * nibbles folded base-16, exact in both engines. */
  private def md5ModSql(e: String): String =
    s"""(list_reduce(list_transform(string_split(md5($e), '')[1:15],
       |      c -> CAST(CASE WHEN unicode(c) >= 97 THEN unicode(c) - 87
       |                ELSE unicode(c) - 48 END AS BIGINT)),
       |      (a, v) -> a * 16 + v) % 1000000)""".stripMargin

  private def ccJaccardCtes: String =
    raw"""toks AS (
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
       |pairs AS (
       |  SELECT d1, d2 FROM inter
       |  JOIN sizes sa ON sa.doc_id = d1
       |  JOIN sizes sb ON sb.doc_id = d2
       |  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2),
       |edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (
       |  SELECT a AS node, least(a, min(b)) AS comp FROM reach GROUP BY a)""".stripMargin

  /** Unrolled power-iteration rounds ([[graft.ext.Similarity
    * .spectralProfile]]): matvec off v{i-1} over the covariance relation,
    * then ∞-norm renormalize to 10⁶ with sign-split truncating division
    * (BigInt `/` truncates toward zero; DuckDB `//` floors — the split
    * makes them agree on negatives). */
  private def spectralRoundCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""u$i AS (SELECT cov.i AS j, sum(CAST(cij AS HUGEINT) * v${i - 1}.v) AS u
         |  FROM cov JOIN v${i - 1} ON v${i - 1}.j = cov.j GROUP BY cov.i),
         |m$i AS (SELECT max(abs(u)) AS mx FROM u$i),
         |v$i AS (SELECT j, CASE WHEN mx = 0 THEN u
         |    WHEN u >= 0 THEN (u * 1000000) // mx
         |    ELSE -((-u * 1000000) // mx) END AS v
         |  FROM u$i, m$i)""".stripMargin
    }.mkString(",\n")

  /** Unrolled HITS rounds ([[graft.ext.GraphOps.hits]]): each round is the
    * authority update off h{i-1}, sum-normalize, then the hub update off
    * a{i}, sum-normalize — Kleinberg's order, exact-integer. */
  private def hitsRoundCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""ar$i AS (SELECT dst, sum(CAST(w AS HUGEINT) * h) AS raw
         |  FROM e JOIN h${i - 1} USING (src) GROUP BY dst),
         |at$i AS (SELECT sum(raw) AS t FROM ar$i),
         |a$i AS (SELECT dst, CAST((raw * na.n * 1000000) // at$i.t AS BIGINT) AS a
         |  FROM ar$i, at$i, na),
         |hr$i AS (SELECT src, sum(CAST(w AS HUGEINT) * a) AS raw
         |  FROM e JOIN a$i USING (dst) GROUP BY src),
         |ht$i AS (SELECT sum(raw) AS t FROM hr$i),
         |h$i AS (SELECT src, CAST((raw * nh.n * 1000000) // ht$i.t AS BIGINT) AS h
         |  FROM hr$i, ht$i, nh)""".stripMargin
    }.mkString(",\n")

  private def btRoundCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""d$i AS (SELECT sym.i AS p,
         |  CAST(sum((c * 1000000000) // (wi.w + wj.w)) AS BIGINT) AS d
         |  FROM sym JOIN w${i - 1} wi ON wi.p = sym.i
         |    JOIN w${i - 1} wj ON wj.p = sym.j GROUP BY sym.i),
         |r$i AS (SELECT pl.p, (pl.n_wins * 1000000000) // d$i.d AS wr
         |  FROM pl JOIN d$i USING (p)),
         |s$i AS (SELECT CAST(sum(wr) AS HUGEINT) AS s FROM r$i),
         |w$i AS (SELECT p, CAST((CAST(wr AS HUGEINT) * 1000000 * np) // s
         |  AS BIGINT) AS w FROM r$i, s$i, np)""".stripMargin
    }.mkString(",\n")

  private def bpeCtes(n: Int): String = {
    val parts = scala.collection.mutable.ArrayBuffer(
      """wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w)""".stripMargin,
      """s0 AS (SELECT w, n, chr(1)||chr(1) ||
        |  array_to_string(regexp_extract_all(w, '(?s).'), chr(1)||chr(1)) ||
        |  chr(1)||chr(1) AS s FROM wc)""".stripMargin)
    for (i <- 0 until n) {
      parts += s"""l$i AS (SELECT n, list_filter(string_split(s$i.s, chr(1)||chr(1)),
                  |  t -> t <> '') AS l FROM s$i)""".stripMargin
      parts += s"i$i AS (SELECT n, l, unnest(range(1, len(l))) AS i FROM l$i)"
      parts += s"""p$i AS (SELECT l[i] AS x, l[i+1] AS y, CAST(sum(n) AS BIGINT) AS cnt
                  |  FROM i$i GROUP BY 1, 2)""".stripMargin
      parts += s"b$i AS (SELECT x, y, cnt FROM p$i ORDER BY cnt DESC, x, y LIMIT 1)"
      // LEFT JOIN ON TRUE: when a round finds no pairs b$i is empty; the bare
      // cross join would empty s${i+1} and every later round, diverging from
      // trainMerges' early-stop. The CASE falls back to the unmodified string.
      parts += s"""s${i + 1} AS (SELECT w, n, CASE WHEN b.x IS NULL THEN s ELSE replace(s,
                  |  chr(1)||b.x||chr(1)||chr(1)||b.y||chr(1),
                  |  chr(1)||b.x||b.y||chr(1)) END AS s FROM s$i LEFT JOIN b$i b ON TRUE)""".stripMargin
    }
    parts.mkString(",\n")
  }
}

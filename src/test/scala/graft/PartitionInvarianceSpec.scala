package graft

import org.scalatest.funsuite.AnyFunSuite

/** Distribution-correctness guard: a query's RESULT must not depend on how
  * the input happens to be partitioned — the local[4] proxy for "the same
  * answer on a 1000-executor cluster". Each representative query runs under
  * the default layout and again with the shuffle width changed and the
  * inputs re-partitioned; sorted results must be identical. Catches
  * accumulation-order bugs (un-rounded float aggs), partition-local logic
  * leaking into results, and non-deterministic tie-breaks. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one per operator family: hash agg, window/limit-by, join+topk, dedup,
  // ANN, sessionize, set ops, sampling, tfidf ranking, curation pipeline,
  // sequence packing, centroid clustering, full outer, window frames
  private val representative = Seq(
    "q04_tpch_q1", "q08_limit_by", "q20_tpch_q3", "q40_dedup_exact",
    "q48_ann_brute", "q31_sessionize", "q18_setops", "q46_minhash_lsh",
    "q59_stratified_sample", "q61_tfidf", "q64_curation_pipeline",
    "q67_sequence_pack", "q62_kmeans_assign", "q69_join_full_outer",
    "q70_window_frames",
    // round 4: decorrelated subqueries, bucketed-snapshot dedup, layout
    // rewrite + pruned read, source caps, token budgets
    "q83_tpch_q21", "q84_tpch_q22", "q90_tpch_q2",
    "q82_incremental_dedup_bucketed", "q85_layout_pruning",
    "q93_source_cap", "q94_token_budget", "q95_dedup_clusters",
    // ordered string agg (collect_list is partition-order-dependent without
    // the struct sort) and replicated-row mixtures
    "q98_pack_concat", "q99_epoch_mixture", "q100_chunking",
    // oracle twins (banded simhash pairs, deterministic LSH ANN) and the
    // SQL-text pipeline through the function registry
    "q102_simhash_oracle", "q103_ann_lsh_oracle", "q104_sql_pipeline",
    // span dedup (ordered span reassembly via collect_list + struct sort)
    // and the batch video decode
    "q107_span_dedup", "q106_multimodal_video",
    // near-dup ingest vs bucketed band snapshot, global epoch shuffle
    // (range-sort order), star-contraction components (iterative fixpoint)
    "q108_incremental_neardup", "q109_epoch_shuffle", "q111_cc_star_chains",
    // round-4 continuation: iterative Lloyd fit (integer sums), join-driven
    // partition pruning, binned range join, trained-IVF search, double-
    // argmax triplet mining
    "q114_kmeans", "q115_dpp_join", "q117_range_join",
    "q118_ann_ivf_trained", "q119_contrastive_triplets",
    // percentile cut-line application and the fit+gate composition
    "q123_percentile_gate", "q124_embedding_outliers",
    // event analytics: chained min-agg funnel, week cohorts, lead windows
    "q127_funnel", "q128_retention_cohorts", "q129_event_transitions",
    // round 5: MG-sketch heavy hitters (order-dependent candidate set,
    // order-independent final answer), bloom-pruned join, BPE merge
    // training (argmax per round), LOCF grid fill, cluster-keyed split
    "q135_mg_heavy_hitters", "q136_bloom_join", "q140_cluster_split",
    "q141_gap_fill", "q142_bpe_train",
    // prefix-filtered similarity join, lift-ranked collocations, PQ ANN
    "q146_prefix_jaccard", "q147_collocations", "q148_ann_pq",
    // order-invariant multiset manifest (its defining property)
    "q153_dataset_manifest",
    // iterative integer PageRank (join-sum fixpoint rounds)
    "q156_domain_pagerank",
    // round 6: auto-width pair-form range join, pointer-swap version diff,
    // temperature mixture (q117, now the pushdown form, is listed above)
    "q165_range_join_pairs", "q167_version_diff", "q168_temperature_mixture",
    // round 6, session 2: contamination matrix (distinct + self-join),
    // per-group Gram fleet (decimal sums must be layout-blind), two-level
    // cell assignment (group join + packed argmin), sharded length batching
    "q171_source_overlap", "q174_per_group_probe",
    "q175_hierarchical_cells", "q176_length_batching",
    // round 6, session 3: shingle-snapshot novelty (semi join vs bucketed
    // layout), line strike + ordered rebuild (collect_list + struct sort),
    // water-fill windows, label-excluded IVF re-rank
    "q177_ingest_novelty", "q178_line_boilerplate",
    "q179_waterfill_budget", "q180_hard_negatives",
    "q181_stream_novelty", "q182_waterfill_sample", "q183_filter_attrition",
    "q184_matryoshka_rerank", "q185_priority_sample", "q186_source_diversity",
    "q187_stratified_priority", "q188_trigram_lm", "q189_mixture_reweight",
    "q190_phash_dedup", "q191_robust_outliers", "q192_span_decontamination",
    "q193_knn_label_vote", "q194_kmv_estimate", "q195_normalized_dedup",
    "q196_markup_strip", "q197_winnowing", "q198_fuzzy_names",
    "q199_gini_diversity", "q200_dsir_reweight", "q201_vocab_oov",
    "q202_pseudonymize", "q203_bitext_margin", "q204_mmr_select",
    "q205_ccnet_buckets", "q206_int8_quantize", "q207_url_canonical",
    "q208_snake_shards", "q209_split_leakage", "q210_phrase_search",
    "q211_lexicon_filter", "q212_garbage_gate", "q213_dedup_savings",
    "q214_incremental_rollup", "q215_cm_sketch", "q216_ann_recall_audit",
    "q217_freshness_decay", "q218_rate_anomaly", "q219_stream_cm_sketch",
    "q220_quantile_normalize", "q221_exact_split", "q222_preference_pairs",
    "q223_novelty_score", "q224_mixed_language", "q225_term_associations",
    "q226_k_anonymity",
    // session 5: BM25 postings scoring, iterative BT fit, one-pass
    // constraint audit, confusion-matrix kappa, ordered conversation
    // reassembly (collect_list + struct sort), regex corruption scan,
    // BPE-vocab fertility rollup
    "q227_bm25_search", "q228_bradley_terry", "q229_constraint_audit",
    "q230_annotator_agreement", "q231_sft_turns", "q232_mojibake_audit",
    "q233_tokenizer_fertility",
    // retrieval metrics (window-ranked fusion/ideal orders), calibration
    // (Lloyd + margin buckets), weighted bottom-k sampling
    "q234_ndcg_audit", "q235_rrf_fusion", "q236_ece_calibration",
    "q237_weighted_sample",
    // ranker agreement (k²-bounded pair join) and bipartite HITS rounds
    "q238_kendall_tau", "q239_hits",
    // covariance aggregation must be layout-blind (integer sums)
    "q240_embedding_spectrum",
    // diversity count-distincts, TakeOrdered head, tier-located winsorize,
    // replicated bootstrap aggregation
    "q241_ngram_diversity", "q242_vocab_concentration",
    "q243_winsorized_stats", "q244_poisson_bootstrap",
    // struct-max keeper argmax over CC labels; pair join length audit
    "q245_canonical_select", "q246_length_bias",
    // exact-pair truth join + fingerprint band-catch rollup
    "q247_lsh_recall_audit",
    // sharded pack cumsum rollup; broadcast-min feasibility
    "q248_pack_utilization", "q249_mixture_feasibility",
    // additive streaming bootstrap state; sentinel-keyed FD groups; OLS sums
    "q250_stream_bootstrap", "q251_fd_audit", "q252_trend_slope",
    // diagonal run chains; JSON extraction rollup
    "q253_match_spans", "q254_json_props",
    // bounded reverse-cumsum life table; geometric-weight rank overlap
    "q255_churn_hazard", "q256_rbo_agreement",
    // blocked pair scoring, full-outer vocab movers, decile rollup
    "q257_fellegi_sunter", "q258_term_movers", "q259_sim_histogram",
    // tier-located percentiles, 9-group digit rollup, vec_sum halves
    "q260_conversion_latency", "q261_benford_audit", "q262_centroid_shift",
    // conditional-agg DiD cells, sampled-distinct overlap, rule matrix
    "q263_did_uplift", "q264_capture_recapture", "q265_transition_rules",
    // sorted-struct paths, full-corpus vote rollup, decimal reconciliation
    "q266_opening_paths", "q267_label_noise", "q268_order_reconcile",
    // binary-length buckets; hygiene flag rollup
    "q269_length_histogram", "q270_text_hygiene",
    // trained-cell blocked vote (large-k assignment kernels)
    "q271_cell_label_noise",
    // round 7: script-range counts, prefix-keyed families, CC-inherited
    // split + pair-leak join, bounded-head OLS on log2 buckets
    "q272_script_audit", "q273_template_families", "q274_cluster_split",
    "q275_zipf_slope", "q276_truncation_audit", "q277_clone_families",
    // sampled-group bootstrap envelope; CM inner-product min over rows
    "q278_approx_groupby", "q279_join_size_estimate",
    // synchronous LPA rounds (argmax windows must be layout-blind)
    "q280_communities",
    // md5 bucket loads; decimal content sums under any partitioning
    "q281_skew_forecast", "q282_lineage_chain",
    // per-row argmax routing; (group, dim) decimal sum vectors
    "q283_rendezvous_shards", "q284_source_centroids",
    // closed-form leave-one-out deltas over per-source sums
    "q285_source_influence",
    // full-outer column attribution sums
    "q286_column_diff")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .collect().map(_.toString).sorted.toSeq

  representative.foreach { name =>
    test(s"$name is partition-layout invariant") {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      val base = rows(name)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert(rows(name) == base, s"$name changed under 3 shuffle partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        assert(rows(name) == base, s"$name changed under 17 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }
}

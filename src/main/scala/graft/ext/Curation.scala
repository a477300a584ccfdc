package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling (domain/language mixing), vocabulary statistics
  * (document frequency, heavy hitters), TF-IDF term ranking, and
  * intra-document repetition signals (Rae et al., Gopher §A1.1-style
  * quality heuristics — public-knowledge constructions).
  *
  * Every operator is deterministic and cross-engine mirrorable (no RNG, no
  * engine-specific hashes): sampling keys come from modular arithmetic on the
  * id column, TF-IDF ranks on an integer-scaled idf. Shapes are 100 TB-safe:
  * sampling and signals are pure per-row maps; vocabulary statistics are
  * two-phase hash aggregations with map-side combine; nothing collects to the
  * driver.
  */
object Curation {

  /** Deterministic per-row sample key in [0, buckets): a Knuth
    * multiplicative hash of the id, overflow-safe under ANSI (the id is
    * reduced mod 1000003 BEFORE the multiply, so the product stays ≤ 2.7e15).
    * Same value is computable in any SQL engine — no RNG, so the sample is
    * reproducible and join-stable across runs and engines. */
  def sampleKey(id: Column, buckets: Int = 1000): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(buckets.toLong))

  /** Leakage-safe train/val/test split over near-dup clusters: every doc
    * joins its connected-component id from `comp` (columns: idCol, `comp`;
    * docs absent from `comp` are singletons — their own cluster), the
    * CLUSTER picks a bucket via [[sampleKey]], and whole clusters land in
    * one split — no near-duplicate pair can straddle train/eval, the
    * contamination guarantee an id-hash split cannot give. Buckets
    * `0..trainHi` → train, `trainHi+1..valHi` → val, rest → test.
    *
    * The membership join is the scale hazard this helper exists to own:
    * `comp` has one row per duplicate-involved doc, which at web-scale
    * corpora is 20–50% of the corpus — an unconditional `broadcast()`
    * there is an OOM at 100 TB, not a hint (round-11 verdict, q140). The
    * frame is lineage-truncated (reused by the measure and the join),
    * measured, and joined under [[graft.ops.JoinRegime.sizeAware]]:
    * broadcast while genuinely small, shuffle_hash past the bound — never
    * a forced broadcast, never a sort-merge. PlanQualitySpec pins the
    * degradation to ShuffledHashJoin above a synthetic threshold corpus. */
  def clusterSplit(docs: DataFrame, comp: DataFrame, idCol: String,
      trainHi: Int = 7, valHi: Int = 8, buckets: Int = 10): DataFrame = {
    val compT = graft.ops.Checkpoints.truncate(comp)
    val compBytes = compT.count() * 32L // (id, comp) longs + Tungsten row overhead
    docs.join(graft.ops.JoinRegime.sizeAware(compT, compBytes), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("comp"), col(idCol)))
      .withColumn("bucket", sampleKey(col("cluster"), buckets))
      .withColumn("split",
        when(col("bucket") <= trainHi, "train")
          .when(col("bucket") <= valHi, "val").otherwise("test"))
  }

  /** Stratified sample: keep a row when its [[sampleKey]] falls under its
    * stratum's keep-rate (permille). The mixture knob of a training-data
    * pipeline — "30% of en, 10% of everything else" — as a pure filter:
    * no shuffle, no sort, pushes below later aggregations. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      ratesPermille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (s, r)) => when(stratum === s, lit(r.toLong)).otherwise(acc)
    }
    df.filter(sampleKey(id) < rate)
  }

  /** Per-stratum percentile gate — "keep each language's top (1−p)
    * quality quantile": keep exactly the rows whose `cume_dist` within
    * their stratum reaches p — the ANSI `percentile_disc` gate (every row
    * at or above the smallest value whose cumulative fraction ≥ p),
    * spelled as one window so both engines compute it identically.
    *
    * Why not interpolated `percentile`/`quantile_cont` thresholds (the
    * pre-round-8 form): interpolation is float arithmetic BETWEEN data
    * values, and the two engines' algebraically-equal-but-differently-
    * associated formulas (`lo + (hi−lo)·f` vs `lo·(1−f) + hi·f`) disagree
    * by ulps — at sf0.1 one boundary row of q124 landed on opposite sides.
    * `cume_dist ≥ p` never manufactures a value: the comparison is
    * (#rows ≤ v)/n against p, and correctly-rounded division makes the
    * k/n = p boundary exact in any IEEE engine. Semantics: admits ties at
    * the cut value, so the kept fraction is ≥ (1−p) by up to the tie mass
    * (same as the threshold form).
    *
    * Cost shape: one per-stratum sort (the exact-percentile agg buffered
    * and sorted the same values per group); at 100 TB swap an
    * `approx_percentile` threshold + broadcast gate into this signature.
    * Output = input columns + `q` (the rounded score). */
  def percentileGate(df: DataFrame, stratum: Column, score: Column,
      p: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s")).orderBy(col("q"))
    df.withColumn("__s", stratum).withColumn("q", round(score, 6))
      .withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") >= p)
      .drop("__s", "__cd")
  }

  /** Document frequency per token: how many documents contain each distinct
    * whitespace token. One explode + one two-phase count — the vocabulary
    * table every downstream lexical statistic joins against. */
  def docFrequency(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(text))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))

  /** Heavy-hitter tokens: tokens appearing in ≥ `minDocFrac` of all
    * documents. Exact two-phase aggregation (the 100 TB path is the same
    * plan — partial counts combine map-side; the result is vocabulary-sized,
    * not corpus-sized). */
  def heavyHitterTokens(docs: DataFrame, id: Column, text: Column,
      minDocFrac: Double): DataFrame = {
    val total = docs.agg(count(lit(1)).as("n_docs"))
    docFrequency(docs, id, text)
      .crossJoin(broadcast(total))
      .filter(col("df") >= col("n_docs") * minDocFrac)
      .withColumn("doc_frac", round(col("df").cast("double") / col("n_docs"), 6))
      .select(col("tok"), col("df"), col("doc_frac"))
  }

  /** Top-k TF-IDF terms per document. The idf is integer-scaled —
    * `(N·1e6) div df` — instead of `ln(N/df)`: same ranking monotonicity
    * (increasing in tf, decreasing in df), but exact integer arithmetic, so
    * scores and therefore top-k sets are bit-identical across engines (a
    * last-ulp `ln` difference can flip a rank); swapping in a float idf is a
    * one-line change. Ties rank by term for determinism.
    *
    * Shape: tf is a (doc, term) two-phase count over exploded tokens; df is
    * vocabulary-sized and joins on the term key (broadcast when it fits,
    * shuffle-join on `tok` otherwise — both sides are already aggregated, so
    * the join never touches corpus-scale rows). */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val tf = docs.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = docFrequency(docs, id, text)
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "tok")
      .crossJoin(broadcast(total))
      // integer div, not double-divide-then-truncate: above 2^53 docs the
      // double path rounds and can flip a rank vs the integer oracle
      .withColumn("score", col("tf") * expr("(n_docs * 1000000) div df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** Sequence packing: assign documents to fixed-token-capacity packs by
    * contiguous fill in id order — the "fill the context window" step before
    * tokenized training shards are written. A document starting at running
    * offset `o` goes to pack `o div cap` (documents may straddle a boundary,
    * as real packers allow with cross-doc attention masks).
    *
    * The running offset is a window cumsum partitioned by `(stratum, shard)`
    * where `shard = id div shardSize`: a GLOBAL cumsum would serialize on one
    * partition at 100 TB; bounded shards keep every window partition
    * shard-sized and independent, which is exactly how packing shards out in
    * production (packs never span output files anyway). Pure integer
    * arithmetic — cross-engine exact. */
  def sequencePack(docs: DataFrame, id: Column, text: Column, stratum: Column,
      capTokens: Int, shardSize: Int = 1000): DataFrame = {
    val base = docs.select(stratum.as("stratum"), id.as("doc_id"),
      TextAnalysis.tokenCount(text).as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val w = Window.partitionBy(col("stratum"), col("shard")).orderBy(col("doc_id"))
    base.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div $capTokens"))
      .select(col("stratum"), col("shard"), col("pack_id"),
        col("doc_id"), col("n_tok"))
  }

  /** Materialize packed training shards: per (stratum, shard, pack), the
    * member documents concatenated in id order with an explicit separator
    * token — the text a shard writer actually emits after [[sequencePack]]
    * assigns packs. `collect_list` order is partition-dependent; sorting
    * the collected (id, text) structs restores determinism (struct order =
    * first-field order), so the concatenation is cross-engine exact and the
    * pack hash is stable under any partitioning. Pack contents are
    * pack-sized by construction (capTokens), so the per-group collect is
    * bounded — this is the one curation op whose group payload is the data
    * itself, which is precisely its job. */
  def packConcat(docs: DataFrame, id: Column, text: Column, stratum: Column,
      capTokens: Int, shardSize: Int = 1000, sep: String = "<|eos|>"): DataFrame = {
    val packed = sequencePack(docs, id, text, stratum, capTokens, shardSize)
    val withText = docs.select(id.as("doc_id"), text.as("__text"))
    packed.join(withText, "doc_id")
      .groupBy(col("stratum"), col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("pack_tok"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("doc_id"), col("__text")))),
          e => e("__text"))).as("pack_text"))
  }

  /** Fixed-token chunking with overlap — the per-document counterpart of
    * [[sequencePack]]: each document's token sequence splits into windows of
    * `chunkTokens` advancing by `chunkTokens - overlapTokens`, the context
    * units a pretraining/retrieval pipeline actually embeds or trains on.
    * Pure per-row expressions (tokenize once, explode chunk ids, slice) —
    * no shuffle, no window, scan-speed at any scale; chunk count per doc is
    * `ceil((n - overlap) / step)` (one chunk when the doc fits), so short
    * docs never emit empty tails. Integer arithmetic end-to-end. */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlapTokens
    val base = docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
    val nChunks = when(col("__n") <= chunkTokens, lit(1L))
      .otherwise(ceil((col("__n") - lit(overlapTokens.toLong)).cast("double") / step).cast("long"))
    base
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("__chunk", slice(col("__tk"),
        (col("chunk_id") * step + 1).cast("int"), lit(chunkTokens)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__chunk")).cast("long").as("chunk_tok"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Seeded shuffle key: `md5(seed || ':' || id)` — a deterministic,
    * engine-portable total order (md5 string equality is already
    * cross-engine-proven by the content fingerprints). Different seeds give
    * independent orders, so per-epoch reshuffles are one seed change. */
  def shuffleKey(id: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** Deterministic global shuffle of a training corpus: total order by
    * [[shuffleKey]] (id tie-break for md5-collision paranoia). Spark executes
    * a global ORDER BY as a RANGE-partitioned sort — boundary sampling, then
    * independent per-partition sorts; no single-task pass at any scale. The
    * epoch-shuffle every trainer needs, reproducible across runs, engines,
    * and cluster sizes. */
  def shuffled(df: DataFrame, id: Column, seed: String): DataFrame = {
    val key = shuffleKey(id, seed)
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), id)
  }

  /** Materialized form of [[shuffled]]: write the corpus as `files` parquet
    * files whose CONCATENATION in filename order is the shuffled order —
    * `repartitionByRange` on the shuffle key gives each file a disjoint key
    * range (balanced by sampling) and `sortWithinPartitions` orders inside,
    * so a shard reader streaming files sequentially replays the exact
    * global permutation without any single global sort task. */
  def writeShuffled(df: DataFrame, id: Column, seed: String,
      path: String, files: Int): Unit = {
    val keyed = df.withColumn("__sk", shuffleKey(id, seed)).withColumn("__id", id)
    keyed.repartitionByRange(files, col("__sk"), col("__id"))
      .sortWithinPartitions(col("__sk"), col("__id"))
      .drop("__sk", "__id")
      .write.mode("overwrite").parquet(path)
  }

  /** Mixture weights ABOVE 1.0 — "epochs per domain": each row repeats
    * `rate/1000` full times, plus one more when its [[sampleKey]] falls
    * under the fractional remainder (rate 2300 = every doc twice, a
    * deterministic 30% of docs a third time). The up-weighting half of data
    * mixing ([[stratifiedSample]] is the down-weighting half; both keys are
    * the same modular arithmetic, so a doc's fate is reproducible across
    * engines and runs). Output carries a `copy` index (1-based): downstream
    * shuffles can't collapse the replicas, and a copy-aware consumer can
    * e.g. drop copy > 1 for eval splits. */
  def epochMixture(df: DataFrame, id: Column, stratum: Column,
      ratesPermille: Map[String, Int], defaultPermille: Int): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (s, r)) => when(stratum === s, lit(r.toLong)).otherwise(acc)
    }
    val copies = (rate.cast("long") / 1000L).cast("long") +
      when(sampleKey(id) < pmod(rate, lit(1000L)), 1L).otherwise(0L)
    // filter BEFORE the sequence: sequence(1, 0) steps DOWNWARD in Spark
    // (it would fabricate copies for zero-rate strata, not drop them)
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Temperature-weighted mixture sampling — the Gopher/LLaMA-style
    * mixture knob: sample so source PROPORTIONS follow n^α (α = 1/2 here)
    * instead of raw counts n, boosting small sources and damping dominant
    * ones. Expected kept rows from stratum i ≈ target · w_i / Σw with
    * w_i = ⌊√n_i⌋.
    *
    * Everything is engine-exact: weights are `floor(sqrt(n))` (IEEE sqrt
    * is correctly rounded, so Spark and DuckDB agree bit-for-bit on the
    * same integer input), thresholds are pure integer floor division
    * `(target · w_i · 10⁶) div (Σw · n_i)`, and the per-row draw is the
    * deterministic [[sampleKey]] hash over 10⁶ buckets — no RNG, no
    * float accumulation order, reproducible across engines, runs, and
    * partitionings.
    *
    * Shape: one stratum-sized count aggregation, a 1-row total, the
    * threshold table broadcast back — the corpus itself sees one
    * scan-speed filter, exactly like [[stratifiedSample]]. The threshold
    * arithmetic runs in DECIMAL(38,0) (long arithmetic wraps at realistic
    * magnitudes: target 10⁹ × w 3·10⁶ × 10⁶ = 3·10²¹ ≫ 2⁶³; the decimal
    * form is exact to 10³⁸ — target·w·10⁶ ≤ ~10²⁸ even at 10¹³-row
    * strata) with `div` integral division, so the values are identical to
    * the overflow-free integer formula on any engine. A NULL stratum is a
    * stratum like any other: the threshold join is NULL-SAFE, so its rows
    * sample at their own √n rate instead of silently vanishing while
    * still deflating Σw. */
  def temperatureMixture(df: DataFrame, id: Column, stratum: Column,
      targetRows: Long): DataFrame = {
    require(targetRows > 0 && targetRows <= 1000000000L,
      "temperatureMixture: targetRows in [1, 1e9]")
    val counts = df.groupBy(stratum.as("__st"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("__w")).as("__sw"))
    val thr = counts.crossJoin(broadcast(tot))
      .select(col("__st").as("__stT"),
        expr(s"CAST((CAST($targetRows AS DECIMAL(38,0)) * __w * 1000000) div " +
          "(CAST(__sw AS DECIMAL(38,0)) * __n) AS BIGINT)").as("__t"))
    df.withColumn("__st", stratum)
      .join(broadcast(thr), col("__st") <=> col("__stT"))
      .filter(sampleKey(id, 1000000) < col("__t"))
      .drop("__st", "__stT", "__t")
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a benchmark set, with the count of distinct shared grams.
    * The benchmark side is tiny by nature (eval sets) — its distinct n-gram
    * set broadcasts, the corpus explodes its distinct grams once and
    * semi-aggregates; no corpus-side shuffle beyond the per-doc count.
    * String n-grams (not engine hashes) keep the operator oracle-exact;
    * the hashed-long variant ([[Dedup.wordNgramHashes]]) is the byte-lean
    * production spelling. */
  def flagContaminated(docs: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, benchmarkText: Column, n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(array_distinct(Dedup.wordNgrams(benchmarkText, n))).as("ng"))
      .distinct()
    docs.select(id.as("doc_id"),
        explode(array_distinct(Dedup.wordNgrams(text, n))).as("ng"))
      .join(broadcast(benchGrams), Seq("ng"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
  }

  /** Per-source document cap (domain balancing): keep at most `k` documents
    * per source, chosen by `priority` descending (ties to the lowest id) —
    * the "no domain may dominate the mixture" rule of a crawl-curation
    * pipeline. One window shuffle keyed by source; at 100 TB the window
    * partitions are per-domain and bounded by the cap's purpose (a domain
    * large enough to serialize a partition is exactly one being capped —
    * pre-filter such megadomains by a cheap count if they dominate). */
  def capPerSource(docs: DataFrame, id: Column, source: Column,
      priority: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("__src")).orderBy(col("__pri").desc, col("__cid"))
    docs.withColumn("__src", source).withColumn("__pri", priority)
      .withColumn("__cid", id)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__src", "__pri", "__cid", "__rn")
  }

  /** Token-budget sampling: per stratum, take documents in `priority`-desc
    * order while the RUNNING token total stays within `budgetTokens` — the
    * "best N billion tokens per language" selection rule. A document is kept
    * iff the cumsum through itself is ≤ budget (documents after the first
    * overflow are dropped even if a smaller later doc would fit — contiguous
    * prefix semantics, deterministic and cross-engine exact in integer
    * arithmetic). One window shuffle keyed by stratum; strata are language-
    * sized, and the same shard trick as [[sequencePack]] applies when a
    * stratum outgrows a partition and the budget is per-shard. */
  def tokenBudgetSample(docs: DataFrame, id: Column, text: Column,
      stratum: Column, priority: Column, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col("__str")).orderBy(col("__pri").desc, col("__bid"))
    docs.withColumn("__str", stratum).withColumn("__pri", priority)
      .withColumn("__bid", id)
      .withColumn("__tok", TextAnalysis.tokenCount(text))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= budgetTokens)
      .drop("__str", "__pri", "__bid", "__tok", "__cum")
  }

  /** Single-pass column profile — the data-health report of an ingest
    * pipeline (null rates, cardinalities, value ranges per column, e.g. to
    * catch a broken upstream feed before it trains). ONE aggregation
    * computes every metric for every column (Catalyst plans the multiple
    * DISTINCTs as one scan + an Expand of factor |cols|, all map-side
    * combined), then the wide row unpivots to one row per column. Exact
    * distinct counts keep the operator oracle-checkable; at 100 TB swap
    * `count_distinct` for `approx_count_distinct` — same single-pass plan
    * without the Expand. min/max stringify AFTER aggregating in the native
    * type, so numeric ranges are numeric, not lexicographic. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
      count_distinct(col(c)).as(s"__${c}_nd"),
      min(col(c)).cast("string").as(s"__${c}_mn"),
      max(col(c)).cast("string").as(s"__${c}_mx")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("col_name"), col("__n").as("n"),
      col(s"__${c}_nn").as("n_null"), col(s"__${c}_nd").as("n_distinct"),
      col(s"__${c}_mn").as("min_str"), col(s"__${c}_mx").as("max_str")))
    row.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Distribution-drift report between two corpus snapshots — the
    * monitoring op that catches an upstream feed change before it trains:
    * bin a signal (quality score, length, ...) per stratum in BOTH
    * snapshots and compare the bin distributions by total variation
    * distance. Kept in EXACT integer arithmetic: per stratum,
    * `drift_int = Σ_bins |nA·NB − nB·NA|` and `tvd = drift_int/(2·NA·NB)`
    * — no floating histogram normalization, so drift values (and any
    * alert threshold on them) are bit-identical across engines.
    *
    * Shape: two binned two-phase counts, a full-outer join on
    * (stratum, bin) — bins×strata-sized — and a stratum rollup; corpus
    * touched once per side. */
  def distributionDrift(a: DataFrame, b: DataFrame,
      stratum: Column, bin: Column): DataFrame = {
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(stratum.as("stratum"), bin.as("bin"))
        .groupBy(col("stratum"), col("bin")).agg(count(lit(1)).as(cnt))
    def totals(df: DataFrame, tot: String): DataFrame =
      df.select(stratum.as("stratum")).groupBy(col("stratum"))
        .agg(count(lit(1)).as(tot))
    // totals join FULL OUTER with zero-fill: a stratum entirely absent from
    // one snapshot is the STRONGEST drift signal — an inner join here would
    // silently drop it from the report (and its tvd is 1 by definition)
    binned(a, "na").join(binned(b, "nb"), Seq("stratum", "bin"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
      .join(totals(a, "tot_a"), Seq("stratum"), "full_outer")
      .join(totals(b, "tot_b"), Seq("stratum"), "full_outer")
      .na.fill(0L, Seq("tot_a", "tot_b"))
      .groupBy(col("stratum"))
      .agg(max(col("tot_a")).as("n_a"), max(col("tot_b")).as("n_b"),
        sum(abs(col("na") * col("tot_b") - col("nb") * col("tot_a"))).as("drift_int"))
      .withColumn("tvd",
        when(col("n_a") === 0 || col("n_b") === 0, lit(1.0))
          .otherwise(round(col("drift_int").cast("double") /
            (lit(2.0) * col("n_a") * col("n_b")), 6)))
  }

  /** Engine-portable per-row hash: polynomial fold (base 31, mod 1e9+7) of
    * the md5 hex characters of the U+0001-joined column values. md5 is the
    * cross-engine byte-exact primitive already proven by the content
    * fingerprints; the fold maps it into integer space so it can SUM. */
  def portableRowHash(cols: Seq[Column]): Column = {
    // coalesce each column to a U+0002 sentinel BEFORE joining: concat_ws
    // silently SKIPS null arguments, so without it (a, NULL, b) and (a, b)
    // would hash equal -- and a DuckDB oracle written with `||` would instead
    // propagate NULL, diverging engines on any nullable hash column. U+0002
    // is distinct from the separator, so NULL never collides with "" either.
    val safe = cols.map(c => coalesce(c.cast("string"), lit("\u0002")))
    val m = md5(concat_ws("\u0001", safe: _*))
    aggregate(
      transform(sequence(lit(1), lit(32)), i => ascii(m.substr(i, lit(1))).cast("long")),
      lit(0L), (a, c) => (a * 31 + c) % 1000000007L)
  }

  /** Dataset manifest fingerprint — the reproducibility primitive of a
    * training-data pipeline: an ORDER-INVARIANT multiset hash per stratum
    * (`sum(h)` and `sum(h² mod p)` over [[portableRowHash]]), so two
    * materializations of a corpus compare equal iff they hold the same
    * rows, regardless of partitioning, file order, or engine. Pure
    * two-phase aggregation (commutative sums combine map-side); emitting
    * both moments makes content swaps that preserve one sum visible in the
    * other. The manifest line a run records next to its data version. */
  def manifest(df: DataFrame, stratum: Column, hashCols: Seq[Column]): DataFrame = {
    val h = portableRowHash(hashCols)
    df.select(stratum.as("stratum"), h.as("__h"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(col("__h")).as("fp_sum"),
        sum(col("__h") * col("__h") % 1000000007L).as("fp_sq"))
  }

  /** Collocation mining: adjacent word pairs ranked by integer-scaled lift
    * (PMI without the log — `lift = P(xy) / (P(x)·P(y))`, same ranking
    * monotonicity; Manning & Schütze ch. 5 is the public construction).
    * `lift_int = ((c_xy·N) div c_x)·1e6 div c_y` keeps the whole statistic
    * in exact integer arithmetic (the TF-IDF/bigram-LM trick), so scores
    * and top-k sets are bit-identical across engines. The fixed-phrase
    * detector of a lexical pipeline — multiword expressions, boilerplate
    * templates, tokenizer merge candidates beyond raw frequency (q134/q142
    * rank pairs by COUNT; lift surfaces rare-but-bound pairs instead).
    *
    * Shape: one corpus-sized pair count and one unigram count (both
    * two-phase, map-side combined); the scoring joins touch only the
    * aggregated tables, and the `minCount` support floor bounds the pair
    * table the way every heavy-hitter op here bounds its output. */
  def collocations(docs: DataFrame, text: Column, minCount: Long,
      topK: Int): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(text).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val bi = toks.filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS x, element_at(tk, i + 1) AS y))")).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x") =!= "" && col("y") =!= "")
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    bi
      .join(uni.withColumnRenamed("w", "x").withColumnRenamed("c", "cx"), "x")
      .join(uni.withColumnRenamed("w", "y").withColumnRenamed("c", "cy"), "y")
      .crossJoin(broadcast(total)) // 1-row total
      .withColumn("lift", expr("((cxy * n) div cx) * 1000000 div cy"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(topK)
      .select(col("x"), col("y"), col("cxy"), col("cx"), col("cy"), col("lift"))
  }

  /** Length-bucketed dynamic batching: group documents of similar token
    * length into fixed-size batches so per-batch padding (every sequence
    * pads to the batch max) stays small — the throughput knob every
    * training loader turns. Buckets are power-of-two length bands computed
    * WITHOUT floats (`length(bin(n))` = position of the highest set bit —
    * log2 through a double can misround at exact powers); within a
    * (bucket, shard) the docs sort by (n_tok, doc_id) and chop into
    * `batchSize` runs. Windows are SHARDED (`doc_id % shards`) like
    * [[sequencePack]] — a global per-bucket window would serialize each
    * bucket through one task; shard-local batch ids keep every partition
    * bounded and the whole assignment deterministic.
    *
    * Returns one row per BATCH: (bucket, shard, batch, n_docs, max_tok,
    * sum_tok, waste) with waste = n_docs·max_tok − sum_tok, the padding
    * tokens the bucketing exists to minimize. */
  def lengthBucketBatches(docs: DataFrame, id: Column, text: Column,
      batchSize: Int, shards: Int): DataFrame = {
    require(batchSize >= 1 && shards >= 1,
      "lengthBucketBatches: batchSize and shards must be >= 1")
    val n = TextAnalysis.tokenCount(text)
    val base = docs.select(id.as("doc_id"), n.as("n_tok"))
      .withColumn("bucket", length(bin(col("n_tok"))).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tok"), col("doc_id"))
    base
      .withColumn("rn0", row_number().over(w).cast("long") - 1)
      .withColumn("batch", expr(s"rn0 div $batchSize"))
      .groupBy(col("bucket"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("waste", col("n_docs") * col("max_tok") - col("sum_tok"))
  }

  /** Intra-document repetition signals (quality-filter features): total
    * token count, distinct-token ratio, and top-token dominance (count of
    * the most frequent token over all tokens — boilerplate and degenerate
    * generations score high). Two hash aggregations, both keyed by doc —
    * no window, no per-document collect. */
  def repetitionSignals(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_tok"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("top_tok_ratio"),
        round(count(lit(1)).cast("double") / sum(col("c")), 6).as("distinct_ratio"))

  /** Line-level boilerplate removal (the CCNet / RefinedWeb cleanup rule):
    * a LINE that appears in >= `minDocs` DISTINCT documents of the same
    * source is boilerplate (nav bars, cookie banners, license footers) and
    * is struck from every document; the survivors are reassembled in
    * original line order. Returns one row per input document — including
    * documents whose every line was boilerplate (n_kept = 0, empty text):
    * (doc_id, n_lines, n_kept, clean_md5). A NULL text explodes to no
    * lines, so the document is ABSENT from the output (the q177
    * no-shingles convention), not present-with-zero.
    *
    * 100 TB shape: the document-frequency pass shuffles (source,
    * xxhash64(line)) longs, never line text (Catalyst prunes `line` off
    * that branch); the boilerplate key set — small by the nature of
    * boilerplate — joins back (broadcast while it fits, AQE decides) and
    * ONE doc-keyed aggregation rebuilds. Lines are recomputed for the two
    * consumers rather than checkpointed: a corpus-sized materialization is
    * exactly what won't fit, a second streaming scan always does. Hash
    * collisions over-strike with probability ~k²/2⁶⁴ (the q45 argument). */
  def stripBoilerplateLines(docs: DataFrame, id: Column, source: Column,
      text: Column, sepRegex: String, sep: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2, "stripBoilerplateLines: minDocs must be >= 2")
    stripBoilerplateImpl(docs, id, source, text, sepRegex, sep, None, minDocs)
  }

  /** [[stripBoilerplateLines]] with the threshold SCALED to each source's
    * size: a line is boilerplate in source s when it appears in
    * ≥ max(2, ⌈fracPpm·n_docs(s)/10⁶⌉) distinct documents — the knob that
    * keeps the operator meaningful from a 25-doc source to a million-doc
    * one (at a fixed minDocs=2, every twice-pasted snippet in a large
    * crawl source is "boilerplate"; at a fixed fraction it must recur at
    * the source's own scale). Integer ceiling (`(n·ppm + 999999) div 10⁶`)
    * — no float threshold to diverge cross-engine. The per-source doc
    * counts are a |sources|-sized broadcast into the frequency filter;
    * the 2-doc floor keeps tiny sources from striking every shared line.
    * Same class of auto-scaling rule as `neardupPlanesFor`/`binWidthFor`/
    * `semDedupClustersFor`. */
  def stripBoilerplateLinesFrac(docs: DataFrame, id: Column, source: Column,
      text: Column, sepRegex: String, sep: String, fracPpm: Long): DataFrame = {
    require(fracPpm >= 1, "stripBoilerplateLinesFrac: fracPpm must be >= 1")
    stripBoilerplateImpl(docs, id, source, text, sepRegex, sep, Some(fracPpm), 2)
  }

  private def stripBoilerplateImpl(docs: DataFrame, id: Column, source: Column,
      text: Column, sepRegex: String, sep: String, fracPpm: Option[Long],
      minDocs: Int): DataFrame = {
    val lines = docs.select(id.as("doc_id"), source.as("src"),
        posexplode(split(text, sepRegex)).as(Seq("idx", "line")))
      .withColumn("lh", xxhash64(col("line")))
    val freq = lines.groupBy(col("src"), col("lh"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val boiler = (fracPpm match {
      case None => freq.filter(col("df") >= minDocs)
      case Some(ppm) =>
        val thr = docs.groupBy(source.as("src"))
          .agg(greatest(lit(2L),
            expr(s"(count(1) * $ppm + 999999) div 1000000")).as("__thr"))
        freq.join(broadcast(thr), Seq("src")).filter(col("df") >= col("__thr"))
    }).select(col("src"), col("lh"), lit(1).as("__boiler"))
    lines.join(boiler, Seq("src", "lh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops NULLs: only kept lines enter the rebuild
        md5(array_join(transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("idx"), col("line"))))),
          e => e.getField("line")), sep)).as("clean_md5"))
  }

  /** Water-filling token allocation: spread a global token budget across
    * sources so no source exceeds a common cap `c`, with c the largest
    * integer such that Σ min(tokens_s, c) ≤ budget — the "flatten the
    * mixture without wasting budget" rule (uniform cap, surplus flowing to
    * the sources that can use it). budget = ⌊budgetPpm·total/10⁶⌋. Returns
    * (k, n_tok, alloc, cap) per source; cap is NULL (and alloc = n_tok)
    * when the whole corpus fits the budget.
    *
    * Closed form, not a search: on sources sorted by tokens ascending, the
    * level lies in exactly one gap [t_{j-1}, t_j), where it equals
    * ⌊(budget − S_{j-1}) / slots_j⌋ — one pass of window arithmetic over
    * the |sources|-sized relation. 100 TB shape: the corpus-sized work is
    * the one per-source aggregation; the windows then run on |sources|
    * rows (single-partition by construction — fine at any real source
    * count), and the 1-row cap cross-joins back. DECIMAL(38,0) guards
    * budgetPpm·total past the Long range. */
  def waterFillAlloc(docs: DataFrame, key: Column, weight: Column,
      budgetPpm: Long): DataFrame = {
    require(budgetPpm >= 0, "waterFillAlloc: budgetPpm must be >= 0")
    // NULL weights count as 0 (sum of an all-NULL group is NULL, and a NULL
    // n_tok would poison the level arithmetic); a NULL key is its own group,
    // consistent with temperatureMixture's NULL-stratum rule
    val per = docs.select(key.as("k"), weight.cast("long").as("w"))
      .groupBy(col("k")).agg(coalesce(sum(col("w")), lit(0L)).as("n_tok"))
    val ord = Window.orderBy(col("n_tok"), col("k"))
    val all = Window.partitionBy(lit(1))
    val ranked = per
      .withColumn("j", row_number().over(ord).cast("long"))
      .withColumn("s_prev", coalesce(sum(col("n_tok"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("t_prev", coalesce(lag(col("n_tok"), 1).over(ord), lit(0L)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("total", sum(col("n_tok")).over(all))
      .withColumn("budget", expr(
        s"CAST((CAST(total AS DECIMAL(38,0)) * $budgetPpm) DIV 1000000 AS BIGINT)"))
      .withColumn("cand", expr("(budget - s_prev) div (n - j + 1)"))
    // the level's gap: t_{j-1} <= cand < t_j, re-checked feasible (the
    // explicit Σ-bound also rejects truncated negatives landing on 0 when
    // zero-weight sources make t_prev = 0)
    val cap = ranked.filter(col("cand") >= col("t_prev") &&
        col("cand") < col("n_tok") &&
        col("s_prev") + col("cand") * (col("n") - col("j") + lit(1L)) <= col("budget"))
      .agg(min(col("cand")).as("cap"))
    ranked.crossJoin(cap)
      .select(col("k"), col("n_tok"),
        least(col("n_tok"), coalesce(col("cap"), col("n_tok"))).as("alloc"),
        col("cap"))
  }

  /** [[prioritySample]] per stratum: an independent weight-proportional
    * sample of k rows from EACH stratum, each with its own threshold
    * τ_s = the stratum's (k+1)-th priority and HT weights ŵ = max(w, τ_s)
    * — "a token-honest sample of every language", the per-stratum sibling
    * of the global TakeOrdered form. One stratum-keyed window shuffle;
    * the rnk ≤ k+1 cut happens before the |strata|-sized τ table joins
    * back (broadcast, NULL-SAFE: a NULL stratum samples as its own group,
    * the file-wide NULL-key convention). Strata with ≤ k rows pass
    * through with τ_s = 0. */
  def prioritySampleByStratum(docs: DataFrame, id: Column, stratum: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, "prioritySampleByStratum: k must be >= 1")
    val base = priorityBase(docs, Seq(id.as("s_id"), stratum.as("strat")), weight)
    val w1 = Window.partitionBy(col("strat"))
      .orderBy(col("priority").desc, col("s_id"))
    val ranked = base.withColumn("rnk", row_number().over(w1))
      .filter(col("rnk") <= k + 1)
    val tau = ranked.groupBy(col("strat")).agg(coalesce(
      max(when(col("rnk") === k + 1, col("priority"))), lit(0.0)).as("tau"))
      .withColumnRenamed("strat", "strat2")
    ranked.filter(col("rnk") <= k)
      .join(broadcast(tau), col("strat") <=> col("strat2"))
      .select(col("strat"), col("s_id").as("id"), col("w"), col("priority"),
        round(greatest(col("w").cast("double"), col("tau")), 6).as("est_w"))
  }

  /** Per-source corpus diversity profile — the health report that catches
    * a collapsed or over-templated source (synthetic data regurgitating,
    * a crawler stuck in a calendar) before it trains: token type-token
    * ratio, word-trigram diversity, and top-token dominance, each over the
    * WHOLE source rather than per document ([[repetitionSignals]] is the
    * per-doc sibling — a source can be degenerate while every doc looks
    * fine, e.g. one template stamped a million times).
    *
    * Two two-phase hash aggregations (tokens, trigram hashes), both keyed
    * (source, term) then (source) — map-side combine does the heavy lift;
    * trigrams ride as XXH64 longs (the q45 collision argument). Sources
    * too short for a trigram report n_tri = 0 with NULL diversity, not a
    * division error. */
  def sourceDiversity(docs: DataFrame, source: Column,
      text: Column, n: Int = 3): DataFrame = {
    val toks = docs.select(source.as("src"), explode(TextAnalysis.tokens(text)).as("t"))
      .groupBy(col("src"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("src")).agg(
        sum(col("c")).as("n_tok"),
        count(lit(1)).as("distinct_tok"),
        max(col("c")).as("top_tok"))
    val tris = docs.select(source.as("src"),
        explode(Dedup.wordNgramHashes(text, n)).as("h"))
      .groupBy(col("src"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("src")).agg(
        sum(col("c")).as("n_tri"), count(lit(1)).as("distinct_tri"))
    val dc = docs.groupBy(source.as("src")).agg(count(lit(1)).as("n_docs"))
    dc.join(toks, Seq("src"), "left").join(tris, Seq("src"), "left")
      .select(col("src"), col("n_docs"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        round(col("distinct_tok").cast("double") / col("n_tok"), 6).as("ttr"),
        round(col("top_tok").cast("double") / col("n_tok"), 6).as("top_tok_ratio"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(col("distinct_tri").cast("double") / col("n_tri"), 6).as("tri_diversity"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) over a release candidate: rows group by their
    * quasi-identifier combination; a group smaller than `k` re-identifies
    * (its members are distinguishable down to < k candidates), and a
    * group with fewer than `l` distinct sensitive values discloses even
    * at size ≥ k (everyone in it shares the secret). Returns the scalar
    * audit row (n_groups, n_small_groups, n_low_ldiv_groups,
    * n_rows_at_risk, min_group_size, min_ldiv) — at-risk rows counted
    * once even when a group fails both tests. ONE quasi-identifier-keyed
    * aggregation plus a scalar roll-up. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, "kAnonymityAudit: k and l must be >= 1")
    // group by the SELECTED columns' names — re-using the caller's Column
    // expressions would re-resolve against the projected frame and fail
    // for computed quasi-ids (their inputs are already projected away)
    val sel = df.select((quasiIds :+ sensitive.as("__s")): _*)
    val groups = sel
      .groupBy(sel.columns.filterNot(_ == "__s").map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col("__s")).as("ldiv"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
      sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("n_low_ldiv_groups"),
      sum(when(col("n") < k || col("ldiv") < l, col("n")).otherwise(0L))
        .as("n_rows_at_risk"),
      min(col("n")).as("min_group_size"),
      min(col("ldiv")).as("min_ldiv"))
  }

  /** Document-level co-occurrence associations for probe terms — the
    * distributional "what goes with X" miner ([[collocations]] ranks
    * ADJACENT bigrams; this ranks same-document company at any
    * distance): lift_ppm = ⌊10⁶ · n_xy · N / (n_x · n_y)⌋ over distinct
    * (doc, term) incidence, top `k` associates per probe by (lift desc,
    * term), with a minimum co-occurrence support gate (lift explodes on
    * rare accidental pairs — the classic association-mining trap).
    *
    * Shapes: ONE distinct (doc, term) shuffle; probe incidence is
    * semi-join-reduced by the broadcast probe list, so the co-occurrence
    * join is probe-docs-sized, never corpus²; DECIMAL(38,0) guards
    * 10⁶·n_xy·N. Returns (probe, term, n_xy, lift_ppm, rnk).
    * Precondition: `id` unique per input row (per-row term sets — the
    * r12 gram-set family rule; ExtSpec pins duplicate-id behavior). */
  def termAssociations(docs: DataFrame, id: Column, text: Column,
      probes: DataFrame, probe: Column, k: Int, minSupport: Long): DataFrame = {
    // (doc, term) incidence: the distinct is WITHIN one doc row, so it runs
    // as array_distinct before the explode — no Exchange (the
    // ngramJaccardPairs spelling; guide §2.4)
    val dt = docs.select(id.as("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(text))).as("t"))
    // scalar N rides as a 1-row broadcast, not a driver action — the plan
    // stays lazy and layout-blind
    val total = dt.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val df = dt.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val p = probes.select(probe.as("p"))
    val pDocs = dt.join(broadcast(p), col("t") === col("p"))
      .select(col("p"), col("doc_id"))
    val co = pDocs.join(dt, Seq("doc_id"))
      .filter(col("t") =!= col("p"))
      .groupBy(col("p"), col("t")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minSupport)
    val withN = co
      .join(df.withColumnRenamed("t", "p").withColumnRenamed("n_t", "n_x"), Seq("p"))
      .join(df, Seq("t"))
      .crossJoin(broadcast(total))
      .withColumn("lift_ppm", expr(
        "CAST((CAST(n_xy AS DECIMAL(38,0)) * 1000000 * n_docs) DIV (n_x * n_t) AS BIGINT)"))
    val w = Window.partitionBy(col("p")).orderBy(col("lift_ppm").desc, col("t"))
    withN.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("p").as("probe"), col("t").as("term"), col("n_xy"),
        col("lift_ppm"), col("rnk"))
  }

  /** Preference-pair construction for DPO/RLHF-style training: within
    * each stratum, rank rows by a quality score and pair rank r (top
    * half, "chosen") with rank r + ⌊n/2⌋ (bottom half, "rejected") —
    * the deterministic half-shift pairing that maximizes the MINIMUM
    * score gap across pairs for a fixed pairing count (adjacent pairing
    * yields near-zero gaps; the half-shift keeps every pair half the
    * distribution apart). Pairs below `minGap` drop (a preference label
    * needs a margin the scorer actually distinguishes). One
    * stratum-keyed window + one (stratum, rank) self-join. Returns
    * (strat, chosen_id, rejected_id, chosen_score, rejected_score, gap). */
  def preferencePairs(df: DataFrame, id: Column, stratum: Column,
      score: Column, minGap: Long): DataFrame = {
    val base = df.select(id.as("doc_id"), stratum.as("strat"),
      score.cast("long").as("x"))
    val wr = Window.partitionBy(col("strat")).orderBy(col("x").desc, col("doc_id"))
    val wn = Window.partitionBy(col("strat"))
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val ranked = base.withColumn("r", row_number().over(wr).cast("long"))
      .withColumn("h", idiv(count(lit(1)).over(wn), lit(2L)))
    val top = ranked.filter(col("r") <= col("h"))
      .select(col("strat"), col("doc_id").as("chosen_id"),
        col("x").as("chosen_score"), (col("r") + col("h")).as("pr"))
    val bot = ranked.select(col("strat"), col("doc_id").as("rejected_id"),
      col("x").as("rejected_score"), col("r").as("pr"))
    top.join(bot, Seq("strat", "pr"))
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .filter(col("gap") >= minGap)
      .select(col("strat"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"), col("gap"))
  }

  /** Exact-ratio stratified split: every stratum gets EXACTLY
    * ⌊n·train/1000⌋ train rows and ⌊n·(train+val)/1000⌋ − train val rows
    * (the modular-key split only approximates ratios in expectation —
    * fine for big strata, visibly off for small ones, and some evals
    * need the counts exact). Rows order by the seeded [[shuffleKey]]
    * within each stratum (deterministic, engine-portable, uncorrelated
    * with content), ranks gate the gap. One stratum-keyed window.
    * Returns (doc_id, strat, split). For leakage-safe splitting compose
    * with a cluster representative as the id ([[splitLeakageAudit]]). */
  def exactRatioSplit(df: DataFrame, id: Column, stratum: Column,
      trainPermille: Int, valPermille: Int, seed: String = "split"): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "exactRatioSplit: permilles invalid")
    val base = df.select(id.as("doc_id"), stratum.as("strat"),
      shuffleKey(id, seed).as("__sk"))
    val wr = Window.partitionBy(col("strat")).orderBy(col("__sk"), col("doc_id"))
    val wn = Window.partitionBy(col("strat"))
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    base.withColumn("__r", row_number().over(wr).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("__r") <= idiv(col("__n") * trainPermille, lit(1000L)), "train")
          .when(col("__r") <= idiv(col("__n") * (trainPermille + valPermille),
            lit(1000L)), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("strat"), col("split"))
  }

  /** Quantile normalization across strata (Bolstad et al. 2003 — the
    * batch-effect remover, here for calibrating quality scores across
    * corpora whose scorers drift): each row's within-stratum rank maps
    * onto the POOLED distribution, `norm = pooled value at index
    * ⌊(r−1)·N/n_s⌋ + 1`, so every stratum's normalized values come from
    * one common distribution while within-stratum ORDER is untouched.
    * All integer: ranks, counts, floor division — and the pooled lookup
    * needs no global sort join: the pooled value at index i is simply
    * the VALUE TIER whose cumulative range covers i, so the |distinct
    * values|-sized tier table (value, offset, count) broadcasts and a
    * range condition resolves the lookup. One stratum-keyed window pass
    * over the data; tier offsets from a bounded aggregate.
    * Returns (doc_id, strat, x, norm). */
  def quantileNormalize(df: DataFrame, id: Column, stratum: Column,
      score: Column): DataFrame = {
    val base = df.select(id.as("doc_id"), stratum.as("strat"),
      score.cast("long").as("x"))
    val tiers = base.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    val wo = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tiers
      .withColumn("off", coalesce(sum(col("cnt")).over(wo), lit(0L)))
      .select(col("x").as("vx"), col("off"), col("cnt"))
    val wr = Window.partitionBy(col("strat")).orderBy(col("x"), col("doc_id"))
    val wn = Window.partitionBy(col("strat"))
    val total = base.agg(count(lit(1)).as("n_total"))
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    base
      .withColumn("r", row_number().over(wr).cast("long"))
      .withColumn("n_s", count(lit(1)).over(wn))
      .crossJoin(broadcast(total))
      .withColumn("i", idiv((col("r") - 1) * col("n_total"), col("n_s")) + 1)
      .join(broadcast(offs),
        col("i") > col("off") && col("i") <= col("off") + col("cnt"))
      .select(col("doc_id"), col("strat"), col("x"), col("vx").as("norm"))
  }

  /** Weighted-lexicon matching — the safety/topic filter stage (toxicity
    * lexicons, license-string lists, compliance terms): terms of one OR
    * two tokens (real lexicons contain phrases) match exactly against the
    * token stream, every hit carries the term's category and weight, and
    * the result is per-(doc, category) hit/weight totals for callers to
    * threshold. A two-token term's hits are independent of its tokens'
    * own unigram hits (both count — document-level weights encode the
    * intent). Matching is case-sensitive on the already-normalized
    * stream; run [[TextAnalysis.normalizedText]] first for case-blind
    * lexicons.
    *
    * 100 TB shape: the lexicon is small by nature → broadcast to BOTH
    * the unigram and bigram probes; one (doc, category) aggregation. */
  def lexiconHits(docs: DataFrame, id: Column, text: Column,
      lexicon: DataFrame, term: Column, category: Column,
      weight: Column): DataFrame = {
    val lex = lexicon.select(term.as("__t"), category.as("category"),
      weight.as("__w"))
    val u = docs.select(id.as("doc_id"),
        explode(TextAnalysis.tokens(text)).as("__t"))
      .join(broadcast(lex), Seq("__t"))
    val b = docs.select(id.as("doc_id"),
        explode(graft.functions.TextExpressions.wordNgrams(text, 2)).as("__t"))
      .join(broadcast(lex), Seq("__t"))
    u.unionByName(b)
      .groupBy(col("doc_id"), col("category"))
      .agg(count(lit(1)).as("n_hits"), sum(col("__w")).as("sum_weight"))
  }

  /** Split-leakage audit: given a per-row SPLIT assignment and a grouping
    * KEY under which rows are "the same content" (a content fingerprint,
    * a near-dup cluster id — any equivalence handle), count the groups
    * that span ≥ 2 splits and the rows they cover. A train/test split
    * leaks when a group straddles it (the eval set then contains
    * training-set near-copies and the benchmark lies) — this is the
    * CHECK that belongs in every pipeline next to the cluster-keyed
    * split that prevents it. One key-hashed aggregation, then a scalar
    * roll-up: (n_groups, n_leaky_groups, n_docs_at_risk). */
  def splitLeakageAudit(df: DataFrame, key: Column, split: Column): DataFrame =
    df.select(key.as("k"), split.as("split"))
      .groupBy(col("k"))
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n_splits") >= 2, 1L).otherwise(0L)).as("n_leaky_groups"),
        sum(when(col("n_splits") >= 2, col("n_rows")).otherwise(0L))
          .as("n_docs_at_risk"))

  /** Cluster-aware train/eval split — the FIX [[splitLeakageAudit]] checks
    * for: every document inherits its near-dup CLUSTER's split (component
    * from `pairs`; a pairless document is its own singleton cluster), and
    * the split gate hashes the cluster id, so near-copies can never
    * straddle train/eval — by construction, not by audit. Returns one row
    * per document: (doc_id, comp, split). The gate is [[sampleKey]] on the
    * component id (integer arithmetic, no RNG — the split is reproducible
    * and oracle-restatable).
    *
    * 100 TB shape: the pair graph is the caller's blocked dedup output
    * (never all-pairs); components are the q95/q111 propagation; the
    * split itself is a per-row map over the component column. */
  def clusterAwareSplit(docs: DataFrame, id: Column, pairs: DataFrame,
      trainPermille: Int): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      "clusterAwareSplit: trainPermille in [0, 1000]")
    val comp = graft.ext.Dedup.connectedComponents(pairs)
      .toDF("doc_id", "comp")
    docs.select(id.as("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .withColumn("split",
        when(sampleKey(col("comp")) < trainPermille, "train")
          .otherwise("eval"))
  }

  /** Zipf rank-frequency slope of the token distribution, exact-integer —
    * the corpus-health number that separates natural text (slope ≈ −1 on
    * log-log axes, Zipf 1949) from template spam (flat head) and
    * near-random token soup (steep, thin tail). The top-`topK` tokens rank
    * by (count DESC, token); both axes quantize through [[TextAnalysis
    * .log2Bucket]] (binary-string length — no libm anywhere), and the OLS
    * slope over the (⌊log₂ rank⌋, ⌊log₂ count⌋) points is the exact
    * rational micro-slope (the q252 trendSlope arithmetic: DECIMAL
    * moments, sign-split floor division). One row:
    * (n_points, checksum = Σy, slope_micro).
    *
    * 100 TB shape: one token-keyed count (the only corpus-sized shuffle),
    * a bounded TakeOrdered head of `topK` rows, then constant-size moment
    * arithmetic. */
  def zipfSlope(docs: DataFrame, text: Column, topK: Int = 1000): DataFrame = {
    require(topK >= 2, "zipfSlope: topK must be >= 2")
    val counts = docs
      .select(explode(graft.ext.TextAnalysis.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topK)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("w"))).cast("long"))
    val pts = ranked.select(
      graft.ext.TextAnalysis.log2Bucket(col("rank")).as("x"),
      graft.ext.TextAnalysis.log2Bucket(col("c")).as("y"))
    pts.agg(count(lit(1)).as("n_points"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn("num", expr(
        "CAST(n_points AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den", expr(
        "CAST(n_points AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("slope_micro", when(col("den") === 0,
          lit(null).cast("long"))
        .otherwise(expr(
          """CAST(CASE WHEN num >= 0 THEN (num * 1000000) DIV den
            |ELSE -((-num * 1000000) DIV den) END AS BIGINT)""".stripMargin)))
      .select(col("n_points"), col("sy").as("checksum"), col("slope_micro"))
  }

  /** Leave-one-out source influence — the cheap end of the data-valuation
    * spectrum (the leave-one-out baseline Shapley methods are measured
    * against, Ghorbani & Zou 2019 framing): per source, how far the
    * corpus mean of a metric MOVES if that source were dropped,
    * influence = mean(all) − mean(all∖s) = (sum_s·N − S·n_s)/(N·(N−n_s))
    * — a CLOSED FORM over per-source sums: one aggregation pass values
    * every source simultaneously, no re-scan per source. Positive =
    * the source pulls the corpus mean UP (dropping it would hurt).
    * Exact integer micro-units (metric must be integer micro upstream);
    * a source that IS the whole corpus reads NULL (undefined). Returns
    * (source, n_docs, mean_micro, influence_micro). */
  def sourceInfluence(docs: DataFrame, source: Column,
      metricMicro: Column): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val per = docs.select(source.as("source"),
        metricMicro.cast("long").as("m"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_s"), sum(col("m")).as("s_s"))
    val tot = per.agg(sum(col("n_s")).as("N"), sum(col("s_s")).as("S"))
    per.crossJoin(broadcast(tot))
      .withColumn("num", expr(
        "CAST(s_s AS DECIMAL(38,0)) * N - CAST(S AS DECIMAL(38,0)) * n_s"))
      .withColumn("den", expr("CAST(N AS DECIMAL(38,0)) * (N - n_s)"))
      .select(col("source"), col("n_s").as("n_docs"),
        when(col("s_s") >= 0, idiv(col("s_s"), col("n_s")))
          .otherwise(-idiv(-col("s_s"), col("n_s"))).as("mean_micro"),
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CASE WHEN num >= 0 THEN num DIV den
              |ELSE -((-num) DIV den) END AS BIGINT)""".stripMargin))
          .as("influence_micro"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998, the consistent-routing primitive: each key goes to
    * the node maximizing md5(node:key), so when a node joins or leaves
    * ONLY the keys whose argmax changes move (expected 1/(n+1) of them on
    * a join — minimal disruption, no ring metadata, pure per-row
    * arithmetic). Ties break to the larger node name (the max-struct
    * order), deterministically. `nodes` is the cluster membership — a
    * literal list, so assignment is |nodes| md5s per row inside one
    * codegen'd expression: zero shuffle, scan speed, restatable by any
    * engine with md5. Returns df plus the `node` column. */
  def rendezvousAssign(df: DataFrame, key: Column,
      nodes: Seq[String]): DataFrame = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      "rendezvousAssign: nodes must be non-empty and distinct")
    val weighted = array(nodes.map(n => struct(
      conv(substring(md5(concat_ws(":", lit(n), key.cast("string"))),
        1, 15), 16, 10).cast("long").as("h"),
      lit(n).as("node"))): _*)
    df.withColumn("node",
      element_at(array_sort(weighted), nodes.size).getField("node"))
  }

  /** Balanced output-shard assignment by snake (boustrophedon) ordering:
    * rows rank globally by (weight desc, id), round g = ⌊(rank−1)/N⌋ deals
    * one row to each of the N shards, and odd rounds reverse direction —
    * the classic greedy-balance approximation (shard totals spread is
    * bounded by one round's weight span) that a training-shard writer
    * needs so no worker gets all the long documents.
    *
    * The global rank is TWO-LEVEL, never a single global window: rank
    * within each weight TIER (a per-tier window, tiers run in parallel)
    * plus the cumulative count of heavier tiers (a |tiers|-row aggregate,
    * window-summed at bounded size and broadcast back). Weight-tie skew
    * concentrates a tier's window — the [[sequencePack]] shard caveat;
    * sub-shard on `id div s` inside a tier if one weight dominates.
    * Returns (doc_id, w, rn, shard). */
  def snakeShardAssign(docs: DataFrame, id: Column, weight: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "snakeShardAssign: nShards must be >= 1")
    val base = docs.select(id.as("doc_id"), weight.as("w"))
    val wt = Window.partitionBy(col("w")).orderBy(col("doc_id"))
    val local = base.withColumn("lrn", row_number().over(wt).cast("long"))
    val wo = Window.orderBy(col("w").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wo), lit(0L)))
      .select(col("w"), col("off"))
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    local.join(broadcast(offs), Seq("w"))
      .withColumn("rn", col("off") + col("lrn"))
      .withColumn("shard", {
        val g = idiv(col("rn") - 1, lit(nShards.toLong))
        val pos = pmod(col("rn") - 1, lit(nShards.toLong))
        when(pmod(g, lit(2L)) === 0, pos).otherwise(lit(nShards - 1L) - pos)
      })
      .select(col("doc_id"), col("w"), col("rn"), col("shard"))
  }

  /** Deterministic equal-frequency binning within each stratum: rows rank
    * by `(orderBy desc, tie asc)` and bucket `i` of `nBuckets` receives
    * ranks with `⌊(rank−1)·n / count⌋ = i` — integer-exact, no percentile
    * interpolation, no RNG. The CCNet head/middle/tail split (Wenzek et
    * al., LREC 2020 — per-language perplexity tertiles) is
    * `nBuckets = 3` over an LM fluency score; the same operator is the
    * general quantile-binning stage (difficulty curricula, length tiers).
    * Adds `bucket_idx`. One stratum-keyed window shuffle; both window
    * functions share the Exchange. */
  def stratumEqualBuckets(df: DataFrame, stratum: Column, orderBy: Column,
      tie: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "stratumEqualBuckets: nBuckets must be >= 2")
    val wr = Window.partitionBy(stratum).orderBy(orderBy.desc, tie)
    val wc = Window.partitionBy(stratum)
    df.withColumn("__rn", row_number().over(wr).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .withColumn("bucket_idx", org.apache.spark.sql.graft.Bridge.idiv(
        (col("__rn") - 1) * nBuckets, col("__cnt")))
      .drop("__rn", "__cnt")
  }

  /** Tokenizer-coverage audit: per-document out-of-vocabulary rate against
    * the corpus's own top-`vocabSize` tokens (count desc, token asc
    * tie-break — fully deterministic). The signal behind "will my
    * tokenizer fragment this corpus": high OOV ppm → the vocab (or the
    * corpus slice) needs work. Returns (doc_id, n_tok, n_oov, oov_ppm),
    * integer-exact.
    *
    * 100 TB shape: the vocabulary is ONE hash aggregation + a bounded
    * TakeOrdered (vocabSize rows — a real tokenizer vocab is ≤ ~256k) that
    * broadcasts back; per-doc rates are one doc-keyed aggregation. */
  def oovRatePpm(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "oovRatePpm: vocabSize must be >= 1")
    val toks = docs.select(id.as("doc_id"),
      explode(TextAnalysis.tokens(text)).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1L).as("in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        org.apache.spark.sql.graft.Bridge.idiv(
          lit(1000000L) * col("n_oov"), col("n_tok")).as("oov_ppm"))
  }

  /** DSIR-shaped importance scoring (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): hashed
    * token features over `buckets` md5-derived buckets, each bucket's
    * target/raw frequency ratio (add-one smoothed) becomes an integer
    * ppm weight, and a document's importance is the average weight of its
    * tokens. The published method sums log-likelihood ratios; the integer
    * frequency RATIO is the determinism-safe form (logs are floats, floats
    * diverge cross-engine) and induces the same bucket-level ordering
    * signal. Returns (doc_id, n_tok, score_ppm) for every doc — callers
    * resample/top-k the raw pool by score.
    *
    * 100 TB shape: the ratio table is `buckets` rows (a knob, ≤ ~1e5) —
    * ONE hash aggregation then broadcast back; scoring is one doc-keyed
    * aggregation. Two corpus passes total (count, score) — DSIR is
    * inherently two-pass. DECIMAL(38,0) guards the 10⁶·count product. */
  def dsirScorePpm(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2, "dsirScorePpm: buckets must be >= 2")
    val toks = docs.select(id.as("doc_id"), isTarget.as("is_t"),
        explode(TextAnalysis.tokens(text)).as("w"))
      .withColumn("b", pmod(
        conv(substring(md5(col("w")), 1, 11), 16, 10).cast("long"),
        lit(buckets.toLong)))
    val ratio = toks.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("t_cnt"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("s_cnt"))
      .select(col("b"), expr(
        "CAST((CAST(t_cnt + 1 AS DECIMAL(38,0)) * 1000000) DIV (s_cnt + 1) AS BIGINT)")
        .as("r_ppm"))
    toks.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("r_ppm")).as("sum_r"))
      .select(col("doc_id"), col("n_tok"),
        org.apache.spark.sql.graft.Bridge.idiv(col("sum_r"), col("n_tok"))
          .as("score_ppm"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a
    * depth×width counter TABLE — the point-frequency-query companion to
    * the Misra-Gries heavy-hitter sketch: `est(key) = min over rows r of
    * counter[r][h_r(key)]`, never an underestimate, overestimate bounded
    * by collisions (≤ N/width per row in expectation). Row hashes are
    * md5-derived with the row index salted in, so the oracle replays them
    * bit-for-bit. The counter table is depth·width rows — mergeable by
    * cellwise ADDITION (counters of a union = sum of counters, exactly),
    * broadcastable, and independent of vocabulary size: the sketch
    * answers "how often does THIS term occur" without a vocabulary-sized
    * state anywhere.
    *
    * Shapes: build = one (r, b) aggregation over depth× exploded keys;
    * probe = a broadcast-sized join + one min-agg per probe key. */
  def cmSketch(items: DataFrame, key: Column, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2, "cmSketch: need depth >= 1, width >= 2")
    // Count per DISTINCT key first, then hash each key once per row and
    // weight the cell by its count: bit-identical cells (a cell's count is
    // Σ n_k over the keys hashing into it either way), but the md5 work —
    // the dominant cost, ~4 string digests per input row in the direct
    // spelling — drops by the key-multiplicity factor (token streams:
    // vocabulary-sized hashing instead of corpus-sized), and the key-count
    // exchange is map-side combined (guide §2.3: aggregate before you
    // shuffle). Measured on q215 (token stream) / q279 (orderkey stream).
    items.select(key.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__n"))
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("b", pmod(
        conv(substring(md5(concat(col("r").cast("string"), lit(":"), col("__k"))),
          1, 11), 16, 10).cast("long"),
        lit(width.toLong)))
      // coalesce restores count()'s non-nullable schema bit (sum() is
      // nullable; values are identical — groups are never empty)
      .groupBy(col("r"), col("b"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("cnt"))
  }

  /** Point estimates for probe keys against a built sketch: absent
    * (r, b) cells count 0, so unseen keys can estimate 0. */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val p = probes.select(key.cast("string").as("probe"))
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("b", pmod(
        conv(substring(md5(concat(col("r").cast("string"), lit(":"), col("probe"))),
          1, 11), 16, 10).cast("long"),
        lit(width.toLong)))
    p.join(sketch, Seq("r", "b"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Per-stratum KMV sketch ROWS — the mergeable form of
    * [[kmvDistinctEstimate]] for incremental rollup maintenance: each
    * stratum keeps its k smallest distinct md5-derived hashes as plain
    * rows. The merge LAW (union two sketches, re-take the k minima ≡
    * sketch of the union — exact, not approximate, because the k minima
    * of A ∪ B are a subset of A's k minima ∪ B's k minima) is what makes
    * yesterday's rollup + today's delta equal a full recompute without
    * rescanning the corpus; q214's oracle exploits exactly that identity.
    * Shapes: one distinct on (stratum, hash) longs, one stratum-keyed
    * bounded window. */
  def kmvStratumSketch(docs: DataFrame, stratum: Column, key: Column,
      k: Int): DataFrame = {
    require(k >= 2, "kmvStratumSketch: k must be >= 2")
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("stratum")).orderBy(col("h"))
    docs.select(stratum.as("stratum"), h.as("h")).distinct()
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
      .select(col("stratum"), col("h"))
  }

  /** Merge sketch row-sets (any number, via union) back to k minima per
    * stratum. */
  def kmvMergeSketches(sketches: Seq[DataFrame], k: Int): DataFrame = {
    val w = Window.partitionBy(col("stratum")).orderBy(col("h"))
    sketches.reduce(_ unionByName _).distinct()
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
      .select(col("stratum"), col("h"))
  }

  /** Distinct-count estimates from sketch rows: exact below k, the KMV
    * estimator at k. */
  def kmvSketchEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("stratum"))
      .agg(max(col("h")).as("h_k"), count(lit(1)).as("m"))
      .select(col("stratum"),
        when(col("m") < k, col("m")).otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976) DIV h_k AS BIGINT)"))
          .as("n_est"))

  /** KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct-count
    * estimate — "how big is the dedup yield" answered from k tiny values
    * BEFORE paying for the dedup: hash every key to a 60-bit integer (the
    * first 15 md5 nibbles — md5, not an engine-internal hash, so an
    * external oracle replays it bit-for-bit), keep the k smallest distinct
    * values, and estimate n̂ = (k−1)·2⁶⁰ / h_k. With fewer than k distinct
    * values the estimate IS the exact count (the sketch saw everything).
    * Returns one row: (k, h_k, n_est).
    *
    * Scale shape: a bounded top-k (TakeOrdered after a distinct on hash
    * values — the only shuffle, and it carries 8-byte longs); DECIMAL
    * guards (k−1)·2⁶⁰ past Long. Standard error ~ 1/√(k−2): k tunes
    * accuracy against the k-row collect, and sketches from shards can be
    * merged by union + re-top-k (the same mergeability as q130's). */
  def kmvDistinctEstimate(docs: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, "kmvDistinctEstimate: k must be >= 2")
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val topk = docs.select(h.as("h")).distinct().orderBy(col("h")).limit(k)
    topk.agg(max(col("h")).as("h_k"), count(lit(1)).as("m"))
      .select(
        lit(k.toLong).as("k"),
        col("h_k"),
        when(col("m") < k, col("m")).otherwise(expr(
          s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976) DIV h_k AS BIGINT)"))
          .as("n_est"))
  }

  /** Span-level benchmark decontamination (the n-gram masking shape of
    * LLM eval hygiene): every n-token window of a document that appears in
    * the benchmark gram set is struck — overlapping hits merge into
    * masked token RANGES — and the survivors reassemble in order.
    * [[flagContaminated]] is the doc-level tripwire; this is the surgical
    * form that keeps the rest of a long document. Returns one row per doc
    * that has tokens: (doc_id, n_tok, n_masked, clean_md5) — a fully
    * contaminated doc survives with n_masked = n_tok and md5("").
    *
    * 100 TB shape (round 13): grams ride as XXH64 longs against the
    * MEASURED benchmark gram set (size-aware broadcast/shuffle_hash — the
    * q140/clusterSplit rule; "benchmarks are small" stays an observation,
    * not a hard-coded hint); hit START positions collect to ONE sorted
    * per-doc array (the only contamination shuffle, one row per hit
    * instead of n masked indices into the old cross-row distinct), and
    * the strike/rebuild is an IN-ROW interval merge: ss sorted & distinct
    * (posexplode positions are unique per doc) makes the union of the hit
    * windows [s, s+n) exactly the disjoint pieces [s_i, min(s_i+n,
    * s_{i+1})), so the surviving gaps are [0, s_1), [s_i+n, s_{i+1})
    * where positive, and [s_m+n, n_tok). Lambdas run once per HIT;
    * slice/flatten/array_join copy tokens natively — never a per-token
    * interpreted lambda (the r12 spanDedup HOF lesson). No per-token
    * explode, no (doc, idx) join, no doc-keyed re-aggregation remain.
    * Precondition (r12 gram-set family rule): `id` unique per input row. */
  def maskContaminatedSpans(docs: DataFrame, id: Column, text: Column,
      benchGrams: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "maskContaminatedSpans: n must be >= 2")
    val grams = graft.ops.Checkpoints.truncate(benchGrams.select(col("h")))
    val gramBytes = grams.count() * 24L // one long + Tungsten row overhead
    val hits = docs.select(id.as("doc_id"),
        posexplode(Dedup.wordNgramHashes(text, n)).as(Seq("start", "h")))
      .join(graft.ops.JoinRegime.sizeAware(grams, gramBytes),
        Seq("h"), "left_semi")
    val starts = graft.ops.Checkpoints.truncate(
      hits.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("start"))).as("ss")))
    val szRow = starts.agg(count(lit(1)).as("r"),
      coalesce(sum(size(col("ss"))), lit(0L)).as("t")).head()
    val startBytes = szRow.getLong(0) * 24L + szRow.getLong(1) * 8L
    val ts = col("__ts")
    val ss = coalesce(col("ss"), array().cast("array<int>"))
    val m = size(ss)
    val segs = transform(sequence(lit(0), m), i => struct(
      when(i === 0, lit(0)).otherwise(element_at(ss, i) + n).as("lo"),
      when(i === m, size(ts)).otherwise(element_at(ss, i + 1)).as("hi")))
    val clean = flatten(transform(segs,
      g => slice(ts, g.getField("lo") + 1,
        greatest(g.getField("hi") - g.getField("lo"), lit(0)))))
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__ts"))
      .filter(col("__ts").isNotNull)
      .join(graft.ops.JoinRegime.sizeAware(starts, startBytes),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(ts).cast("long").as("n_tok"),
        (size(ts) - size(clean)).cast("long").as("n_masked"),
        md5(array_join(clean, " ")).as("clean_md5"))
  }

  /** Robust per-stratum outlier scoring — median/MAD z-scores (Hampel
    * identifier), the gate that survives what mean/stddev cannot: a
    * handful of megadocs drags a mean-based z past any threshold, while
    * the median and the median-absolute-deviation ignore them. Emits
    * (doc_id, strat, score, z_ppm) with z_ppm =
    * ⌊10⁶·(x − med)/max(MAD, ⅛)⌋ computed EXACTLY in integers: an
    * interpolated median of integers is a multiple of ½ (so 4·med is an
    * integral double, cast exact) and the MAD of the ×4 deviations a
    * multiple of ½ again (so 2·MAD is integral — a bare cast of an x.5
    * double TRUNCATES in Spark but ROUNDS in DuckDB; the scaling is what
    * removes that divergence, never a rounding mode). No float z
    * anywhere. Score magnitudes to ~10¹¹ stay inside Long.
    *
    * Two stratum-keyed aggregations (median, then MAD of deviations) and
    * two |strata|-sized broadcasts back; the corpus streams three times,
    * shuffles only its stratum keys. Scale caveat: exact `percentile`
    * BUFFERS each stratum's values in its aggregation — right for the
    * exact gate and the oracle; at strata past executor memory swap in
    * `percentile_approx` (fixed-size sketch, same plan shape, approximate
    * cut line) — the same exact-vs-sketch trade as q60 vs q135. */
  def robustScores(docs: DataFrame, id: Column, stratum: Column,
      score: Column): DataFrame = {
    val base = docs.select(id.as("doc_id"), stratum.as("strat"),
      score.cast("long").as("x"))
    val med = base.groupBy(col("strat"))
      .agg(expr("CAST(4 * percentile(x, 0.5) AS BIGINT)").as("med4"))
      .withColumnRenamed("strat", "strat_m")
    val withMed = base.join(broadcast(med), col("strat") <=> col("strat_m"))
      .withColumn("dev4", abs(col("x") * 4 - col("med4")))
    val mad = withMed.groupBy(col("strat"))
      .agg(expr("CAST(2 * percentile(dev4, 0.5) AS BIGINT)").as("mad8"))
      .withColumnRenamed("strat", "strat_d")
    withMed.join(broadcast(mad), col("strat") <=> col("strat_d"))
      .withColumn("z_ppm", expr(
        "(2000000 * (x * 4 - med4)) div greatest(mad8, 1)"))
      .select(col("doc_id"), col("strat"), col("x").as("score"), col("z_ppm"))
  }

  /** Mixture reweighting by MULTIPLICATIVE WEIGHTS (the DoReMi-shaped
    * update, Xie et al. 2023, with exp(η·r) replaced by its integer-exact
    * first-order surrogate 1 + η·r): starting uniform, each round
    * multiplies every source's weight by (10⁶ + ⌊η·r_s/10⁶⌋)/10⁶ and
    * renormalizes to ppm shares — sources with higher reward (excess loss,
    * diversity, quality: any per-source integer score) compound their
    * share, the rest decay. Returns (k, r, share_ppm) after `rounds`
    * updates; NULL rewards read 0 (neutral), Σshare ≤ 10⁶ with residue
    * < |sources| (floor division); rewards clamp to [−10⁶, 10⁶].
    *
    * All arithmetic stays in Long: shares ≤ 10⁶, factors ≤ 2·10⁶, so the
    * largest intermediate is 2·10¹². The corpus never appears — this runs
    * on the |sources|-sized score relation (single-partition windows by
    * construction); the caller computes rewards with whatever corpus pass
    * their objective needs. */
  def mixtureReweight(scores: DataFrame, key: Column, rewardPpm: Column,
      rounds: Int, etaPpm: Long): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "mixtureReweight: rounds in [1, 16]")
    require(etaPpm >= 0 && etaPpm <= 1000000, "mixtureReweight: etaPpm in [0, 1e6]")
    val all = Window.partitionBy(lit(1))
    // rewards clamp to [−10⁶, 10⁶] at intake: a full negative reward zeroes
    // the factor (the source decays out in one round, never goes negative),
    // and the clamp makes the Long bound unconditional for arbitrary caller
    // scores; greatest(tot, 1) keeps an all-zeroed mixture at share 0
    // instead of dividing by zero
    var df = scores.select(key.as("k"),
        greatest(lit(-1000000L), least(lit(1000000L),
          coalesce(rewardPpm.cast("long"), lit(0L)))).as("r"))
      .withColumn("w", lit(1000000L))
    for (_ <- 1 to rounds) {
      df = df
        .withColumn("wu", expr(
          s"(w * greatest(0, 1000000 + ($etaPpm * r) div 1000000)) div 1000000"))
        .withColumn("tot", sum(col("wu")).over(all))
        .withColumn("w", expr("(wu * 1000000) div greatest(tot, 1)"))
        .drop("wu", "tot")
    }
    df.select(col("k"), col("r"), col("w").as("share_ppm"))
  }

  /** Shared priority construction for the samplers: w > 0 rows with the
    * deterministic hash-uniform priority w·10⁶/(h+1) rounded to 6 — THE
    * cross-engine contract both oracles replay; change it in one place or
    * the global and stratified samplers de-synchronize. */
  private def priorityBase(docs: DataFrame, cols: Seq[Column],
      weight: Column): DataFrame =
    docs.select(cols :+ weight.cast("long").as("w"): _*)
      .filter(col("w") > 0)
      .withColumn("priority", round(
        col("w") * lit(1000000.0) / (sampleKey(col("s_id"), 1000000) + lit(1.0)), 6))

  /** Weight-proportional sample without replacement — PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM 2007): each row draws a deterministic
    * hash-uniform u_i and gets priority w_i/u_i; the sample is the top-k
    * priorities and τ = the (k+1)-th, with Horvitz–Thompson adjusted
    * weights ŵ_i = max(w_i, τ) making Σŵ over the sample an (near-)unbiased
    * estimator of Σw — "sample long documents proportionally, and still
    * sum tokens honestly". The sampling rule every token-budgeted subset
    * job wants when uniform sampling would under-represent long docs.
    *
    * Determinism: u_i = ([[sampleKey]](id)+1)/10⁶ — integer hash, no RNG;
    * the priority ORDER is evaluated on the exact rational w·10⁶/(h+1) via
    * one IEEE double division (identical on every engine) with id
    * tie-break. Zero-weight rows never enter the sample. Scale shape: a
    * bounded top-(k+1) (TakeOrdered — no global sort), everything else is
    * a per-row map; emits (id, w, priority, est_w) for the k sampled
    * rows. */
  def prioritySample(docs: DataFrame, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k >= 1, "prioritySample: k must be >= 1")
    val base = priorityBase(docs, Seq(id.as("s_id")), weight)
    val top = base.orderBy(col("priority").desc, col("s_id")).limit(k + 1)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("priority").desc, col("s_id"))))
    // τ = 0 when the corpus has ≤ k rows (everything sampled, no
    // adjustment); the one-row aggregate is deterministic where a
    // union+limit(1) would race
    val tau = top.agg(coalesce(
      max(when(col("rnk") === k + 1, col("priority"))), lit(0.0)).as("tau"))
    top.filter(col("rnk") <= k)
      .crossJoin(tau)
      .select(col("s_id").as("id"), col("w"), col("priority"),
        round(greatest(col("w").cast("double"), col("tau")), 6).as("est_w"))
  }

  /** Filter-cascade attrition report (pipeline observability): apply
    * `rules` IN ORDER, charge each dropped document to the FIRST rule it
    * fails, and emit the funnel — (rule_id, rule, n_in, n_drop, n_out)
    * with n_in = documents reaching that rule and n_out = n_in − n_drop.
    * The report that tells a curation pipeline which gate is doing the
    * work (and which is dead weight) before anyone retrains on the result.
    * A NULL predicate value FAILS its rule (a gate that cannot evaluate a
    * document must not wave it through); rule order changes the blame, not
    * the surviving set.
    *
    * ONE corpus pass: the first-fail index is a single codegen'd CASE at
    * scan speed, aggregated to ≤ rules+1 counts; the funnel arithmetic
    * runs on the |rules|-sized relation. */
  def filterAttrition(docs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterAttrition: need at least one rule")
    val first = rules.zipWithIndex.tail
      .foldLeft(when(not(coalesce(rules.head._2, lit(false))), lit(0L))) {
        case (acc, ((_, p), i)) => acc.when(not(coalesce(p, lit(false))), lit(i.toLong))
      }.otherwise(lit(rules.length.toLong))
    val counts = docs.select(first.as("fi"))
      .groupBy(col("fi")).agg(count(lit(1)).as("c"))
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)).as("total"))
    val s = docs.sparkSession
    import s.implicits._
    val ruleTable = rules.map(_._1).zipWithIndex
      .map { case (nm, i) => (i.toLong, nm) }.toDF("rule_id", "rule")
    val cum = Window.orderBy(col("rule_id"))
    ruleTable
      .join(counts, col("rule_id") === col("fi"), "left")
      .withColumn("n_drop", coalesce(col("c"), lit(0L)))
      .crossJoin(total)
      .withColumn("n_in", col("total") - coalesce(
        sum(col("n_drop")).over(cum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_out", col("n_in") - col("n_drop"))
      .select(col("rule_id"), col("rule"), col("n_in"), col("n_drop"), col("n_out"))
  }

  /** [[waterFillAlloc]] composed with per-stratum selection: compute the
    * water-filled per-stratum token allocations, then keep each stratum's
    * `priority`-desc document prefix whose running token total fits ITS
    * allocation ([[tokenBudgetSample]]'s contiguous-prefix semantics, but
    * with the budget decided by the corpus-wide level instead of a constant)
    * — "flatten the mixture to the budget, then take the best of each
    * source". The allocation table is |strata|-sized and broadcasts back
    * (null-safe join: a NULL stratum keeps its own allocation); the
    * corpus-sized work is one agg + one stratum-keyed window. */
  def waterFillSample(docs: DataFrame, id: Column, text: Column,
      stratum: Column, priority: Column, budgetPpm: Long): DataFrame = {
    val base = docs.withColumn("__str", stratum).withColumn("__pri", priority)
      .withColumn("__bid", id)
      .withColumn("__tok", TextAnalysis.tokenCount(text))
    val alloc = waterFillAlloc(base, col("__str"), col("__tok"), budgetPpm)
      .select(col("k").as("__str2"), col("alloc").as("__alloc"))
    val w = Window.partitionBy(col("__str")).orderBy(col("__pri").desc, col("__bid"))
    base.join(broadcast(alloc), col("__str") <=> col("__str2"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= col("__alloc"))
      .drop("__str", "__str2", "__pri", "__bid", "__tok", "__alloc", "__cum")
  }

  /** BM25 lexical retrieval (Robertson & Spärck Jones; the Okapi weighting
    * every search/retrieval-augmented pipeline starts from): top-k
    * documents per query, scored Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b +
    * b·dl/avgdl)), exact-integer throughout. idf is the integer-rational
    * surrogate (1e6·(N−df+1)) // (df+1) — the q61 TF-IDF discipline:
    * monotone in df like the log form, but cross-engine EXACT (both
    * engines floor the same integer division; ln() would hand the rank
    * order to last-ulp libm differences). The saturation term clears its
    * denominators: with k1 = k1Milli/1000, b = bMilli/1000, avgdl = T/N,
    *   sat_ppm = (1e9·tf·(k1Milli+1000)·T) //
    *             (tf·1e6·T + k1Milli·(1000−bMilli)·T + k1Milli·bMilli·dl·N)
    * — one integer division per (doc, term), DECIMAL(38,0)-guarded (tf·T
    * alone reaches 10¹⁷ on a 10¹²-token corpus; ×10⁹ is past Long by
    * construction, not by accident). score_ppm = Σ_t (idf_ppm · sat_ppm)
    * // 1e6.
    *
    * 100 TB shape: the query set is tiny and its term list BROADCASTS;
    * the corpus-sized work is one tokenize pass producing per-doc term
    * counts (one doc-keyed aggregation) of which only postings matching a
    * query term survive the broadcast semi join — df counts and scoring
    * run on that postings slice, never the full vocabulary. dl and the
    * (N, T) scalars come from one corpus-level aggregate. Top-k cuts with
    * a per-query window over candidate docs (candidates per query ≤
    * postings of its terms). Ties break (score DESC, doc_id). */
  /** Per-query DISTINCT term rows (q_id, t) for [[bm25TopK]]-family
    * rankers — the within-row `array_distinct` spelling (no Exchange; the
    * r12 gram-set rule). Precondition: `qId` is unique per input row. */
  def bm25QueryTerms(queries: DataFrame, qId: Column, qText: Column): DataFrame =
    queries.select(qId.as("q_id"),
      explode(array_distinct(TextAnalysis.tokens(qText))).as("t"))

  /** Query-term postings slice shared by [[bm25TopK]] and the TF rankers
    * built beside it (q235/q238/q256): one row per (doc, matching term)
    * carrying the doc length `dl` and the term frequency `tf`.
    *
    * Round-13 shape (guide §2.3/§3.2 — reduce before the shuffle): the
    * corpus (doc, token) stream is filtered by the BROADCAST query-term
    * set BEFORE the tf aggregation, so the one corpus-sized exchange of
    * the old shape — partial tf counts for EVERY token — now carries only
    * the matching tokens; `dl` rides in-row as size(tokens(text)), which
    * equals Σ_t tf(doc, t) by construction (split() yields ≥ 1 token for
    * any non-null text, so the per-doc re-aggregation and its join are
    * gone too). Precondition (the r12 gram-set family rule): `id` is
    * unique per input row — duplicate ids would emit per-row dl/tf rows
    * instead of merging them. */
  def bm25Postings(docs: DataFrame, id: Column, text: Column,
      qTerms: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__ts"))
      .select(col("doc_id"), size(col("__ts")).cast("long").as("dl"),
        explode(col("__ts")).as("t"))
      .join(broadcast(qTerms), Seq("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))

  def bm25TopK(docs: DataFrame, id: Column, text: Column,
      queries: DataFrame, qId: Column, qText: Column, k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    // corpus totals from one scan-level aggregate — n_docs counts docs
    // with non-null text (identical to the old dl-frame count: explode
    // dropped only null token arrays), tt sums the in-row token counts
    val totals = docs
      .select(size(TextAnalysis.tokens(text)).cast("long").as("dl"))
      .agg(count(col("dl")).as("n_docs"), sum(col("dl")).as("tt"))
    val qt = bm25QueryTerms(queries, qId, qText)
    val qTerms = qt.select(col("t")).distinct()
    val postings = bm25Postings(docs, id, text, qTerms)
    val dfT = postings.groupBy(col("t"))
      .agg(count(lit(1)).as("df_t"))
    val scored = postings
      .join(broadcast(dfT), Seq("t"))
      .crossJoin(broadcast(totals))
      .withColumn("idf_ppm", org.apache.spark.sql.graft.Bridge.idiv(
        (col("n_docs") - col("df_t") + 1L) * 1000000L, col("df_t") + 1L))
      .withColumn("sat_ppm", expr(
        s"CAST((CAST(tf AS DECIMAL(38,0)) * 1000000000 * ${k1Milli + 1000} * tt) DIV " +
          s"(CAST(tf AS DECIMAL(38,0)) * 1000000 * tt " +
          s" + CAST(${k1Milli * (1000 - bMilli)} AS DECIMAL(38,0)) * tt " +
          s" + CAST(${k1Milli * bMilli} AS DECIMAL(38,0)) * dl * n_docs) AS BIGINT)"))
      .join(broadcast(qt), Seq("t"))
      .groupBy(col("q_id"), col("doc_id"))
      // DECIMAL(38,0) on the idf·sat product: idf_ppm reaches N·10⁶ and
      // sat_ppm (k1+1)·10⁶ — the product passes Long at ~10⁷ docs
      .agg(sum(expr("CAST((CAST(idf_ppm AS DECIMAL(38,0)) * sat_ppm) " +
        "DIV 1000000 AS BIGINT)")).as("score_ppm"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("n_terms"), col("score_ppm"),
        col("rnk"))
  }

  /** Exact-integer nDCG discount table: d(r) = ⌊10⁹ / log₂(r+1)⌋ for ranks
    * 1..k. The doubles are evaluated ONCE here (plan time, driver JVM) and
    * the resulting Long constants are what both engines consume — the
    * oracle SQL interpolates this very sequence into a VALUES table, so the
    * logarithm never runs inside either engine and last-ulp libm drift
    * can't touch the metric (the q61/q227 integer-idf discipline applied to
    * the Järvelin & Kekäläinen discount). */
  def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(r => (1e9 * math.log(2.0) / math.log(r + 1.0)).toLong)

  /** Ranking-quality audit: nDCG@k (Järvelin & Kekäläinen 2002) of a ranked
    * result list against graded relevance labels — the measure-before-trust
    * number for any retrieval stack (BM25, ANN, fused). Input is one row
    * per (query, retrieved doc) carrying the system's rank and the doc's
    * graded relevance; the ideal ordering is the retrieved set re-sorted by
    * (relevance DESC, system rank) — nDCG@k over the judged pool, the
    * standard offline form when unjudged docs carry no labels.
    * dcg_n = Σ rel·d(rank) in 10⁻⁹ units ([[ndcgDiscounts]]);
    * ndcg_ppm = 10⁶·dcg // idcg (NULL when idcg = 0: an all-zero-relevance
    * list has no defined normalization, and 0 would fake a worst-case).
    *
    * 100 TB shape: the input is already top-k-per-query (query-count ×
    * k rows); one window for the ideal ranks and one query-keyed
    * aggregation — never corpus-sized. */
  def ndcgAtK(ranked: DataFrame, qId: Column, rank: Column, rel: Column,
      k: Int): DataFrame = {
    val disc = ndcgDiscounts(k)
    def discOf(r: Column): Column =
      element_at(array(disc.map(lit): _*), r.cast("int"))
    val base = ranked.select(qId.as("q_id"), rank.cast("long").as("rnk"),
        rel.cast("long").as("rel"))
      .filter(col("rnk") <= k)
    val wI = Window.partitionBy(col("q_id"))
      .orderBy(col("rel").desc, col("rnk"))
    base.withColumn("irnk", row_number().over(wI).cast("long"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(col("rel") * discOf(col("rnk"))).as("dcg_n"),
        sum(col("rel") * discOf(col("irnk"))).as("idcg_n"))
      .withColumn("ndcg_ppm",
        when(col("idcg_n") === 0, lit(null).cast("long"))
          .otherwise(org.apache.spark.sql.graft.Bridge.idiv(
            col("dcg_n") * 1000000L, col("idcg_n"))))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N ranked
    * lists: score(d) = Σ_lists ⌊10⁶ / (kRrf + rank)⌋, the standard hybrid-
    * retrieval combiner (lexical BM25 + vector ANN, or any ranker mix) —
    * exact-integer, so the fused order is cross-engine reproducible. Docs
    * missing from a list simply contribute nothing (the RRF convention);
    * ties break (rrf_ppm DESC, doc_id). Each input carries
    * (q_id, doc_id, rnk).
    *
    * 100 TB shape: inputs are top-k-per-query lists (never corpus-sized);
    * the union groups on (q_id, doc_id) — ≤ N·k rows per query — and one
    * per-query window cuts the fused top-k. */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int,
      kRrf: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    val u = rankings
      .map(_.select(col("q_id"), col("doc_id"), col("rnk").cast("long")
        .as("rnk")))
      .reduce(_ unionAll _)
    val fused = u.groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_rankers"),
        sum(org.apache.spark.sql.graft.Bridge.idiv(
          lit(1000000L), lit(kRrf) + col("rnk"))).as("rrf_ppm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }

  /** Weighted sampling without replacement, k per stratum — the
    * Efraimidis–Spirakis (2006) one-pass bottom-k shape with a
    * deterministic integer surrogate for the random key: u comes from the
    * seeded md5 fold (uniform over [0, 16¹⁵), reproducible in any engine)
    * and the selection key is ⌊u / w⌋ instead of u^(1/w) — monotone the
    * same way (heavier rows draw stochastically smaller keys, w·E[rows
    * selected] proportionality approximately preserved) but engine-exact,
    * which u^(1/w)'s float pow is not. Zero/negative weights are excluded
    * (they'd win every sample or divide by zero — callers gate upstream).
    * Different seeds give independent samples, so per-epoch redraws are a
    * seed change (the [[shuffleKey]] discipline).
    *
    * 100 TB shape: the key is a per-row map at scan speed; selection is one
    * bounded per-stratum window (bottom-k heap per partition, k rows out) —
    * the exact shape of [[kmvStratumSketch]]. */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int, seed: String): DataFrame = {
    val hv = conv(substring(
      md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val base = df.select(stratum.as("stratum"), id.as("id"),
        weight.cast("long").as("w"), hv.as("hv"))
      .filter(col("w") > 0)
      .withColumn("priority",
        org.apache.spark.sql.graft.Bridge.idiv(col("hv"), col("w")))
    val win = Window.partitionBy(col("stratum"))
      .orderBy(col("priority"), col("id"))
    base.withColumn("rnk", row_number().over(win).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("stratum"), col("id"), col("w"), col("priority"),
        col("rnk"))
  }

  /** Distinct-n diversity profile (the distinct-1/2/3 metric of Li et al.
    * 2016, the standard generated-corpus diversity check): per stratum and
    * n-gram width, total grams vs distinct grams and their ratio. A
    * synthetic or mode-collapsed source shows up as a distinct_ppm cliff
    * at n=2/3 long before eyeballing does. Complements [[q199's]] gini
    * (WITHIN-doc concentration) and q223's novelty (cross-doc df=1 rate):
    * this one is the within-SOURCE type/token profile.
    *
    * 100 TB shape: one explode + aggregation per n (each a two-phase
    * count-distinct on (stratum, gram) with map-side combine); grams ride
    * as strings because the count must be exact and engine-portable
    * (xxhash64 isn't) — the [[q45]] hashed-gram shortcut trades exactness,
    * which a diversity AUDIT can't. */
  def ngramDiversityProfile(docs: DataFrame, stratum: Column, text: Column,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 5, "ngramDiversityProfile: maxN in [1, 5]")
    val perN = (1 to maxN).map { n =>
      docs.select(stratum.as("stratum"),
          explode(graft.functions.TextExpressions.wordNgrams(text, n))
            .as("g"))
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_grams"),
          countDistinct(col("g")).as("n_distinct"))
        .withColumn("n", lit(n.toLong))
    }
    perN.reduce(_ unionByName _)
      .withColumn("distinct_ppm", org.apache.spark.sql.graft.Bridge.idiv(
        col("n_distinct") * 1000000L, col("n_grams")))
      .select(col("stratum"), col("n"), col("n_grams"), col("n_distinct"),
        col("distinct_ppm"))
  }

  /** Vocabulary-concentration audit: the Zipf-head/tail numbers a corpus
    * report leads with — type/token ratio, hapax (frequency-1) fraction of
    * the vocabulary, and the token mass covered by the top-k types. A
    * boilerplate-heavy corpus shows abnormal head coverage; an
    * OCR/mojibake-damaged one shows a hapax explosion. Empty tokens are
    * excluded. Ties in the top-k cut break (count DESC, token ASC) — the
    * [[oovRatePpm]] vocabulary rule.
    *
    * 100 TB shape: one vocabulary aggregation; the head is a bounded
    * TakeOrdered (orderBy+limit never global-sorts), and the three totals
    * are one pass over the vocabulary relation. */
  def vocabularyConcentration(docs: DataFrame, text: Column,
      topK: Int = 100): DataFrame = {
    require(topK >= 1, "vocabularyConcentration: topK must be >= 1")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val vocab = docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax_types"))
    val head = vocab.orderBy(col("c").desc, col("w")).limit(topK)
      .agg(coalesce(sum(col("c")), lit(0L)).as("head_mass"))
    totals.crossJoin(head)
      .select(col("n_tokens"), col("n_types"), col("hapax_types"),
        idiv(col("hapax_types") * 1000000L, col("n_types")).as("hapax_ppm"),
        idiv(col("n_types") * 1000000L, col("n_tokens"))
          .as("type_token_ppm"),
        idiv(col("head_mass") * 1000000L, col("n_tokens"))
          .as(s"top${topK}_coverage_ppm"))
  }

  /** Poisson-bootstrap uncertainty for a corpus mean (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams" — the bootstrap
    * that works in one distributed pass): each of B replicates reweights
    * every row by a Poisson(1) draw, here a DETERMINISTIC surrogate — the
    * seeded md5 fold mod 10⁶ cut against the quantized Poisson CDF
    * thresholds (367879, 735759, 919699, 981012, 996340, 999406 ppm for
    * w = 0..5, else 6; the e⁻¹ series constants, identical literals in
    * both engines) — so the replicate set is reproducible and
    * cross-engine exact. Returns per replicate (b, n_eff, sum, mean_ppm);
    * the caller reads the spread (e.g. replicate-mean quantiles) as the
    * CI. The metric must already be integer (the corpus discipline).
    *
    * 100 TB shape: ONE scan with a B-fold explode feeding a B-keyed
    * aggregation (map-side combine reduces each partition to B partial
    * rows); B is bounded (≤ 64) by contract — the B× pre-combine row
    * expansion is the entire cost. */
  /** Quantized Poisson(1) CDF thresholds in ppm for w = 0..5 (else 6) —
    * the e⁻¹ series constants both engines consume as identical literals
    * (shared by [[poissonBootstrap]] and [[approxGroupMeans]]). */
  private[ext] val poissonCdfPpm =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L)

  def poissonBootstrap(df: DataFrame, id: Column, metric: Column,
      b: Int = 32, seed: String = "pb"): DataFrame = {
    require(b >= 2 && b <= 64, "poissonBootstrap: b in [2, 64]")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val cdf = poissonCdfPpm
    val base = df.select(id.as("id"), metric.cast("long").as("m"))
      .select(col("id"), col("m"),
        explode(sequence(lit(1), lit(b))).as("b"))
    val h = pmod(conv(substring(md5(concat_ws(":", lit(seed),
      col("b").cast("string"), col("id").cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(1000000L))
    val w = cdf.zipWithIndex.foldRight(lit(6L): Column) {
      case ((t, i), rest) => when(h < t, lit(i.toLong)).otherwise(rest)
    }
    base.withColumn("w", w)
      .groupBy(col("b").cast("long").as("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("m")).as("sum_m"))
      .withColumn("mean_ppm", when(col("n_eff") === 0,
          lit(null).cast("long"))
        .otherwise(when(col("sum_m") >= 0,
          idiv(col("sum_m") * 1000000L, col("n_eff")))
          .otherwise(-idiv(-col("sum_m") * 1000000L, col("n_eff")))))
  }

  /** Approximate GROUP BY with honest error bars — the AQP / online-
    * aggregation shape (BlinkDB, Agarwal et al. 2013): answer a per-group
    * mean from a deterministic `ratePermille` sample (md5 gate on the row
    * key — reproducible, pushes to the scan as a filter) and attach a
    * per-group Poisson-bootstrap replicate ENVELOPE (min/max of `b`
    * replicate means over the sample — the [[poissonBootstrap]] one-pass
    * construction at group granularity). The audit form also carries the
    * exact truth and an `inside` flag, because an error bar should be
    * measured before it is trusted. Metric must be integer (milli-
    * quantize upstream); all arithmetic exact. Returns per group:
    * (g, n_rows, n_sampled, true_mean_milli, est_mean_milli,
    * ci_lo_milli, ci_hi_milli, inside).
    *
    * 100 TB shape: the sample gate is a scan-level filter (1/rate of the
    * data reaches anything downstream); replicates explode the SAMPLE
    * b-fold into a (g, b)-keyed aggregation with map-side combine; truth
    * is one group-keyed pass (drop it in production — it is the audit's
    * point, not the estimator's cost). */
  def approxGroupMeans(df: DataFrame, group: Column, key: Column,
      metricMilli: Column, ratePermille: Int, b: Int = 16,
      seed: String = "aq"): DataFrame = {
    require(ratePermille >= 1 && ratePermille <= 1000,
      "approxGroupMeans: ratePermille in [1, 1000]")
    require(b >= 2 && b <= 64, "approxGroupMeans: b in [2, 64]")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    def mdMod(parts: Column*): Column = pmod(conv(substring(
      md5(concat_ws(":", parts: _*)), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val base = df.select(group.as("g"), key.cast("string").as("k"),
      metricMilli.cast("long").as("m"))
    val sample = base
      .filter(mdMod(lit(seed), col("k")) < ratePermille * 1000L)
    val est = sample.groupBy(col("g"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("m")).as("s_m"))
      .withColumn("est_mean_milli", when(col("s_m") >= 0,
          idiv(col("s_m"), col("n_sampled")))
        .otherwise(-idiv(-col("s_m"), col("n_sampled"))))
    val reps = sample
      .withColumn("b", explode(sequence(lit(1), lit(b))))
      .withColumn("h", mdMod(lit(seed + "b"), col("b").cast("string"),
        col("k")))
      .withColumn("w", poissonCdfPpm.zipWithIndex.foldRight(
        lit(6L): Column) { case ((t, i), rest) =>
          when(col("h") < t, lit(i.toLong)).otherwise(rest) })
      .groupBy(col("g"), col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("m")).as("wm"))
      .filter(col("n_eff") > 0)
      .withColumn("mean_b", when(col("wm") >= 0,
          idiv(col("wm"), col("n_eff")))
        .otherwise(-idiv(-col("wm"), col("n_eff"))))
      .groupBy(col("g"))
      .agg(min(col("mean_b")).as("ci_lo_milli"),
        max(col("mean_b")).as("ci_hi_milli"))
    val truth = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("m")).as("t_m"))
      .withColumn("true_mean_milli", when(col("t_m") >= 0,
          idiv(col("t_m"), col("n_rows")))
        .otherwise(-idiv(-col("t_m"), col("n_rows"))))
    truth.join(est, Seq("g"), "left").join(reps, Seq("g"), "left")
      .select(col("g"), col("n_rows"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        col("true_mean_milli"), col("est_mean_milli"),
        col("ci_lo_milli"), col("ci_hi_milli"),
        (col("true_mean_milli") >= col("ci_lo_milli") &&
          col("true_mean_milli") <= col("ci_hi_milli")).cast("long")
          .as("inside"))
  }

  /** Join-size estimation from two CM sketches — the AGMS/CM inner-
    * product identity (Alon, Gibbons, Matias & Szegedy 1999; Cormode &
    * Muthukrishnan 2005): |A ⋈ B| on a key equals Σ_v fA(v)·fB(v), and
    * each sketch row's Σ_b cntA[r,b]·cntB[r,b] only OVERcounts it (hash
    * collisions add non-negative cross terms), so the minimum over rows
    * estimates from above. The optimizer-shaped audit: size a join from
    * two depth×width relations BEFORE paying its shuffle; the audit form
    * carries the exact truth and err_ppm, measure-before-trust. Returns
    * one row: (est_join_rows, true_join_rows, err_ppm).
    *
    * 100 TB shape: each sketch is one (r,b)-keyed count of its side
    * (map-side combined); the estimate joins two ≤ depth·width tables;
    * truth is one key-keyed count join — drop it in production, it IS
    * the join being avoided. */
  def cmJoinSizeEstimate(a: DataFrame, aKey: Column,
      bSide: DataFrame, bKey: Column,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val sa = cmSketch(a, aKey, depth, width).toDF("r", "b", "ca")
    val sb = cmSketch(bSide, bKey, depth, width).toDF("r", "b", "cb")
    val est = sa.join(sb, Seq("r", "b"))
      .groupBy(col("r"))
      .agg(sum(expr("CAST(ca AS DECIMAL(38,0)) * cb")).as("ip"))
      .agg(min(col("ip")).cast("long").as("est_join_rows"))
    val ca = a.select(aKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("na"))
    val cb = bSide.select(bKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("nb"))
    val truth = ca.join(cb, Seq("k"))
      .agg(coalesce(sum(expr("CAST(na AS DECIMAL(38,0)) * nb")), lit(0))
        .cast("long").as("true_join_rows"))
    est.crossJoin(broadcast(truth))
      .withColumn("err_ppm", idiv(
        abs(col("est_join_rows") - col("true_join_rows")) * 1000000L,
        greatest(col("true_join_rows"), lit(1L))))
  }

  /** Context-window utilization audit of [[sequencePack]]: per stratum,
    * how full the packs actually are — n_packs, packed tokens vs n_packs ×
    * capTokens capacity (utilization_ppm), and the packs a single
    * over-long document busts past the cap (util can exceed 10⁶ when
    * overflow packs exist: the doc still ships, truncation is the
    * trainer's call, but the audit must SHOW it). The feedback number that
    * decides whether capTokens / shardSize fit the corpus's length
    * distribution before a 100 TB shard-write pays for the wrong choice.
    *
    * 100 TB shape: = [[sequencePack]] (sharded window cumsum) + two
    * bounded aggregations (packs, then strata). */
  def packUtilization(docs: DataFrame, id: Column, text: Column,
      stratum: Column, capTokens: Int, shardSize: Int = 1000): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val packs = sequencePack(docs, id, text, stratum, capTokens, shardSize)
      .groupBy(col("stratum"), col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tok"))
    packs.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_packs"), sum(col("n_docs")).as("n_docs"),
        sum(col("pack_tok")).as("sum_tok"),
        sum(when(col("pack_tok") > capTokens, 1L).otherwise(0L))
          .as("n_over_packs"))
      .withColumn("util_ppm", idiv(col("sum_tok") * 1000000L,
        col("n_packs") * capTokens.toLong))
  }

  /** Mixture-feasibility planner: given per-source available token counts
    * and target mixture proportions (ppm), the largest total corpus T*
    * servable WITHOUT upsampling is min_s ⌊avail_s·10⁶ / target_s⌋ (the
    * binding source runs dry first); every source then contributes
    * alloc_s = ⌊T*·target_s / 10⁶⌋ and the rest is headroom. This is the
    * planning step BEFORE [[temperatureMixture]]/[[tokenBudgetPerSource]]:
    * it says whether the recipe is achievable at all and which source to
    * go collect more of. Sources with target 0 pass through with zero
    * allocation; Σ targets ≤ 10⁶ is the caller's contract.
    *
    * 100 TB shape: the corpus reduces to one source-keyed aggregation
    * upstream; this operator runs on the |sources|-sized relation with a
    * one-row broadcast min. */
  def mixtureFeasibility(tokens: DataFrame, targets: DataFrame): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    // j is consumed twice (the binding-source min + the final projection)
    // and `tokens` is typically a lazy corpus-sized aggregation — truncate
    // the |sources|-sized joined relation so the corpus reduces once
    val j = targets.select(col("source"),
        col("target_ppm").cast("long").as("target_ppm"))
      .join(tokens.select(col("source"),
        col("avail_tok").cast("long").as("avail_tok")), Seq("source"), "left")
      .withColumn("avail_tok", coalesce(col("avail_tok"), lit(0L)))
      .transform(graft.ops.Checkpoints.truncate(_))
    val cap = j.filter(col("target_ppm") > 0)
      .select(idiv(col("avail_tok") * 1000000L, col("target_ppm")).as("c"))
      .agg(min(col("c")).as("t_star"))
    j.crossJoin(broadcast(cap))
      .withColumn("alloc_tok", when(col("target_ppm") === 0, lit(0L))
        .otherwise(idiv(col("t_star") * col("target_ppm"), lit(1000000L))))
      .withColumn("headroom_tok", col("avail_tok") - col("alloc_tok"))
      .withColumn("binding", (col("target_ppm") > 0 &&
        idiv(col("avail_tok") * 1000000L, col("target_ppm"))
          === col("t_star")).cast("long"))
      .select(col("source"), col("avail_tok"), col("target_ppm"),
        col("t_star"), col("alloc_tok"), col("headroom_tok"), col("binding"))
  }

  /** Length-bias audit for preference data (the RLHF hygiene check made
    * standard by length-controlled AlpacaEval, Dubois et al. 2024): in
    * what fraction of preference pairs is the CHOSEN side simply the
    * LONGER one? A reward model trained on pairs with high length bias
    * learns verbosity, not quality. `pairs` carries (strat, chosen_id,
    * rejected_id) ([[preferencePairs]] output); `lengths` maps doc_id to
    * an integer length. bias_ppm is computed over non-tie pairs and NULL
    * when every pair ties (no signal, not 0). ~500000 ppm = unbiased.
    *
    * 100 TB shape: two id-keyed joins of the pair list (pairs ≤ half the
    * corpus) onto the length relation, one stratum aggregation. */
  def lengthBiasAudit(pairs: DataFrame, lengths: DataFrame): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val l = lengths.select(col("doc_id"), col("len").cast("long").as("len"))
    pairs.select(col("strat"), col("chosen_id"), col("rejected_id"))
      .join(l.toDF("chosen_id", "c_len"), Seq("chosen_id"))
      .join(l.toDF("rejected_id", "r_len"), Seq("rejected_id"))
      .groupBy(col("strat"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("c_len") > col("r_len")).cast("long"))
          .as("n_chosen_longer"),
        sum((col("c_len") === col("r_len")).cast("long")).as("n_ties"))
      .withColumn("length_bias_ppm",
        when(col("n_pairs") === col("n_ties"), lit(null).cast("long"))
          .otherwise(idiv(col("n_chosen_longer") * 1000000L,
            col("n_pairs") - col("n_ties"))))
  }

  /** Trending-term movers between two corpus snapshots — the "what changed
    * in today's crawl" report that term-LEVEL drift monitoring needs where
    * q160's TVD gives one distance number: smoothed frequency lift
    * lift_ppm = 10⁶·(c_new+1)/(c_old+1) (add-one keeps newcomers finite
    * and engine-exact), support-gated (rare-term lift is noise — the q225
    * rule), global top-k risers by (lift DESC, term). Returns
    * (term, c_old, c_new, lift_ppm, rnk).
    *
    * 100 TB shape: two vocabulary aggregations meet in one term-keyed
    * full-outer join; the top-k cut is a bounded TakeOrdered (orderBy +
    * limit never global-sorts). */
  def termMovers(oldDocs: DataFrame, newDocs: DataFrame, text: Column,
      k: Int, minSupport: Long = 5L): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(TextAnalysis.tokens(text)).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term")).agg(count(lit(1)).as(name))
    counts(oldDocs, "c_old")
      .join(counts(newDocs, "c_new"), Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
      .filter(col("c_new") >= minSupport)
      .withColumn("lift_ppm",
        idiv((col("c_new") + 1L) * 1000000L, col("c_old") + 1L))
      .orderBy(col("lift_ppm").desc, col("term")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lift_ppm").desc, col("term"))).cast("long"))
  }

  /** [[rboAtK]]'s geometric weight table ⌊(1−p)·p^(d−1)·10⁹⌋ for d = 1..k,
    * evaluated ONCE at plan time and interpolated into both engines'
    * plans (the [[ndcgDiscounts]] discipline). */
  def rboWeights(k: Int, pMilli: Long): Seq[Long] = {
    val p = pMilli.toDouble / 1000.0
    (1 to k).map(d => ((1 - p) * math.pow(p, d - 1) * 1e9).toLong)
  }

  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel 2010) — the
    * ranker-agreement measure built for TRUNCATED, top-weighted lists:
    * RBO = Σ_d w_d·|A_d ∩ B_d|/d with geometric weights w_d ∝ p^(d−1),
    * normalized here by Σ_d w_d so identical prefixes score exactly 10⁶.
    * Where [[kendallTau]] only sees the common-doc slice (disjoint top
    * lists are silently "no data"), RBO scores disjointness as genuine
    * disagreement — the right lens when two rankers barely overlap. The
    * geometric weights are plan-time constants (the [[ndcgDiscounts]]
    * discipline: the pow never runs inside an engine); per-term floor
    * division (w_d·ov_d)//d is over nonnegative integers, so both engines
    * agree term by term. Inputs carry (q_id, doc_id, rnk); queries absent
    * from the intersection entirely report rbo_ppm = 0 with n_common = 0.
    *
    * 100 TB shape: the pair join is top-k-list-sized; depths explode k
    * rows per common doc (k ≤ 100 bounded); two bounded aggregations. */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int,
      pMilli: Long = 900L): DataFrame = {
    require(k >= 1 && k <= 100, "rboAtK: k in [1, 100]")
    require(pMilli >= 1 && pMilli <= 999, "rboAtK: pMilli in [1, 999]")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val w: Seq[Long] = rboWeights(k, pMilli)
    val den = w.sum
    // each input is consumed twice (the pair join + the query-universe
    // union); the duplicated plan branches are canonically identical, so
    // runtime ReuseExchange executes each ranker pipeline once — eager
    // truncation here measured SLOWER at sf0.1 (two extra jobs bought
    // nothing; contrast kendallTau, whose ALIASED self-join sides do
    // benefit). Leave lazy; see OPTIMIZATION_r12.md.
    val as = a.select(col("q_id"), col("doc_id"),
        col("rnk").cast("long").as("ra"))
    val bs = b.select(col("q_id"), col("doc_id"),
        col("rnk").cast("long").as("rb"))
    val joint = as.join(bs, Seq("q_id", "doc_id"))
      .filter(col("ra") <= k && col("rb") <= k)
      .select(col("q_id"), greatest(col("ra"), col("rb")).as("m"))
    val terms = joint
      .select(col("q_id"), explode(sequence(col("m").cast("int"),
        lit(k))).as("d"))
      .groupBy(col("q_id"), col("d")).agg(count(lit(1)).as("ov"))
      .withColumn("wd", element_at(array(w.map(lit): _*), col("d")))
      .groupBy(col("q_id"))
      .agg(sum(idiv(col("wd") * col("ov"), col("d").cast("long")))
        .as("num"), max(col("ov")).as("n_common"))
    val qs = as.select(col("q_id")).unionAll(bs.select(col("q_id"))).distinct()
    qs.join(terms, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_common"), lit(0L)).as("n_common"),
        idiv(coalesce(col("num"), lit(0L)) * 1000000L, lit(den))
          .as("rbo_ppm"))
  }

  /** Ranker-agreement audit: Kendall's τ (tau-a) between two ranked lists
    * per query, over the documents BOTH rankers retrieved (the standard
    * truncated-list convention — a doc one ranker never saw has no pair
    * order to compare). τ = (concordant − discordant) / pairs, reported in
    * ppm with the sign split out of the division (Spark's DIV truncates
    * toward zero, DuckDB's // floors — the q230 kappa rule), NULL when
    * fewer than two common docs. The q234/q235 companion: nDCG says how
    * good each ranker is, τ says whether they disagree enough for fusion
    * to buy anything (τ → 1 means RRF adds nothing).
    *
    * 100 TB shape: inputs are top-k-per-query lists; the pair join is the
    * k²-bounded self-join of the common slice WITHIN a query key — never
    * corpus-sized, never cross-query. */
  def kendallTau(a: DataFrame, b: DataFrame): DataFrame = {
    // The common slice j is consumed three times (both self-join sides +
    // the n_common rollup) and the plan TEXT replicates the upstream ranker
    // pipelines per consumer — but runtime ReuseExchange collapses the
    // identical branches, and an eager truncate here read 2.8× WORSE on the
    // bench's canary-normalized q238 while paired isolated runs said the
    // opposite; with contradictory measurements the committed-receipt shape
    // wins. Leave lazy (the rboAtK decision); see OPTIMIZATION_r12.md.
    val j = a.select(col("q_id"), col("doc_id"),
        col("rnk").cast("long").as("ra"))
      .join(b.select(col("q_id"), col("doc_id"),
        col("rnk").cast("long").as("rb")), Seq("q_id", "doc_id"))
    val p = j.as("x").join(j.as("y"),
      col("x.q_id") === col("y.q_id") && col("x.doc_id") < col("y.doc_id"))
    val sgn = (col("x.ra") - col("y.ra")) * (col("x.rb") - col("y.rb"))
    val per = p.groupBy(col("x.q_id").as("q_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((sgn > 0).cast("long")).as("n_conc"),
        sum((sgn < 0).cast("long")).as("n_disc"))
    val nCommon = j.groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    val d = col("n_conc") - col("n_disc")
    nCommon.join(per, Seq("q_id"), "left")
      .select(col("q_id"), col("n_common"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_conc"), lit(0L)).as("n_conc"),
        coalesce(col("n_disc"), lit(0L)).as("n_disc"))
      .withColumn("tau_ppm", when(col("n_pairs") === 0,
          lit(null).cast("long"))
        .otherwise(when(d >= 0,
          org.apache.spark.sql.graft.Bridge.idiv(d * 1000000L,
            col("n_pairs")))
          .otherwise(-org.apache.spark.sql.graft.Bridge.idiv(
            -d * 1000000L, col("n_pairs")))))
  }

  /** Bradley–Terry strength fitting (Bradley & Terry 1952; Zermelo's MM
    * iteration as given in Hunter 2004, "MM algorithms for generalized
    * Bradley-Terry models") over pairwise preference outcomes — the
    * reward-model / arena-ranking primitive that turns preference PAIRS
    * (q222's output shape) into per-player STRENGTHS. Exact-integer
    * iteration in ppm: each round
    *   d_i  = Σ_j (c_ij · 1e9) // (w_i + w_j)      (c_ij = games vs j)
    *   w_i' = (W_i · 1e9) // d_i                   (W_i = wins of i)
    * then mean-normalizes to Σw = |players|·1e6 (the MM update is
    * scale-free; pinning the mean makes every round — and the final
    * strengths — cross-engine exact integers). Players with zero
    * comparisons never appear; a player with zero WINS converges to
    * strength 0 (the true MLE boundary). Integer truncation makes this a
    * quantized MM step, not IEEE Zermelo — the fixed point differs from
    * the float iteration by O(1e-6), which is the price of exactness.
    *
    * 100 TB shape: outcomes aggregate ONCE to the |players|²-bounded pair
    * table (the only corpus-sized shuffle); every round is two joins + an
    * aggregation on that table, localCheckpoint'd (the q95/PageRank
    * lineage rule) — |players| is arena-sized (models, sources, domains),
    * so rounds are broadcast-cheap. */
  def bradleyTerryStrength(outcomes: DataFrame, winner: Column,
      loser: Column, iters: Int = 3): DataFrame = {
    val wl = outcomes.select(winner.as("wi"), loser.as("lo"))
    val wins = wl.groupBy(col("wi").as("p")).agg(count(lit(1)).as("n_wins"))
    // symmetric comparison counts: one row per ORDERED pair (i, j), c_ij =
    // total games between them regardless of direction
    val sym = wl.select(col("wi").as("i"), col("lo").as("j"))
      .unionAll(wl.select(col("lo").as("i"), col("wi").as("j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      .transform(graft.ops.Checkpoints.truncate(_))
    val players = sym.select(col("i").as("p")).distinct()
      .join(wins, Seq("p"), "left")
      .select(col("p"), coalesce(col("n_wins"), lit(0L)).as("n_wins"))
      .transform(graft.ops.Checkpoints.truncate(_))
    // |players|-sized driver count (arena-bounded — the lloydCentroidsQ
    // collect discipline): the normalization target Σw = nPlayers·1e6
    val nPlayers: Long = players.count()
    var w = players.select(col("p"), lit(1000000L).as("w"))
    for (_ <- 0 until iters) {
      val d = sym
        .join(w.select(col("p").as("i"), col("w").as("wI")), Seq("i"))
        .join(w.select(col("p").as("j"), col("w").as("wJ")), Seq("j"))
        .groupBy(col("i").as("p"))
        .agg(sum(org.apache.spark.sql.graft.Bridge.idiv(
          col("c") * 1000000000L, col("wI") + col("wJ"))).as("d"))
      val raw = players.join(d, Seq("p"))
        .select(col("p"), org.apache.spark.sql.graft.Bridge.idiv(
          col("n_wins") * 1000000000L, col("d")).as("wr"))
      val tot = raw.agg(sum(col("wr")).as("s"))
      w = raw.crossJoin(tot)
        .select(col("p"), expr(
          s"CAST((CAST(wr AS DECIMAL(38,0)) * 1000000 * $nPlayers) DIV s " +
            "AS BIGINT)").as("w"))
        .transform(graft.ops.Checkpoints.truncate(_))
    }
    players.join(w, Seq("p"))
      .join(sym.groupBy(col("i").as("p")).agg(sum(col("c")).as("n_games")),
        Seq("p"))
      .select(col("p"), col("n_games"), col("n_wins"),
        col("w").as("strength_ppm"))
  }
}

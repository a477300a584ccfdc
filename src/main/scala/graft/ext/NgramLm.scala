package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-bigram language-model scoring — the perplexity-style fluency
  * filter of a corpus-curation pipeline (the CCNet/KenLM pattern: train a
  * small n-gram LM, score every document, gate on the score), reduced to its
  * distributed essentials with a char-bigram model.
  *
  * Probabilities are INTEGER-SCALED instead of log-space floats:
  * `p_int(xy) = (1e6 · c(xy)) div c(x·)` and a document scores the integer
  * mean of its bigram probabilities — same monotonicity as average
  * log-likelihood for ranking/gating purposes, but exact integer arithmetic,
  * so scores (and the keep/drop sets they induce) are bit-identical across
  * engines and partitionings (the same trick as the TF-IDF integer idf; a
  * float log-prob is a one-line swap).
  *
  * Scale shape: the model is charset²-bounded (a few KB) — one corpus-sized
  * two-phase count builds it, then it BROADCASTS and scoring is a map-side
  * join + one per-doc aggregation. Nothing vocabulary- or corpus-sized ever
  * sits on the driver. Trained-on-corpus scoring needs no smoothing (every
  * document bigram is in the model by construction); for held-out scoring
  * add-one smooth the counts before [[probTable]]'s division. */
object NgramLm {

  /** Within-word adjacent character bigrams of a text, in reading order. */
  def charBigrams(text: Column): Column =
    flatten(transform(
      filter(TextAnalysis.tokens(text), w => length(w) >= 2),
      w => transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2)))))

  /** Train the bigram table: (bg, c_bi, c_x, p_int) where c_x counts all
    * bigrams sharing the first character (the conditional's denominator). */
  def probTable(docs: DataFrame, text: Column): DataFrame = {
    val counts = docs.select(explode(charBigrams(text)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_bi"))
    val prefix = counts.groupBy(substring(col("bg"), 1, 1).as("px"))
      .agg(sum(col("c_bi")).as("c_x"))
    counts.withColumn("px", substring(col("bg"), 1, 1))
      .join(prefix, "px")
      // the multiply runs in DECIMAL so a web-scale c_bi (> ~9.2e12)
      // cannot wrap Long; DIV (not `/` then CAST) floors the exact
      // quotient — decimal `/` rounds HALF_UP at scale 6 first, which
      // diverges from the oracle's `//` by 1 once a denominator passes
      // ~2e6 and the fraction lands in the rounding window
      .withColumn("p_int",
        expr("CAST((CAST(c_bi AS DECIMAL(38,0)) * 1000000) DIV c_x AS BIGINT)"))
      .select(col("bg"), col("c_bi"), col("c_x"), col("p_int"))
  }

  /** Score documents under a trained table: `m` bigram instances, integer
    * mean probability `fluency` (higher = more typical of the training
    * corpus). Documents with no bigram (all words length < 2) drop out —
    * they have no evidence to score. */
  def score(docs: DataFrame, id: Column, text: Column, lm: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), explode(charBigrams(text)).as("bg"))
      .join(broadcast(lm.select(col("bg"), col("p_int"))), "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("m"), sum(col("p_int")).as("tot"))
      .withColumn("fluency", expr("tot div m"))
      .select(col("doc_id"), col("m"), col("fluency"))

  /** Within-word adjacent character trigrams, in reading order. */
  def charTrigrams(text: Column): Column =
    flatten(transform(
      filter(TextAnalysis.tokens(text), w => length(w) >= 3),
      w => transform(sequence(lit(1), length(w) - 2), i => w.substr(i, lit(3)))))

  /** Trigram conditional table: (tg, c_tri, c_xy, p_int) with the
    * denominator counting trigrams sharing the first TWO characters —
    * p(c₃ | c₁c₂) in integer ppm. charset³-bounded, so it broadcasts
    * like [[probTable]] at any corpus size. */
  def probTable3(docs: DataFrame, text: Column): DataFrame = {
    val counts = docs.select(explode(charTrigrams(text)).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("c_tri"))
    val prefix = counts.groupBy(substring(col("tg"), 1, 2).as("pxy"))
      .agg(sum(col("c_tri")).as("c_xy"))
    counts.withColumn("pxy", substring(col("tg"), 1, 2))
      .join(prefix, "pxy")
      // DIV, not `/` + CAST: see [[probTable]] — the floor must match `//`
      .withColumn("p_int",
        expr("CAST((CAST(c_tri AS DECIMAL(38,0)) * 1000000) DIV c_xy AS BIGINT)"))
      .select(col("tg"), col("c_tri"), col("c_xy"), col("p_int"))
  }

  /** Interpolated trigram fluency (the higher-order CCNet shape; Jelinek–
    * Mercer fixed-weight interpolation): each trigram instance scores
    * mixPpm·p(c₃|c₁c₂) + (1−mixPpm)·p(c₃|c₂) — the bigram term is the
    * trigram's SUFFIX bigram under [[probTable]], the backoff that keeps a
    * rare context from zeroing a common continuation. All integer ppm;
    * unseen n-grams read 0 (cross-corpus scoring), so the mix degrades
    * smoothly instead of dropping the instance. Both model tables
    * broadcast (charset-bounded); one doc-keyed aggregation. */
  def scoreInterpolated(docs: DataFrame, id: Column, text: Column,
      lm3: DataFrame, lm2: DataFrame, mixPpm: Long): DataFrame = {
    require(mixPpm >= 0 && mixPpm <= 1000000, "scoreInterpolated: mixPpm in [0, 1e6]")
    docs.select(id.as("doc_id"), explode(charTrigrams(text)).as("tg"))
      .join(broadcast(lm3.select(col("tg"), col("p_int").as("p3"))), Seq("tg"), "left")
      .withColumn("bg", substring(col("tg"), 2, 2))
      .join(broadcast(lm2.select(col("bg"), col("p_int").as("p2"))), Seq("bg"), "left")
      .withColumn("mix", expr(
        s"($mixPpm * coalesce(p3, 0) + ${1000000 - mixPpm} * coalesce(p2, 0)) div 1000000"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("m"), sum(col("mix")).as("tot"))
      .withColumn("fluency3", expr("tot div m"))
      .select(col("doc_id"), col("m"), col("fluency3"))
  }
}

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
      // cannot wrap Long; the cast back truncates the exact quotient —
      // identical to integer div for these nonnegative values
      .withColumn("p_int",
        expr("CAST(CAST(c_bi AS DECIMAL(38,0)) * 1000000 / c_x AS BIGINT)"))
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
}

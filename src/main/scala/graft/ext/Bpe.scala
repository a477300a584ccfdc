package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the public construction
  * every modern tokenizer trains with): learn merge rules by repeatedly
  * counting adjacent symbol pairs across the corpus and fusing the most
  * frequent one.
  *
  * Scale shape: training runs on the DISTINCT-WORD table (word, count) — the
  * one corpus-sized shuffle happens once in [[wordCounts]]; every merge
  * iteration is then a vocabulary-sized aggregation (explode adjacent pairs
  * → two-phase weighted count → 1-row argmax to the driver). At 100 TB the
  * vocabulary is millions of rows while the corpus is trillions of tokens,
  * so iterating on the word table instead of raw text is the difference
  * between an afternoon and impossible. Encoding then joins documents to the
  * (broadcastable) encoded vocabulary — no per-document merge loop.
  *
  * Symbol strings are sentinel-framed so a merge is ONE literal
  * `replace(...)` (codegen'd, left-to-right non-overlapping in every engine
  * — which is exactly BPE's greedy leftmost application order):
  * tokens are separated by a DOUBLE U+0001 sentinel and the string is
  * framed by the same pair, e.g. word "abc" -> _ _ a _ _ b _ _ c _ _
  * (each _ = U+0001). Merging (x, y) rewrites _ x _ _ y _ -> _ xy _ :
  * each boundary contributes one sentinel to the match,
  * so back-to-back occurrences (`[a,a,a,a]` → `[aa,aa]`) merge correctly,
  * and word boundaries (four sentinels when doc-level strings concatenate)
  * can never match. Pure string expressions end-to-end — the DuckDB oracle
  * replays the identical chain, so merge tables are cross-engine exact. */
object Bpe {

  /** Token-boundary sentinel (tokens separated / framed by `Sep * 2`). */
  val Sep = "\u0001"
  private val SS = Sep + Sep

  /** Word → framed symbol string of single characters. `(?s).` so the odd
    * non-`\s` line separators (U+2028/U+2029/U+0085) that survive the
    * whitespace tokenizer still count as symbols instead of silently
    * vanishing (RE2 and Java agree on the flag). */
  def symbolString(word: Column): Column =
    concat(lit(SS), array_join(regexp_extract_all(word, lit("(?s)."), lit(0)), SS), lit(SS))

  /** Current symbol tokens of a framed symbol string. */
  def tokensOf(s: Column): Column =
    filter(split(s, SS), t => t =!= "")

  /** Symbol count of a framed symbol string. */
  def tokenCountOf(s: Column): Column = size(tokensOf(s)).cast("long")

  /** Apply one merge rule (x, y) → xy to a framed symbol string. */
  def applyMerge(s: Column, x: String, y: String): Column =
    replace(s, lit(Sep + x + SS + y + Sep), lit(Sep + x + y + Sep))

  /** One learned merge rule: at `step`, fuse adjacent (x, y) seen with
    * corpus-weighted frequency `cnt`. */
  case class Merge(step: Long, x: String, y: String, cnt: Long)

  /** The distinct-word training table: (w, n) with n = corpus occurrences.
    * The single corpus-sized aggregation of the whole training process. */
  def wordCounts(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Adjacent-pair weighted counts over the current symbol strings. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("l", tokensOf(col("s")))
      .filter(size(col("l")) >= 2) // sequence(1, 0) would step DOWNWARD
      .select(col("n"), explode(expr(
        "transform(sequence(1, size(l) - 1), " +
          "i -> struct(element_at(l, i) AS x, element_at(l, i + 1) AS y))")).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum(col("n")).as("cnt"))

  /** Learn `nMerges` merge rules. Each iteration runs one vocabulary-sized
    * distributed aggregation and collects exactly ONE row (the argmax pair,
    * tie-broken count-desc then lexicographic — deterministic under any
    * partitioning). The word table is persisted once; iteration i replays
    * i codegen'd replaces over the cached base, so lineage stays shallow. */
  def trainMerges(words: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges must be in [1, 64]")
    val base = words.select(col("n"), symbolString(col("w")).as("s")).persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var cur = base
      var step = 1
      var exhausted = false
      while (step <= nMerges && !exhausted) {
        val top = pairCounts(cur)
          .orderBy(col("cnt").desc, col("x"), col("y")).limit(1).collect()
        if (top.isEmpty) exhausted = true // no pairs left — later rounds stay empty
        else {
          val r = top(0)
          val m = Merge(step.toLong, r.getString(0), r.getString(1), r.getLong(2))
          merges += m
          cur = cur.withColumn("s", applyMerge(col("s"), m.x, m.y))
        }
        step += 1
      }
      merges.toSeq
    } finally {
      base.unpersist(): Unit
    }
  }

  /** Batched training — the path to real vocabulary sizes. [[trainMerges]]
    * pays one driver round trip PER merge; a 30k-merge tokenizer cannot.
    * Each count pass here accepts up to `batchR` pairs from the ranked
    * list, greedily skipping any pair that SHARES A SYMBOL with an earlier
    * accepted pair, applies them all (in rank order), re-counts, repeats —
    * `nMerges / batchR` passes instead of `nMerges`.
    *
    * Why shared-symbol is the right conflict rule: merging (x, y) only
    * changes the counts of pairs with x or y on a side (the neighbors of
    * fused occurrences) and creates pairs involving the new symbol xy —
    * a pair disjoint from every accepted pair's symbols keeps its exact
    * count, so applying it in the same pass is arithmetic-identical to
    * re-counting first. When the top of the ranking is pairwise disjoint
    * (the common case for natural text at realistic batch sizes), a batch
    * replays sequential training exactly — the SketchBpeSpec law; when it
    * is not, the skipped conflicting pairs are re-ranked next pass against
    * fresh counts, so batching trades at most merge ORDER in interference
    * neighborhoods, never correctness of the count arithmetic.
    *
    * Lineage: each pass localCheckpoints the rewritten vocabulary —
    * thousands of chained replaces would otherwise stack into one
    * expression tree (the q95 connected-components lesson). */
  def trainMergesBatched(words: DataFrame, nMerges: Int,
      batchR: Int = 32): Seq[Merge] = {
    require(nMerges >= 1 && nMerges <= 100000,
      "trainMergesBatched: nMerges must be in [1, 100000]")
    require(batchR >= 1, "trainMergesBatched: batchR must be positive")
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = words.select(col("n"), symbolString(col("w")).as("s")).transform(graft.ops.Checkpoints.truncate(_))
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batchR, nMerges - merges.size)
      // 4× headroom: conflicts evict ranked pairs; if the window still
      // cannot fill the batch, the next pass re-ranks what remains
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(4 * want).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val batch = scala.collection.mutable.ArrayBuffer.empty[Merge]
        val it = top.iterator
        while (it.hasNext && batch.size < want) {
          val r = it.next()
          val (x, y, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!used(x) && !used(y) && !used(x + y)) {
            batch += Merge(merges.size + batch.size + 1L, x, y, c)
            used += x
            used += y
            // the CREATED symbol is claimed too: a later ranked pair whose
            // side equals x+y would otherwise apply against counts this
            // merge just mutated (new xy adjacencies), voiding the
            // "identical to re-counting" guarantee
            used += (x + y)
          }
        }
        merges ++= batch // first ranked pair always accepts: progress is guaranteed
        cur = batch.foldLeft(cur) { (d, m) =>
          d.withColumn("s", applyMerge(col("s"), m.x, m.y))
        }.transform(graft.ops.Checkpoints.truncate(_))
      }
    }
    merges.toSeq
  }

  /** Encoded vocabulary: each distinct word's symbol string after applying
    * the merge rules in order, with its BPE token count. Vocabulary-sized —
    * the lookup table document encoding joins against (broadcast when it
    * fits). */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val encoded = merges.foldLeft(symbolString(col("w"))) {
      case (s, m) => applyMerge(s, m.x, m.y)
    }
    words.select(col("w"), col("n"),
      tokenCountOf(encoded).as("n_tok"),
      array_join(tokensOf(encoded), " ").as("pieces"))
  }
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, content fingerprinting.
  *
  * Everything here is a pure per-row Column expression built from codegen'd
  * built-ins and higher-order array functions — no UDFs, no shuffle; a 100 TB
  * corpus maps through these at scan speed and stays inside whole-stage
  * codegen. (Beyond the reference's scalar-function inventory, SURVEY.md §2.8.)
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, single punctuation —
    * the pre-tokenization regex shape used by byte-pair encoders. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).cast("long")

  private val stopwords = Seq("the", "a", "an", "of", "to", "in", "is", "and", "or", "for")

  /** Fraction of tokens that are (English) stopwords — a fluency proxy. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    round(size(filter(toks, t => array_contains(typedlit(stopwords), t)))
      .cast("double") / greatest(size(toks), lit(1)), 6)
  }

  /** Raw stopword-token COUNT (the integer numerator of [[stopwordRatio]]) —
    * the form model-fitting features need (exact cross-engine integers). */
  def stopTokenCount(text: Column): Column =
    size(filter(tokens(text), t => array_contains(typedlit(stopwords), t)))
      .cast("long")

  /** Ratio of alphabetic characters to all characters. */
  def alphaRatio(text: Column): Column =
    round(length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(text), lit(1)), 6)

  /** Mean token length (chars per whitespace token). */
  def meanTokenLen(text: Column): Column =
    round(length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(size(tokens(text)), lit(1)), 6)

  /** Composite quality score in [0,1]: fluent prose has high alpha ratio, a
    * healthy stopword fraction, and mid-length tokens. Deterministic and
    * SQL-mirrorable (the DuckDB oracle recomputes it exactly). */
  def qualityScore(text: Column): Column =
    round(lit(0.5) * alphaRatio(text)
      + lit(0.3) * least(stopwordRatio(text) * 3, lit(1.0))
      + lit(0.2) * least(meanTokenLen(text) / 8, lit(1.0)), 6)

  /** Hashing-trick linear classifier margin over unigram + adjacent-bigram
    * features ([[graft.functions.HashExpressions.LinearMargin]]): the
    * fastText SERVING shape — no vocabulary join, constant memory in the
    * corpus size, one codegen'd pass at scan speed. Weights come from a
    * public integer formula (a stand-in for a trained array riding as a
    * literal), so the margin — and the keep/drop decision `margin >= 0` —
    * is exact cross-engine integer arithmetic with a full SQL oracle. */
  def hashedLinearMargin(text: Column, buckets: Int = 1 << 18): Column =
    graft.functions.HashExpressions.hashedMargin(text, buckets)

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "las", "y", "un", "es", "que"))

  /** N-gram-heuristic language ID: CJK codepoints → zh, else argmax of
    * per-language marker-token hits (ties resolved in fixed order en, fr,
    * de, es; no hits → "und"). A real pipeline swaps in fastText-style
    * models; the operator shape (pure expression, no shuffle) is the same. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    def score(ms: Seq[String]): Column =
      size(filter(toks, t => array_contains(typedlit(ms), t)))
    val scored = langMarkers.map { case (l, ms) => (l, score(ms)) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    // first matching lang wins on ties (fixed en > fr > de > es order)
    val firstWins = scored.reverse.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(firstWins)
  }

  /** Language labels of a document's first and second token halves — the
    * mixed-language detector (a doc whose head and tail disagree is a
    * concatenation artifact, a bad extraction, or genuine code-switching;
    * every monolingual pipeline wants them surfaced): same marker scoring
    * as [[langId]] on each half, split at ⌈n/2⌉ tokens. Returns a struct
    * (lang_head, lang_tail, mixed) — `mixed` only fires when BOTH halves
    * identify (an `und` half is absence of evidence, not disagreement).
    * Pure per-row expressions, zero shuffle. */
  def mixedLangProfile(text: Column): Column = {
    val tk = tokens(text)
    val h = org.apache.spark.sql.graft.Bridge.idiv(
      size(tk).cast("long") + 1, lit(2L)).cast("int")
    val h1 = array_join(slice(tk, lit(1), h), " ")
    val h2 = array_join(slice(tk, h + 1, size(tk)), " ")
    // double lambda-bind (the q197 lesson): the half strings evaluate
    // once before langId re-reads them, and the two langId RESULTS
    // evaluate once before the struct/mixed logic re-reads THEM —
    // unbound, every textual reference re-runs the whole
    // join-split-score chain (measured 9.3 s vs ~2 s at sf0.1)
    element_at(transform(array(struct(h1.as("a"), h2.as("b"))), v =>
      element_at(transform(array(struct(
        langId(v.getField("a")).as("l1"), langId(v.getField("b")).as("l2"))), s =>
        struct(s.getField("l1").as("lang_head"),
          s.getField("l2").as("lang_tail"),
          (s.getField("l1") =!= s.getField("l2") &&
            s.getField("l1") =!= "und" &&
            s.getField("l2") =!= "und").as("mixed"))), 1)), 1)
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct token
    * set. Robust to shuffled word order; exact-dedup key for bag-of-words
    * duplicates. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Canonical text form — the normalization every dedup should run
    * BEFORE fingerprinting (case, punctuation, and whitespace variants of
    * one document must collide, not survive as "distinct"): lowercase,
    * punctuation → space, whitespace runs collapsed, ends trimmed. The
    * character classes (\p{L}\p{N}) and the lowercase are
    * locale-independent and parse identically under Java regex and RE2 —
    * the [[redactPii]] cross-engine discipline. Pure codegen expressions,
    * zero shuffle. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(
      lower(regexp_replace(text, "[^\\p{L}\\p{N}\\s]+", " ")), "\\s+", " "))

  // ---------- markup stripping --------------------------------------------

  /** HTML/markup → text, the web-corpus cleanup stage that runs BEFORE
    * every quality/dedup signal (the CCNet/RefinedWeb "extract" step):
    * script and style elements vanish WITH their contents (code is not
    * prose — and `if (a < b)` inside a script must not leak as text),
    * remaining tags and comments collapse to spaces, the five ubiquitous
    * character entities decode (`&amp;` LAST, so `&amp;lt;` yields the
    * literal `&lt;` a correct encoder meant, never a double-decode),
    * whitespace runs collapse. Every pattern parses identically under
    * Java regex and RE2 — `(?is)` flags and lazy `.*?`, no lookaround —
    * the [[redactPii]] cross-engine discipline. Pure codegen'd
    * per-row expression chain: zero shuffle, scan speed at any scale. */
  private[graft] val scriptBlockRe = "(?is)<script[^>]*>.*?</script>"
  private[graft] val styleBlockRe = "(?is)<style[^>]*>.*?</style>"
  private[graft] val tagRe = "<[^>]*>"

  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, scriptBlockRe, " "), styleBlockRe, " ")
    val noTags = regexp_replace(noBlocks, tagRe, " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ---------- URL canonicalization -----------------------------------------

  /** Canonical URL form — the web-pipeline identity under which
    * crawl variants of one page must collide (the stage before per-URL
    * dedup and per-domain caps): scheme and host lowercase, `www.` and
    * default ports (`:80` http, `:443` https) drop, the fragment drops,
    * tracking parameters (`utm_*`, `gclid`, `fbclid`) drop while real
    * parameters keep their order, and a bare trailing `/` on the path
    * normalizes away (`http://X/` ≡ `http://X`). Everything is
    * regex-group + HOF string surgery that parses identically under Java
    * regex and RE2 (no lookaround); pure codegen, zero shuffle. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path0 = regexp_replace(rest, "\\?.*", "")
    val path = regexp_replace(path0, "/+$", "")
    val qs = regexp_extract(rest, "\\?(.*)", 1)
    val kept = filter(split(qs, "&"), p =>
      !(p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid)=") || p === ""))
    val query = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, query)
  }

  /** Registered-domain approximation — the per-domain cap / PageRank key:
    * last two host labels (a documented public-suffix-list-free
    * simplification; `co.uk`-class suffixes need the PSL). */
  def urlDomain(url: Column): Column = {
    val host = regexp_extract(canonicalUrl(url), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
    when(host.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
  }

  // ---------- PII scrubbing ------------------------------------------------

  /** Conservative PII patterns — the character classes are chosen to parse
    * identically under Java regex (Spark) and RE2 (DuckDB): no lookaround,
    * no backreferences, explicit whitespace classes. Public-knowledge
    * constructions (the standard "good enough for web text" shapes). */
  private[graft] val urlRe = "https?://[^ \\t\\r\\n]+"
  private[graft] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val longNumRe = "[0-9]{7,}"

  /** Redact personally-identifying spans from web text: URLs, email
    * addresses, and long digit runs (phone numbers, account ids) each
    * collapse to a typed placeholder token. Order matters and is fixed —
    * URLs first (their query strings contain digit runs and @-forms that
    * must vanish as part of the URL, not survive as a half-redacted
    * remnant), then emails, then bare digit runs. A pure per-row codegen'd
    * expression chain: no shuffle, no UDF, scan-speed at any scale — and
    * every pattern/replacement is engine-portable, so redacted text (and
    * its md5) is cross-engine exact (q110). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      longNumRe, "<NUM>")

  /** Consistent pseudonymization — the referential-integrity-preserving
    * form of [[redactPii]]: every PII span is replaced by a TYPED token
    * carrying a digest of the span (`<EMAIL_gajkbfcd>`), so the same
    * address maps to the same token corpus-wide (joins, co-occurrence and
    * frequency analyses still work on the scrubbed corpus) while the raw
    * value is gone. Digest hex digits are transliterated to letters
    * (`0-9` → `g-p`) so a pseudonym can never re-match the digit-run
    * pattern of a later pass. Distinct matches are replaced LONGEST FIRST
    * (then lexicographic) — a shorter match that is a prefix/substring of
    * a longer one must not corrupt it — and the order is built from a
    * sortable key, not engine list-distinct order, so both engines replay
    * the exact same fold. Pure per-row HOF chain: zero shuffle. */
  private def pseudoPass(c: Column, re: String, tag: String): Column = {
    val matches = array_distinct(regexp_extract_all(c, lit(re), lit(0)))
    val ordered = transform(
      array_sort(transform(matches, m =>
        concat(lpad((lit(10000) - length(m)).cast("string"), 5, "0"), m))),
      x => substring(x, 6, 1000000))
    aggregate(ordered, c, (acc, m) =>
      replace(acc, m, concat(lit("<" + tag + "_"),
        translate(substring(md5(m), 1, 8), "0123456789", "ghijklmnop"),
        lit(">"))))
  }

  def pseudonymizePii(text: Column): Column =
    pseudoPass(pseudoPass(pseudoPass(text, urlRe, "URL"), emailRe, "EMAIL"),
      longNumRe, "NUM")

  // ---------- repetition signals (Gopher/MassiveText rules) ---------------

  /** Word n-grams as strings, in document order — the one-pass codegen'd
    * kernel shared with the dedup family ([[graft.functions.TextExpressions
    * .NgramKernel]]); empty array when fewer than n tokens. */
  private def wordNgramStrings(text: Column, n: Int): Column =
    graft.functions.TextExpressions.wordNgrams(text, n)

  /** Multiplicity of the most frequent element of a string-array column
    * (the modal count): sort once, fold a (prev, run, best) state through
    * the runs. 0 for an empty array. The initial `run = 0` makes the prev
    * sentinel harmless — the first element always restarts the run at 1,
    * even when it equals the sentinel. */
  private[graft] def modalCount(arr: Column): Column = {
    val sorted = array_sort(arr)
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** The distinct values that occur AT LEAST TWICE in a string-array column:
    * same sorted fold, appending a value exactly when its run hits 2. */
  private[graft] def repeatedValues(arr: Column): Column = {
    val sorted = array_sort(arr)
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"),
        array().cast("array<string>").as("reps")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run === 2, array_append(acc.getField("reps"), x))
            .otherwise(acc.getField("reps")).as("reps"))
      },
      acc => acc.getField("reps"))
  }

  /** Count of occurrences of the single most frequent token — the numerator
    * of Gopher's "fraction of tokens in the most common word" rule. */
  def topTokenCount(text: Column): Column = modalCount(tokens(text))

  /** Count of occurrences of the most frequent adjacent token BIGRAM
    * (Gopher's top-2-gram fraction numerator). */
  def topBigramCount(text: Column): Column =
    modalCount(wordNgramStrings(text, 2))

  /** Distinct-token count (type count; with [[tokenCount]] gives the
    * type/token ratio — low ratio = templated/repetitive text). */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Number of token POSITIONS covered by some trigram that occurs at least
    * twice in the document — the "fraction of characters in duplicated
    * n-grams" rule at token granularity. Exact: repeated trigram values are
    * folded out of one sorted pass, each occurrence stamps its three
    * positions, and the distinct union is counted. Pure per-row HOFs — the
    * whole signal set runs at scan speed with zero shuffle. */
  def repeatedTrigramCover(text: Column): Column = {
    val tris = wordNgramStrings(text, 3)
    val reps = repeatedValues(tris)
    val hitStarts = when(size(tris) > 0,
      filter(sequence(lit(1), size(tris)),
        i => array_contains(reps, get(tris, i - 1))))
      .otherwise(array().cast("array<int>"))
    size(array_distinct(flatten(
      transform(hitStarts, i => array(i, i + 1, i + 2))))).cast("long")
  }

  /** The Gopher-style repetition gate, all-integer so the keep/drop decision
    * is cross-engine exact: ≥10 tokens, the top word ≤ 20% of tokens, the
    * top bigram ≤ 10%, and repeated-trigram cover ≤ 25%. Thresholds are the
    * published MassiveText shape (Rae et al. 2021, table A1) adapted to
    * token granularity. */
  def repetitionKeep(text: Column): Column = {
    val n = tokenCount(text)
    (n >= 10) &&
      (topTokenCount(text) * 5 <= n) &&
      (topBigramCount(text) * 10 <= n) &&
      (repeatedTrigramCover(text) * 4 <= n)
  }

  /** Printable-character ratio in ppm — the binary-junk detector's first
    * signal (mojibake, control-character soup, truncated binary blobs
    * masquerading as text): printable = ASCII 0x20–0x7E plus
    * tab/newline/CR, counted by length after stripping the complement
    * (one portable regex — `\x` classes parse identically under Java
    * regex and RE2). Empty text scores 0. */
  def printableRatioPpm(text: Column): Column = {
    val printable = length(regexp_replace(text, "[^\\x20-\\x7e\\t\\n\\r]", ""))
    org.apache.spark.sql.graft.Bridge.idiv(
      lit(1000000L) * printable.cast("long"),
      greatest(length(text).cast("long"), lit(1L)))
  }

  /** The mojibake artifact pattern (shared with oracle SQL so both engines
    * scan the identical regex): the classic double-encoded UTF-8 families --
    * UTF-8 bytes of a non-ASCII char re-decoded as cp1252 and re-encoded,
    * the single most common text-corruption mode in web corpora. Family 1:
    * Latin-1 accents (U+00E9 e-acute -> bytes 0xC3 0xA9 -> a 2-char pair
    * led by U+00C3); family 2: the cp1252 punctuation block (U+2019
    * right-quote -> 0xE2 0x80 0x99 -> the a-circumflex/euro/trademark
    * triple); plus the U+FFFD replacement char a lossy decode leaves
    * behind. Built from code points so the source stays ASCII. */
  val mojibakePattern: String = {
    def c(cp: Int): String = new String(Character.toChars(cp))
    c(0xC3) + "[" +
      Seq(0xA9, 0xA8, 0xA1, 0xB3, 0xBA, 0xB1, 0xA7, 0xBC).map(c).mkString +
      "]|" +
      c(0xE2) + c(0x20AC) + "[" +
      Seq(0x2122, 0x0153, 0xA6, 0x201C).map(c).mkString + "]|" +
      c(0xFFFD)
  }

  /** Mojibake hit count per document: non-overlapping scan of
    * [[mojibakePattern]] (regexp_extract_all -- same left-to-right
    * semantics under Java regex and RE2); literal characters only, no
    * engine-specific classes. Pure codegen, zero shuffle. */
  def mojibakeCount(text: Column): Column =
    size(regexp_extract_all(text, lit(mojibakePattern), lit(0)))
      .cast("long")

  /** Longest run of one repeated character — the second junk signal
    * (padding storms, progress-bar dumps, `zzzz…` keyboard mash). One
    * in-order fold over the char array; 0 for empty text. */
  def maxCharRun(text: Column): Column =
    when(length(text) === 0, lit(0L)).otherwise(
      aggregate(split(text, ""),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, c) => {
          val run = when(c === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1L))
          struct(c.as("prev"), run.as("run"),
            greatest(run, acc.getField("best")).as("best"))
        },
        acc => acc.getField("best")))

  /** Token-diversity score as Gini impurity in ppm, exact-integer (the
    * log-free stand-in for token entropy — logs are floats and floats
    * diverge cross-engine; Gini is pure integer arithmetic and orders
    * corpora the same way): `10⁶ · (1 − Σ cntᵢ²/n²)` with integer floor
    * division. 0 for a doc that is one token repeated (or empty — no
    * diversity either way), → 10⁶·(1−1/n) for all-distinct tokens.
    * Σcnt² folds out of ONE sorted pass using the incremental identity
    * r² − (r−1)² = 2r − 1 (no run-close detection needed). Pure per-row
    * HOFs: zero shuffle, scan speed; the gate composes with the Gopher
    * repetition rules ([[repetitionKeep]]) as an orthogonal signal. */
  def giniDiversityPpm(text: Column): Column = {
    val tk = tokens(text)
    val n = size(tk).cast("long")
    val sorted = array_sort(tk)
    val sumSq = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          (acc.getField("acc") + run * 2 - 1).as("acc"))
      },
      acc => acc.getField("acc"))
    when(n === 0, lit(0L)).otherwise(
      lit(1000000L) - org.apache.spark.sql.graft.Bridge.idiv(
        lit(1000000L) * sumSq, n * n))
  }

  /** Rolling polynomial fingerprint over tokens (mod 1e9+7, ascii+length
    * token features) — an order-SENSITIVE sketch, cross-engine mirrorable
    * (DuckDB `list_reduce` seeds with the first element, so we fold from the
    * second over an `element_at(.,1)` seed to match bit-for-bit). */
  /** ⌊log₂ n⌋ + 1 for positive longs — the power-of-two bucket index for
    * log-scale histograms, computed as the LENGTH OF THE BINARY STRING
    * (`bin(n)`), which both engines produce identically; float log2 would
    * hand bucket boundaries at exact powers of two to libm ulps (the
    * q261 first-digit rule applied to base 2). 0 for n ≤ 0. */
  def log2Bucket(n: Column): Column =
    when(n <= 0, 0L).otherwise(length(bin(n)).cast("long"))

  /** Text-hygiene counters, all scan-speed codegen'd predicates: empty or
    * whitespace-only text, leading/trailing ASCII-space padding (an
    * explicit regex, NOT `trim` equality — DuckDB's trim strips U+00A0
    * while Spark's strips only 0x20, a measured cross-engine divergence),
    * runs of 2+ spaces,
    * ASCII control characters (tab/CR/LF excluded — they are legitimate
    * layout), and NBSP (U+00A0, the copy-paste classic). Each returns a
    * 0/1 long for per-source rollups. */
  def hygieneFlags(text: Column): Column = struct(
    (trim(text) === "").cast("long").as("empty"),
    (text rlike "^ | $").cast("long").as("untrimmed"),
    (text rlike "  ").cast("long").as("multispace"),
    (text rlike "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").cast("long")
      .as("control"),
    (text rlike new String(Character.toChars(0xA0))).cast("long")
      .as("nbsp"))

  /** Per-script codepoint counts + the dominant FOREIGN (non-Latin)
    * script — the script-consistency audit a multilingual corpus needs
    * before trusting its `lang` labels: a document labeled `en` carrying
    * a Cyrillic run is mislabeled, mojibake, or an injection artifact
    * (each its own remediation). Counts are codepoint-range deletions
    * (`length(x) − length(regexp_replace(x, [range], ''))`), BMP ranges
    * only, so Spark's and RE2's class semantics agree exactly; five
    * regex passes per row, scan speed, zero shuffle. `foreign` ties
    * break in fixed order (cyrillic, greek, arabic, cjk); 'none' when
    * the text is pure Latin/ASCII. */
  def scriptProfile(text: Column): Column = {
    def range(lo: Int, hi: Int): String =
      "[" + new String(Character.toChars(lo)) + "-" +
        new String(Character.toChars(hi)) + "]"
    def cnt(re: String): Column =
      (length(text) - length(regexp_replace(text, re, ""))).cast("long")
    val latin = cnt("[A-Za-z]")
    val cyr = cnt(range(0x0400, 0x04ff))
    val greek = cnt(range(0x0370, 0x03ff))
    val arabic = cnt(range(0x0600, 0x06ff))
    val cjk = cnt(range(0x4e00, 0x9fff))
    val top = greatest(cyr, greek, arabic, cjk)
    val foreign = when(top === 0, "none")
      .when(cyr === top, "cyrillic")
      .when(greek === top, "greek")
      .when(arabic === top, "arabic")
      .otherwise("cjk")
    struct(latin.as("latin"), cyr.as("cyrillic"), greek.as("greek"),
      arabic.as("arabic"), cjk.as("cjk"), foreign.as("foreign"))
  }

  /** Truncation / mid-sentence-ending flag: text whose last non-space
    * character is not terminal punctuation (.!?…。！？) — the cheap
    * "this document was cut off" signal a chunking or extraction bug
    * leaves behind. Empty text is NOT flagged (it is q270's `empty`
    * hygiene bucket, a different defect). */
  def truncatedFlag(text: Column): Column = {
    val terminal = "[.!?…。！？]"
    (trim(text) =!= "" && !(trim(text) rlike (terminal + "$"))).cast("long")
  }

  def rollingFingerprint(text: Column): Column = {
    val vals = transform(tokens(text),
      t => pmod(ascii(t).cast("long") * 31 + length(t), lit(1000003L)))
    when(size(vals) === 0, lit(0L)).otherwise(
      aggregate(
        slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
        element_at(vals, 1),
        (acc, x) => pmod(acc * 31 + x, lit(1000000007L))))
  }
}

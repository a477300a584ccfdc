package graft.sql

/** Text-level rewrites from the reference's SQL dialect to Spark SQL.
  *
  * The reference front end (sql/plan_parser.rs, sql/sql_parser.rs) accepts a
  * handful of constructs Spark's parser doesn't:
  *   - `numbers(N)` / `numbers_mt(N)` / `numbers_local(N)` table functions
  *     (datasources/system/numbers_table.rs) → `range(N)` with the column
  *     aliased `number`;
  *   - ClickHouse `LIMIT n BY k1, k2` (transform_limit_by.rs:17-64) →
  *     `row_number()` window rewrite;
  *   - combinator-suffixed aggregates `sumIf/countIf/minIf/maxIf/avgIf`,
  *     `uniq`, `uniqIf`, `argMin/argMax`, `toTypeName`
  *     (aggregate_function_factory.rs:53-66, udfs/udf.rs) → CASE-WHEN /
  *     DISTINCT / min_by / typeof spellings;
  *   - `system.x` virtual tables → `system_x` temp views (temp-view names
  *     cannot carry a dot);
  *   - `SHOW TABLES|DATABASES|SETTINGS|FUNCTIONS|PROCESSLIST` → SELECTs over
  *     system tables, exactly the rewrite the reference itself performs
  *     (plan_parser.rs:107-127).
  *
  * All rewrites are string→string so the result flows into `spark.sql` and
  * from there into Catalyst unchanged — the dialect layer owns syntax only,
  * never execution.
  */
object Dialect {

  def rewrite(sql: String): String = {
    val trimmed = sql.trim.stripSuffix(";")
    rewriteShow(trimmed).getOrElse {
      var s = trimmed
      // EXPLAIN PIPELINE (sql_parser.rs:126-186): the reference renders its
      // processor pipeline; the closest Spark view is FORMATTED — the
      // physical operator tree with whole-stage-codegen span ids
      s = s.replaceFirst("(?is)^EXPLAIN\\s+PIPELINE\\s+", "EXPLAIN FORMATTED ")
      s = quoteBareUser(s)
      s = descNullsFirst(s)
      s = rewriteNumbers(s)
      s = rewriteCountEmpty(s)
      s = rewriteSystemTables(s)
      s = rewriteCombinators(s)
      s = rewriteLimitBy(s)
      s
    }
  }

  // ---- string-literal awareness ------------------------------------------
  /** Per-position mask: true = inside a quoted literal. Handles single- and
    * double-quoted strings with SQL `''` / `""` doubling as the escape. */
  private def stringMask(s: String): Array[Boolean] = {
    val in = new Array[Boolean](s.length)
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == 0) {
        if (c == '\'' || c == '"') { quote = c; in(i) = true }
      } else {
        in(i) = true
        if (c == quote) {
          if (i + 1 < s.length && s.charAt(i + 1) == quote) { in(i + 1) = true; i += 1 }
          else quote = 0
        }
      }
      i += 1
    }
    in
  }

  /** Apply `f` to the runs of text OUTSIDE quoted literals only. */
  private def mapOutsideStrings(s: String, f: String => String): String = {
    val mask = stringMask(s)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val start = i
      val inside = mask(i)
      while (i < s.length && mask(i) == inside) i += 1
      val seg = s.substring(start, i)
      sb.append(if (inside) seg else f(seg))
    }
    sb.toString
  }

  /** Matches of `re` outside string literals and (when `topLevel`) at paren
    * depth 0 — the clause structure of the statement itself, not of a
    * subquery or function argument. */
  private def scopedMatches(s: String, re: scala.util.matching.Regex,
      topLevel: Boolean): Seq[scala.util.matching.Regex.Match] = {
    val mask = stringMask(s)
    val depth = new Array[Int](s.length)
    var d = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        if (s.charAt(i) == '(') d += 1
        else if (s.charAt(i) == ')') d -= 1
      }
      depth(i) = d
      i += 1
    }
    re.findAllMatchIn(s)
      .filter(m => !mask(m.start) && (!topLevel || depth(m.start) == 0))
      .toSeq
  }

  /** The reference defaults `nulls_first = true` for every sort direction
    * (plan_parser.rs:488); Spark's DESC default is nulls-LAST. Pin DESC
    * sorts to NULLS FIRST unless the query says otherwise (ASC already
    * matches). Scoped to sort-item position: a DESC token is rewritten only
    * when the nearest preceding clause keyword is ORDER BY (at any depth —
    * window specs sort too), so a column or alias literally named `desc`
    * in SELECT/WHERE/GROUP BY position is left alone. */
  private val DescRe = """(?i)\bDESC\b(?!\s+NULLS)""".r
  private val ClauseRe =
    """(?i)\b(ORDER\s+BY|SELECT|FROM|WHERE|GROUP\s+BY|HAVING|LIMIT|PARTITION\s+BY)\b""".r
  private def descNullsFirst(s: String): String = {
    val descs = scopedMatches(s, DescRe, topLevel = false)
    if (descs.isEmpty) return s
    val clauses = scopedMatches(s, ClauseRe, topLevel = false)
    def inOrderBy(pos: Int): Boolean =
      clauses.takeWhile(_.start < pos).lastOption
        .exists(_.group(1).toUpperCase.startsWith("ORDER"))
    val sb = new StringBuilder(s)
    // right-to-left so earlier offsets stay valid
    descs.reverse.foreach { m =>
      if (inOrderBy(m.start)) sb.replace(m.start, m.end, "DESC NULLS FIRST")
    }
    sb.toString
  }

  /** Spark resolves an otherwise-unresolved `user` column to the literal
    * function `current_user()` (even when backtick-quoted — it happens at
    * analysis, not parse). The reference treats `user` as a plain identifier
    * (02_0006 aliases a column `user`), so rename it consistently outside
    * string literals; result VALUES are unchanged, only the column name. */
  private def quoteBareUser(s: String): String =
    mapOutsideStrings(s, _.replaceAll("(?i)(?<![`\\w])user(?![`\\w(])", "user_"))

  // ---- SHOW → SELECT (plan_parser.rs:107-127) ----------------------------
  private def rewriteShow(s: String): Option[String] = {
    val u = s.toUpperCase.replaceAll("\\s+", " ")
    u match {
      // filters to the current database, exactly as plan_parser.rs:118-125
      case "SHOW TABLES" => Some(
        "SELECT name FROM system_tables WHERE database = current_database() ORDER BY database, name")
      case "SHOW DATABASES" => Some("SELECT name FROM system_databases ORDER BY name")
      case "SHOW SETTINGS" => Some("SELECT name, value FROM system_settings ORDER BY name")
      case "SHOW FUNCTIONS" => Some("SELECT name FROM system_functions ORDER BY name")
      case "SHOW PROCESSLIST" => Some("SELECT * FROM system_processes")
      case _ => None
    }
  }

  // ---- numbers(N) table function -----------------------------------------
  private val NumbersRe = """(?i)\bnumbers(?:_mt|_local)?\s*\(\s*(\d+)\s*\)""".r
  private def rewriteNumbers(s: String): String =
    mapOutsideStrings(s,
      NumbersRe.replaceAllIn(_, m => s"(SELECT id AS number FROM range(${m.group(1)}))"))

  // ---- COUNT() → count(*) --------------------------------------------------
  // zero-arg COUNT() is the reference/ClickHouse spelling of count(*)
  // (clickhouse_handler_test.rs:28); Spark's legacy allowParameterlessCount
  // flag parses it but counts an EMPTY tuple (always 0), so rewrite instead
  private val CountEmptyRe = """(?i)\bcount\s*\(\s*\)""".r
  private def rewriteCountEmpty(s: String): String =
    mapOutsideStrings(s, CountEmptyRe.replaceAllIn(_, "count(*)"))

  // ---- system.x → system_x ------------------------------------------------
  private val SystemRe = """(?i)\bsystem\.(one|databases|tables|settings|functions|contributors|clusters|processes|tracing)\b""".r
  private def rewriteSystemTables(s: String): String =
    mapOutsideStrings(s, SystemRe.replaceAllIn(_, m => s"system_${m.group(1).toLowerCase}"))

  // ---- LIMIT n BY k1, k2 [LIMIT m] ---------------------------------------
  // ClickHouse semantics: keep the first n rows per distinct key tuple, then
  // apply the plain LIMIT if present. "First" follows the query's ORDER BY
  // when given; otherwise per-group order is arbitrary (the reference
  // inherits nondeterministic stream order — we pin the key order).
  // Clause detection is paren-depth-aware: only a LIMIT n BY / ORDER BY at
  // depth 0 belongs to the outer statement — a subquery's ORDER BY or LIMIT
  // must not be captured (e.g. `SELECT * FROM (SELECT a FROM t ORDER BY a)
  // LIMIT 2 BY k`).
  private val LimitByHeadRe = """(?is)\bLIMIT\s+(\d+)\s+BY\b""".r
  private val OrderByKwRe = """(?is)\bORDER\s+BY\b""".r
  private val OuterLimitRe = """(?is)\bLIMIT\s+\d+(?:\s+OFFSET\s+\d+)?\s*$""".r
  private def rewriteLimitBy(s: String): String = {
    val lb = scopedMatches(s, LimitByHeadRe, topLevel = true)
    if (lb.isEmpty) return s
    val m = lb.head
    val n = m.group(1)
    val pre = s.substring(0, m.start) // body [+ outer ORDER BY]
    val post = s.substring(m.end)     // keys [+ LIMIT m [OFFSET o]]
    val (body, ord) = scopedMatches(pre, OrderByKwRe, topLevel = true).lastOption match {
      case Some(o) => (pre.substring(0, o.start).trim, Some(pre.substring(o.end).trim))
      case None => (pre.trim, None)
    }
    val (keys, tail) = scopedMatches(post, OuterLimitRe, topLevel = true).lastOption match {
      case Some(ol) => (post.substring(0, ol.start).trim, " " + post.substring(ol.start).trim)
      case None => (post.trim, "")
    }
    val winOrder = ord.getOrElse(keys)
    val outerOrd = ord.map(o => s" ORDER BY $o").getOrElse("")
    s"""SELECT * EXCEPT (__rn) FROM (SELECT *, row_number() OVER (PARTITION BY $keys ORDER BY $winOrder) AS __rn FROM ($body)) WHERE __rn <= $n$outerOrd$tail"""
  }

  // ---- combinator-suffixed aggregates ------------------------------------
  // Paren-aware: find `name(`, scan to the matching close, split top-level
  // commas, respell. Handles nesting and string literals.
  private case class Call(start: Int, end: Int, args: Seq[String])

  private def findCall(s: String, name: String, from: Int): Option[Call] = {
    val re = s"""(?i)\\b$name\\s*\\(""".r
    val mask = stringMask(s)
    re.findAllMatchIn(s.substring(from)).find(m => !mask(from + m.start)).map { m =>
      val open = from + m.end - 1
      var depth = 0
      var i = open
      var inStr: Char = 0
      val splits = scala.collection.mutable.ArrayBuffer[Int]()
      var end = -1
      while (end < 0 && i < s.length) {
        val c = s.charAt(i)
        if (inStr != 0) { if (c == inStr) inStr = 0 }
        else c match {
          case '\'' | '"' => inStr = c
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i
          case ',' if depth == 1 => splits += i
          case _ =>
        }
        i += 1
      }
      require(end > 0, s"unbalanced parens after $name(")
      val bounds = (open +: splits.toSeq) :+ end
      val args = bounds.sliding(2).map { case Seq(a, b) => s.substring(a + 1, b).trim }.toSeq
      Call(from + m.start, end + 1, args)
    }
  }

  /** Rewrite every `name(...)` call whose argument shape `f` accepts; a
    * call with an arity/shape `f` does not define is NOT this dialect's
    * construct — it stays verbatim for Spark's parser/analyzer to judge
    * (a raw MatchError here was the fuzz suite's first catch: `sumIf(x)`
    * must fail as an unresolved function, not corrupt the rewriter). */
  private def rewriteAll(s0: String, name: String)
      (f: PartialFunction[Seq[String], String]): String = {
    var s = s0
    var pos = 0
    var c = findCall(s, name, pos)
    while (c.isDefined) {
      val Call(st, en, args) = c.get
      f.lift(args) match {
        case Some(repl) =>
          s = s.substring(0, st) + repl + s.substring(en)
          pos = st + repl.length
        case None =>
          pos = en // leave the call untouched, scan past it
      }
      c = findCall(s, name, pos)
    }
    s
  }

  private def rewriteCombinators(s0: String): String = {
    var s = s0
    for (agg <- Seq("sum", "min", "max", "avg"))
      s = rewriteAll(s, s"${agg}If") { case Seq(x, cond) =>
        s"$agg(CASE WHEN $cond THEN $x END)"
      }
    s = rewriteAll(s, "countIf") {
      case Seq(cond) => s"count(CASE WHEN $cond THEN 1 END)"
      // 2-arg form counts the value under the condition (combinator `if`
      // wrapping count(x) — aggregate_combinator_if.rs)
      case Seq(x, cond) => s"count(CASE WHEN $cond THEN $x END)"
    }
    s = rewriteAll(s, "uniqIf") { case Seq(x, cond) =>
      s"count(DISTINCT CASE WHEN $cond THEN $x END)"
    }
    // distinct combinator (aggregate_combinator_distinct.rs): xDistinct(args)
    for (agg <- Seq("sum", "count", "avg", "min", "max"))
      s = rewriteAll(s, s"${agg}Distinct") { case args =>
        s"$agg(DISTINCT ${args.mkString(", ")})"
      }
    // uniq over a tuple = exact multi-column distinct count
    s = rewriteAll(s, "uniq") { case args => s"count(DISTINCT ${args.mkString(", ")})" }
    s = rewriteAll(s, "argMin") { case Seq(x, ord) => s"min_by($x, $ord)" }
    s = rewriteAll(s, "argMax") { case Seq(x, ord) => s"max_by($x, $ord)" }
    // `substring(x FOR n)` (no FROM) — reference desugars to from=1
    // (plan_parser.rs:919-940); Spark's parser needs the FROM. FOR/FROM
    // detection is string-mask-aware: a literal argument containing the
    // word "for" must not become the split point (the fuzz suite's catch —
    // substring('a FOR b' FOR 4) split inside the literal before this)
    s = rewriteAll(s, "substring") {
      case Seq(arg) if scopedMatches(arg, """(?i)\bfor\b""".r, topLevel = false).nonEmpty &&
          scopedMatches(arg, """(?i)\bfrom\b""".r, topLevel = false).isEmpty =>
        val m = scopedMatches(arg, """(?i)\bfor\b""".r, topLevel = false).head
        s"substring(${arg.substring(0, m.start).trim}, 1, ${arg.substring(m.end).trim})"
      case args => s"substring(${args.mkString(", ")})"
    }
    // toTypeName stays a function name — registered as a Catalyst expression
    // returning the REFERENCE's type names (HashExpressions.TypeName)
    // named casts (scalars/expressions/expression.rs:16-28); UInt widened per
    // SURVEY.md §1.2 (Spark has no unsigned ints)
    for ((name, t) <- Seq("toInt8" -> "TINYINT", "toInt16" -> "SMALLINT",
        "toInt32" -> "INT", "toInt64" -> "BIGINT",
        "toUInt8" -> "SMALLINT", "toUInt16" -> "INT", "toUInt32" -> "BIGINT",
        "toUInt64" -> "BIGINT", "toFloat32" -> "FLOAT", "toFloat64" -> "DOUBLE"))
      s = rewriteAll(s, name) { case Seq(x) => s"CAST($x AS $t)" }
    // context functions (udfs/database.rs; version()/current_database() are
    // Spark built-ins — database() just needs the name mapped)
    s = rewriteAll(s, "database") { case Seq("") => "current_database()" }
    s
  }
}

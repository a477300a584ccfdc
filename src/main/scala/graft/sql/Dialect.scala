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
      s = rewriteSystemTables(s)
      s = rewriteCombinators(s)
      s = rewriteLimitBy(s)
      s
    }
  }

  /** The reference defaults `nulls_first = true` for every sort direction
    * (plan_parser.rs:488); Spark's DESC default is nulls-LAST. Pin DESC
    * sorts to NULLS FIRST unless the query says otherwise (ASC already
    * matches). Applied outside string literals. */
  private def descNullsFirst(s: String): String =
    mapOutsideStrings(s, _.replaceAll("(?i)\\bDESC\\b(?!\\s+NULLS)", "DESC NULLS FIRST"))

  private def mapOutsideStrings(s: String, f: String => String): String =
    s.split("'", -1).zipWithIndex.map { case (p, i) =>
      if (i % 2 == 0) f(p) else p
    }.mkString("'")

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
    NumbersRe.replaceAllIn(s, m => s"(SELECT id AS number FROM range(${m.group(1)}))")

  // ---- system.x → system_x ------------------------------------------------
  private val SystemRe = """(?i)\bsystem\.(one|databases|tables|settings|functions|contributors|clusters|processes)\b""".r
  private def rewriteSystemTables(s: String): String =
    SystemRe.replaceAllIn(s, m => s"system_${m.group(1).toLowerCase}")

  // ---- LIMIT n BY k1, k2 [LIMIT m] ---------------------------------------
  // ClickHouse semantics: keep the first n rows per distinct key tuple, then
  // apply the plain LIMIT if present. "First" follows the query's ORDER BY
  // when given; otherwise per-group order is arbitrary (the reference
  // inherits nondeterministic stream order — we pin the key order).
  private val LimitByRe =
    """(?is)^(.*?)(?:\s+ORDER\s+BY\s+(.+?))?\s+LIMIT\s+(\d+)\s+BY\s+(.+?)(\s+LIMIT\s+\d+(?:\s+OFFSET\s+\d+)?)?\s*$""".r
  private def rewriteLimitBy(s: String): String = s match {
    case LimitByRe(body, orderBy, n, keys, outerLimit) =>
      val ord = Option(orderBy).map(_.trim).filter(_.nonEmpty)
      val winOrder = ord.getOrElse(keys.trim)
      val tail = Option(outerLimit).getOrElse("")
      val outerOrd = ord.map(o => s" ORDER BY $o").getOrElse("")
      s"""SELECT * EXCEPT (__rn) FROM (SELECT *, row_number() OVER (PARTITION BY ${keys.trim} ORDER BY $winOrder) AS __rn FROM ($body)) WHERE __rn <= $n$outerOrd$tail"""
    case _ => s
  }

  // ---- combinator-suffixed aggregates ------------------------------------
  // Paren-aware: find `name(`, scan to the matching close, split top-level
  // commas, respell. Handles nesting and string literals.
  private case class Call(start: Int, end: Int, args: Seq[String])

  private def findCall(s: String, name: String, from: Int): Option[Call] = {
    val re = s"""(?i)\\b$name\\s*\\(""".r
    re.findFirstMatchIn(s.substring(from)).map { m =>
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

  private def rewriteAll(s0: String, name: String)(f: Seq[String] => String): String = {
    var s = s0
    var pos = 0
    var c = findCall(s, name, pos)
    while (c.isDefined) {
      val Call(st, en, args) = c.get
      val repl = f(args)
      s = s.substring(0, st) + repl + s.substring(en)
      pos = st + repl.length
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
      s = rewriteAll(s, s"${agg}Distinct") { args =>
        s"$agg(DISTINCT ${args.mkString(", ")})"
      }
    // uniq over a tuple = exact multi-column distinct count
    s = rewriteAll(s, "uniq") { args => s"count(DISTINCT ${args.mkString(", ")})" }
    s = rewriteAll(s, "argMin") { case Seq(x, ord) => s"min_by($x, $ord)" }
    s = rewriteAll(s, "argMax") { case Seq(x, ord) => s"max_by($x, $ord)" }
    // `substring(x FOR n)` (no FROM) — reference desugars to from=1
    // (plan_parser.rs:919-940); Spark's parser needs the FROM
    s = rewriteAll(s, "substring") {
      case Seq(arg) if """(?i)\bfor\b""".r.findFirstIn(arg).isDefined &&
          """(?i)\bfrom\b""".r.findFirstIn(arg).isEmpty =>
        val Array(x, len) = arg.split("""(?i)\bfor\b""", 2)
        s"substring(${x.trim}, 1, ${len.trim})"
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

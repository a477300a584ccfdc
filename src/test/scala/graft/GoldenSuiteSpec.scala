package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSession

/** Runs the reference's end-to-end golden SQL suites
  * (tests/suites/0_stateless/NN_MMMM_name.{sql,result}) through GraftSession
  * and compares rendered output line-by-line against the reference's expected
  * stdout. Suite files are read AT TEST TIME from the read-only reference
  * checkout — nothing is copied into this repo.
  *
  * Statement protocol (tests/README.md): one statement per `;`, a trailing
  * `-- {ErrorCode N}` comment means the statement must error (and contributes
  * no output lines). Rendering mirrors the reference's MySQL-handler text
  * output: tab-separated columns, lowercase booleans, NULL, floats without a
  * trailing `.0` when integral.
  *
  * Statements whose semantics legitimately diverge (documented per entry) are
  * skipped together with the exact number of golden lines they produced.
  */
class GoldenSuiteSpec extends AnyFunSuite {
  private val suiteDir = "/root/reference/tests/suites/0_stateless"

  /** `stmt` is matched against the whitespace-collapsed statement text —
    * exactly, or as a prefix when it ends with `…` (one Skip entry can then
    * cover a family of statements, consuming `lines` golden lines PER
    * matched statement). */
  private case class Skip(stmt: String, lines: Int, reason: String)

  private def collapse(s: String): String = s.replaceAll("\\s+", " ").trim
  private def skipMatches(sk: Skip, sql: String): Boolean = {
    val (a, b) = (collapse(sk.stmt), collapse(sql))
    if (a.endsWith("…")) b.startsWith(a.dropRight(1).trim) else a == b
  }

  private val suites: Seq[(String, Seq[Skip])] = Seq(
    "00_0000_dummy_select_1" -> Seq(
      Skip("SELECT NOT(1)", 1,
        "Spark has no INT→BOOLEAN implicit cast for NOT (ClickHouse-ism)")),
    "01_0000_system_numbers" -> Nil,
    "01_0001_system_tables" -> Nil,
    "02_0000_function_arithmetic" -> Nil,
    "02_0002_function_cast" -> Seq(
      Skip("SELECT toTypeName(CAST(number AS float32)) FROM numbers_mt(1)", 1,
        "float32 is not a Spark cast target type name"),
      Skip("SELECT toTypeName(CAST(number AS UInt64)) FROM numbers_mt(1)", 1,
        "Spark has no unsigned ints (SURVEY §1.2: UInt64 widens to Int64)")),
    "02_0001_function_to_type_name" -> (Seq(
      Skip("select toTypeName(number) from numbers(100) limit 1", 1,
        "reference numbers() yields UInt64; Int64 here (SURVEY §1.2 widening)"),
      Skip("select toTypeName(number + 1), toTypeName(number - 1), " +
        "toTypeName(number / 1), toTypeName(number * 1) from numbers(100) limit 1", 1,
        "UInt64-family coercion names unreachable without unsigned ints")) ++
      Seq("UInt8", "UInt16", "UInt32", "UInt64").map(l =>
        Skip(s"select '$l OP …", 1,
          "unsigned-coercion golden rows (SURVEY §1.2: no unsigned ints in Spark)"))),
    "02_0003_function_database" -> Nil,
    "02_0004_function_name_display" -> Nil,
    "02_0005_function_compare" -> Nil,
    "02_0005_function_substring" -> Nil,
    "02_0006_function_argmin_argmax" -> Nil,
    "02_0007_function_aggreator_on_empty" -> Nil,
    "02_0009_function_siphash64" -> Nil,
    "03_0000_select_aliases" -> Nil,
    "03_0001_select_aggregator" -> Nil,
    "03_0002_select_aggregator_with_filter" -> Nil,
    "03_0003_select_group_by" -> Nil,
    "03_0004_select_order_by" -> Nil,
    "03_0005_select_filter" -> Nil,
    "03_0006_select_having" -> Nil,
    "03_0007_select_alias" -> Nil,
    "03_0008_select_aggregator_combinator" -> Nil,
    "03_0009_select_exists" -> Nil,
    "04_0000_explain" -> Nil,
    "04_0001_explain_pipeline" -> Nil,
    "05_0000_ddl_create_tables" -> Nil,
    "05_0000_ddl_drop_tables" -> Nil,
    "05_0001_ddl_create_database" -> Nil,
    "05_0001_ddl_drop_database" -> Nil,
    "05_0002_ddl_create_local_csv_table" -> Nil,
    "06_0000_show_queries" -> Nil,
    "07_0000_use_database" -> Nil,
    "08_0000_optimizer" -> Nil,
    "09_0000_remote_create_table" -> Nil,
    "09_0001_remote_insert" -> Seq(
      Skip("SELECT * FROM t1", 2,
        "reference's literal-only VALUES parser stores the raw quoted " +
          "token ('1', not 1) — its own .result pins the quirk; standard " +
          "INSERT semantics here (COVERAGE.md divergences; DialectSpec " +
          "pins the remote-engine insert round trip)")),
    "10_0000_describe_table" -> Nil,
  )
  // Not portable (documented): 02_0008 crashme aborts the server by design.
  // The 09_* suites run against the in-process store node (GraftSession
  // .store + the graft-remote connector) — the reference's distributed
  // build defaults bare CREATEs to the remote engine, reproduced here with
  // `SET default_engine = remote` scoped to those suites.

  private lazy val session: GraftSession = {
    // Isolated session emulating the reference dialect's semantics:
    //   - non-ANSI (the reference wraps/laxly casts; ANSI also turns bare
    //     `user` into current_user(), breaking `... AS user GROUP BY user`);
    //   - GROUP BY 1 is a literal (one group), not an ordinal;
    //   - HAVING without GROUP BY filters rows (transform_filter.rs's
    //     having=true over the unaggregated stream), not a global aggregate.
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.groupByOrdinal", "false")
    s.conf.set("spark.sql.legacy.parser.havingWithoutGroupByAsWhere", "true")
    // the reference server boots with databases default/system/local, and the
    // suite goldens include `for_test` left by the DDL suites' run order
    Seq("system", "local", "for_test").foreach(d =>
      s.sql(s"CREATE DATABASE IF NOT EXISTS $d"))
    new GraftSession(s)
  }

  private case class Stmt(sql: String, expectError: Boolean)

  private def parseSuite(path: String): Seq[Stmt] = {
    val out = scala.collection.mutable.ArrayBuffer[Stmt]()
    val buf = new StringBuilder
    var expectError = false
    Files.readAllLines(Paths.get(path)).asScala.foreach { line =>
      if (line.contains("-- {ErrorCode")) expectError = true
      val code = line.indexOf("--") match {
        case -1 => line
        case i => line.substring(0, i)
      }
      buf.append(code).append('\n')
      if (code.trim.endsWith(";")) {
        val sql = buf.toString.trim.stripSuffix(";").trim
        if (sql.nonEmpty) out += Stmt(sql, expectError)
        buf.clear(); expectError = false
      }
    }
    out.toSeq
  }

  private def render(v: Any): String = graft.sql.Render.value(v)

  private def runSuite(name: String, skips: Seq[Skip]): Unit = {
    // the reference harness opens a fresh connection per suite file, which
    // starts in the default database
    session.spark.catalog.setCurrentDatabase("default")
    // 09_* ran against the reference's distributed build, whose default
    // table engine is remote/fusestore; scope that default to these suites
    if (name.startsWith("09_")) session.sql("SET default_engine = remote")
    try runSuiteBody(name, skips)
    finally if (name.startsWith("09_")) session.sql("SET default_engine = local")
  }

  private def runSuiteBody(name: String, skips: Seq[Skip]): Unit = {
    val stmts = parseSuite(s"$suiteDir/$name.sql")
    val expected = Files.readAllLines(Paths.get(s"$suiteDir/$name.result")).asScala.toVector
    var pos = 0
    stmts.zipWithIndex.foreach { case (stmt, idx) =>
      skips.find(skipMatches(_, stmt.sql)) match {
        case Some(sk) =>
          pos += sk.lines // documented divergence — consume its golden lines
        case None if stmt.expectError =>
          val failed =
            try { session.sql(stmt.sql).collect(); false }
            catch { case _: Throwable => true }
          assert(failed, s"[$name #$idx] expected an error: ${stmt.sql}")
          // some goldens captured the client's ERROR line for the failing
          // statement (07_0000) — consume it; the text is engine-specific
          if (pos < expected.length && expected(pos).startsWith("ERROR ")) pos += 1
        case None if stmt.sql.toUpperCase.startsWith("EXPLAIN") =>
          // reference EXPLAIN goldens are its own plan text (one line with
          // \n escapes) — assert our EXPLAIN runs, skip text compare
          // (SURVEY.md §7.4: rewrite goldens, don't chase plan-text parity)
          session.sql(stmt.sql).collect()
          pos += 1
        case None =>
          // suite files address their data relative to the reference
          // checkout root (05_0002: location='tests/data/sample.csv')
          val sqlText = stmt.sql.replaceAll(
            "(?i)location\\s*=\\s*'(?!/)([^']+)'",
            "location = '/root/reference/$1'")
          val rows =
            try session.sql(sqlText).collect()
            catch { case e: Throwable =>
              fail(s"[$name #$idx] failed: ${stmt.sql}\n  ${e.getMessage}")
            }
          val lines = rows.map(r => (0 until r.length).map(i => render(r.get(i))).mkString("\t"))
          lines.zipWithIndex.foreach { case (got, li) =>
            assert(pos + li < expected.length,
              s"[$name #$idx] produced more lines than golden: ${stmt.sql}")
            assert(got == expected(pos + li),
              s"[$name #$idx] line ${li + 1} of ${stmt.sql}\n  got:    $got\n  golden: ${expected(pos + li)}")
          }
          pos += lines.length
      }
    }
    assert(pos == expected.length,
      s"[$name] consumed $pos of ${expected.length} golden lines")
  }

  suites.foreach { case (name, skips) =>
    test(s"golden suite $name") {
      assume(Files.exists(Paths.get(s"$suiteDir/$name.sql")), "reference checkout not present")
      runSuite(name, skips)
    }
  }
}

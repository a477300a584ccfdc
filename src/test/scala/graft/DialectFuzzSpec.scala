package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Dialect

/** Fuzz/property suite for the dialect layer — the analogue of the
  * reference's parser fuzz target (`fusequery/fuzz`, Cargo.toml:28). The
  * dialect rewrites are string→string over live SQL text, so the two
  * properties that must hold under ADVERSARIAL input are:
  *
  *   1. Quoted string literals are data, not syntax: a literal containing
  *      `LIMIT 3 BY k`, `numbers(9)`, `sumIf(`, `DESC`, `user`, doubled
  *      quotes… must come out of every rewrite byte-identical.
  *   2. Totality: any input — including unbalanced quotes/parens and
  *      random token soup — either rewrites to a string or throws a clean
  *      IllegalArgumentException; never hangs, never corrupts offsets into
  *      StringIndexOutOfBounds, never stack-overflows.
  *   3. Soundness on the happy path: every statement the dialect GRAMMAR
  *      generates must, after rewrite, be accepted by Spark's SQL parser
  *      (parse only — resolution needs live tables and is the oracle
  *      gate's job).
  *
  * ≥10k generated statements across the three properties per run.
  */
class DialectFuzzSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withMaxDiscardRatio(10), p)
    assert(res.passed, res.status.toString)
  }

  // --- generators -----------------------------------------------------------

  /** Content that ATTACKS the rewrites if ever treated as syntax. */
  private val adversarialContent: Gen[String] = Gen.oneOf(
    "LIMIT 3 BY k", " ORDER BY x DESC ", "numbers(9)", "numbers_mt(5)",
    "sumIf(v, v > 0)", "countIf(x)", "uniq(a, b)", "argMax(a, b)",
    "toInt32(x)", "substring(s FOR 3)", "system.tables", "user",
    "SHOW TABLES", "DESC", "LIMIT 5", "BY", "(", ")", ",", "((", "during",
    "'", "''", "\"", "a''b", "desc nulls", "OFFSET 2", "database()")

  private val marker = new java.util.concurrent.atomic.AtomicLong(0)

  /** A single-quoted literal wrapping adversarial content between unique
    * alphanumeric markers, with embedded quotes doubled per SQL rules. The
    * markers make each literal's occurrence count in a statement
    * unambiguous. */
  private val quotedLiteral: Gen[String] = for {
    content <- adversarialContent
    m = marker.incrementAndGet()
  } yield "'L" + m + "x " + content.replace("'", "''") + " y" + m + "R'"

  private val ident: Gen[String] =
    Gen.oneOf("k", "v", "a", "b", "x1", "t_lby", "grp", "val2")

  /** Well-formed statements from the dialect's own grammar surface. */
  private def statementWithLiterals: Gen[(String, Seq[String])] = for {
    lit1 <- quotedLiteral
    lit2 <- quotedLiteral
    c1 <- ident
    c2 <- ident
    n <- Gen.choose(1, 99)
    m <- Gen.choose(1, 9)
    useNumbers <- Gen.oneOf(true, false)
    agg <- Gen.oneOf(
      s"sumIf($c1, $c1 > 3)", s"countIf($c1 < 5)", s"uniq($c1)",
      s"argMax($c1, $c2)", s"toInt64($c1)", s"avgDistinct($c1)",
      s"substring($lit2 FOR 4)", s"min($c1)")
    src = if (useNumbers) s"numbers($n)" else "some_table"
    shape <- Gen.choose(0, 3)
  } yield {
    val stmt = shape match {
      case 0 =>
        (s"SELECT $c1, $agg, $lit1 AS tag FROM $src " +
          s"GROUP BY $c1, $lit1 ORDER BY $c1 DESC LIMIT $m",
          if (agg.contains(lit2)) Seq(lit1, lit1, lit2) else Seq(lit1, lit1))
      case 1 =>
        (s"SELECT $c1, $c2 FROM $src WHERE $c2 <> $lit1 LIMIT $m BY $c1",
          Seq(lit1))
      case 2 =>
        (s"SELECT $c1, $lit1 AS l1, $lit2 AS l2 FROM $src " +
          s"ORDER BY $c1 DESC LIMIT $m BY $c1, $c2 LIMIT $n OFFSET 1",
          Seq(lit1, lit2))
      case _ =>
        (s"SELECT $agg FROM $src WHERE $c1 = $lit1 OR $c2 = $lit1",
          if (agg.contains(lit2)) Seq(lit1, lit1, lit2) else Seq(lit1, lit1))
    }
    stmt
  }

  private def countOccurrences(hay: String, needle: String): Int = {
    var i = 0
    var n = 0
    while ({ i = hay.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
    n
  }

  // --- properties -----------------------------------------------------------

  test("rewrites never alter the bytes of quoted string literals (4k statements)") {
    check(Prop.forAll(statementWithLiterals) { case (stmt, lits) =>
      val out = Dialect.rewrite(stmt)
      lits.distinct.forall { l =>
        val want = lits.count(_ == l)
        val got = countOccurrences(out, l)
        if (got != want)
          println(s"LITERAL CORRUPTED: $l\n  in:  $stmt\n  out: $out")
        got == want
      }
    }, n = 4000)
  }

  test("every grammar-generated statement parses in Spark after rewrite (4k statements)") {
    val parser = TestSpark.spark.sessionState.sqlParser
    check(Prop.forAll(statementWithLiterals) { case (stmt, _) =>
      val out = Dialect.rewrite(stmt)
      try { parser.parsePlan(out); true }
      catch { case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        println(s"REWRITE UNPARSEABLE:\n  in:  $stmt\n  out: $out\n  err: ${e.getMessage.linesIterator.next()}")
        false
      }
    }, n = 4000)
  }

  test("rewrite is total on token soup: returns or throws IllegalArgumentException (4k statements)") {
    val token: Gen[String] = Gen.oneOf(
      "SELECT", "FROM", "LIMIT", "BY", "ORDER", "DESC", "numbers(", ")",
      "(", "'", "''", "\"", ",", "sumIf(", "uniq(", "argMin(", "user",
      "system.tables", "1", "x", "substring(", "FOR", "OFFSET", ";", " ")
    val soup: Gen[String] = Gen.listOfN(12, token).map(_.mkString(" "))
    check(Prop.forAll(soup) { s =>
      try { Dialect.rewrite(s); true }
      catch {
        case _: IllegalArgumentException => true // findCall's unbalanced-paren require
        case e: Throwable =>
          println(s"UNCLEAN FAILURE on <$s>: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    }, n = 4000)
  }

  test("rewrite of a literal-only statement is the identity on the literal even with doubled quotes") {
    // the '' escape is where a naive mask desyncs — pin it exactly
    val s = "SELECT 'it''s a LIMIT 2 BY trap numbers(3) sumIf(' AS c FROM t"
    val out = Dialect.rewrite(s)
    assert(out.contains("'it''s a LIMIT 2 BY trap numbers(3) sumIf('"), out)
  }
}

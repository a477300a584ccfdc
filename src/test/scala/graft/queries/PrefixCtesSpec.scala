package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the prefixCtes rename guards (pure string logic, no Spark).
  * Round-11 ADVICE: the single inside-quotes regex treated a closing quote
  * as an opening one, so a CTE name BETWEEN two string literals was
  * spuriously refused as "inside a literal" — the guard is now
  * parity-based (odd split-on-quote segments are literal interiors). */
class PrefixCtesSpec extends AnyFunSuite {

  test("renames every header and reference") {
    val chain = "seg AS (SELECT 1 AS x), agg AS (SELECT x FROM seg)"
    val out = PipelineOps.prefixCtes(chain, "p_")
    assert(out.contains("p_seg AS (") && out.contains("p_agg AS ("))
    assert(out.contains("FROM p_seg"))
    assert(!"\\bseg\\b".r.findFirstIn(out).isDefined)
  }

  test("a CTE name BETWEEN two literals is legal (not a false inside-literal hit)") {
    val chain = "seg AS (SELECT 'a' AS lo, t.x, 'b' AS hi FROM t), " +
      "agg AS (SELECT lo, x FROM seg)"
    val out = PipelineOps.prefixCtes(chain, "p_")
    assert(out.contains("FROM p_seg"))
    assert(out.contains("'a'") && out.contains("'b'"), "literals untouched")
  }

  test("a CTE name genuinely inside a literal is refused") {
    val chain = "seg AS (SELECT 'seg' AS s FROM t)"
    val e = intercept[IllegalArgumentException](PipelineOps.prefixCtes(chain, "p_"))
    assert(e.getMessage.contains("string literal"))
  }

  test("a doubled '' escape does not desync the parity scan") {
    // 'it''s x' is ONE literal; the CTE reference after it is unquoted SQL
    val chain = "seg AS (SELECT 'it''s x' AS lit FROM t), agg AS (SELECT lit FROM seg)"
    val out = PipelineOps.prefixCtes(chain, "p_")
    assert(out.contains("FROM p_seg") && out.contains("'it''s x'"))
  }

  test("a CTE name reused as a column alias is refused") {
    val chain = "seg AS (SELECT 1 AS seg FROM t)"
    val e = intercept[IllegalArgumentException](PipelineOps.prefixCtes(chain, "p_"))
    assert(e.getMessage.contains("column alias"))
  }
}

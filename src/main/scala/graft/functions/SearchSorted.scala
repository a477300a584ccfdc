package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bucket rank of a value against a sorted boundary array (numpy
  * `searchsorted` / C++ `upper_bound`): the count of boundaries ≤ value,
  * i.e. values below the first boundary rank 0 and values ≥ the last rank
  * `bounds.length`.
  *
  * This is the scale-true replacement for a global `ntile(B)` rank pass:
  * the boundaries come from a sampled quantile sketch (one bounded-memory
  * pass, no shuffle), ride into the expression as a literal array, and each
  * row ranks itself with an O(log B) binary search inside whole-stage
  * codegen — no window, no single-task sort, no state. Used by
  * [[graft.tables.Layout.writeZOrdered]].
  */
case class SearchSorted(child: Expression, bounds: Array[Double]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "search_sorted"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"search_sorted needs a double child, got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    // upper_bound: first index with bounds(i) > v
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $b.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($b[$mid] <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSorted =
    copy(child = newChild)
}

object SearchSorted {
  import org.apache.spark.sql.graft.Bridge
  def searchSorted(v: Column, bounds: Array[Double]): Column =
    Bridge.column(SearchSorted(Bridge.expression(v.cast("double")), bounds))
}

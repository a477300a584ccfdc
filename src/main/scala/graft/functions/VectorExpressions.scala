package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector kernels for `array<float>` / `array<double>`
  * embedding columns.
  *
  * The higher-order-function spelling (`aggregate(zip_with(...))`) is
  * semantically right but materializes several intermediate arrays per row —
  * inside an all-pairs or candidate join that's per-PAIR allocation, which is
  * the difference between scan-speed and minutes-per-million-pairs. This
  * expression is a tight primitive loop over `ArrayData`, no allocation,
  * fused into whole-stage codegen.
  *
  * Accumulation is sequential in double (element i in order), bit-identical
  * to the HOF spelling and to the DuckDB oracle's `list_sum(list_transform)`
  * — required for the driver's hash-compare on rounded results.
  *
  * NULL semantics: a NULL array yields NULL (null-safe eval); a NULL
  * ELEMENT contributes 0.0 (embedding vectors are dense by contract; the
  * parquet schema technically allows element nulls, and treating them as
  * zero matches the oracle's `CAST(e[i] AS DOUBLE)` on absent positions).
  * MISMATCHED lengths yield NULL rather than a silently-truncated dot —
  * a corrupt/short embedding must not produce a plausible-but-wrong
  * similarity (reference-style strict argument checking).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // nullable even over non-null children: length mismatch yields NULL
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two array<float|double>, got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $x.$xGet($i) * (double) $y.$yGet($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.Bridge
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}

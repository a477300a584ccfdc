package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Nearest-centroid assignment over a quantized `array<long>` vector:
  * returns `struct(d, c)` = (squared L2 distance, cell index) of the
  * closest of `k` centroids, ties to the LOWEST cell — exactly the
  * `array_min(array(struct(sqDist, i)...))` literal spelling the k-means
  * paths use, but as ONE tight codegen'd loop over a referenced flat
  * centroid array. The literal spelling unrolls k·dim constants into the
  * expression tree, which is fine at k ≤ 32 and a codegen/analysis
  * pathology past it (k=313 measured 41 s on a 20k-vector Lloyd round;
  * this kernel brings the same round to scan speed) — and k MUST grow
  * with the corpus for SemDedup-style blocking (semDedupClustersFor).
  *
  * NULL semantics: NULL vector → NULL; length ≠ dim → NULL; a NULL
  * ELEMENT → NULL (a corrupt embedding must not land in a plausible
  * cell — and the literal struct-min spelling propagates element nulls
  * to a null distance, so yielding NULL here keeps the k-threshold
  * dispatch a pure performance switch). Distances accumulate in
  * raw long arithmetic — bounded by quant² · dim, overflow-free for the
  * quant=1e6, dim ≤ 4096 envelope (4·10¹²·dim < 2⁶³). */
case class NearestCell(child: Expression, cents: Array[Long], dim: Int)
    extends UnaryExpression {
  require(dim > 0 && cents.length % dim == 0,
    s"nearest_cell: ${cents.length} centroid longs not a multiple of dim=$dim")
  private val k = cents.length / dim

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell needs array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var j0 = 0
    while (j0 < dim) {
      if (v.isNullAt(j0)) return null
      j0 += 1
    }
    var bestD = Long.MaxValue
    var bestC = -1L
    var i = 0
    while (i < k) {
      var d = 0L
      val off = i * dim
      var j = 0
      while (j < dim) {
        val t = v.getLong(j) - cents(off + j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; bestC = i.toLong }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD, bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val off = ctx.freshName("off")
      val nj = ctx.freshName("nj")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean ${nj}hasNull = false;
         |  for (int $nj = 0; $nj < $dim; $nj++) {
         |    if ($v.isNullAt($nj)) { ${nj}hasNull = true; break; }
         |  }
         |  if (${nj}hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |  long $bestD = Long.MAX_VALUE;
         |  long $bestC = -1L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $d = 0L;
         |    int $off = $i * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      long $t = $v.getLong($j) - $centsRef[$off + $j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestC = (long) $i; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Long.valueOf($bestD), java.lang.Long.valueOf($bestC)});
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.Bridge
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def nearestCell(v: Column, cents: Array[Seq[Long]]): Column = {
    require(cents.nonEmpty && cents.map(_.length).distinct.length == 1,
      "nearest_cell: centroids must be non-empty and same-dimension")
    Bridge.column(NearestCell(Bridge.expression(v),
      cents.flatten.toArray, cents.head.length))
  }
}

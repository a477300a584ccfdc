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

/** Exact nearest-centroid assignment with triangle-inequality pruning —
  * the large-k path ([[NearestCell]] is the flat loop). The flat kernel is
  * n·k·dim work; with k scaling ∝ corpus ([[graft.ext.Similarity.semDedupClustersFor]])
  * that term turns the whole assignment n^1.5-ish. Here the centroids are
  * pre-grouped under `g ≈ √k` COARSE centers (a driver-side Lloyd over the
  * centroids themselves); per row: all g coarse distances (g·dim work),
  * then fine groups visit in ascending conservative lower bound
  * `lb = max(0, floor(√d²(v,coarse)) − ceil(r_group))²` (r = the group's
  * max member distance, integer-rounded OUTWARD so float √ can only make
  * the bound safer) and the scan STOPS when the next group's bound
  * exceeds the best exact distance found. Typical work per row:
  * O((√k + occupied-groups·√k)·dim) ≪ k·dim.
  *
  * EXACT, not approximate: pruning uses strict `lb > bestD`, so any cell
  * that could tie the current best is still visited, and the update rule
  * `(d < bestD) || (d == bestD && c < bestC)` preserves the lowest-cell
  * tie-break bit-for-bit — property-pinned against [[NearestCell]] (which
  * is itself pinned against the literal spelling). Same NULL semantics. */
case class NearestCellPruned(child: Expression, cents: Array[Long], dim: Int,
    groupOf: Array[Int], coarse: Array[Long], radii: Array[Long])
    extends UnaryExpression {
  require(dim > 0 && cents.length % dim == 0 && coarse.length % dim == 0,
    "nearest_cell_pruned: centroid/coarse arrays must be dim-multiples")
  private val k = cents.length / dim
  private val g = coarse.length / dim
  require(groupOf.length == k && radii.length == g,
    "nearest_cell_pruned: groupOf/radii sizes must match k/g")

  // members of each group, contiguous: memberIdx sorted by (group, cell) —
  // ascending cell WITHIN a group, so the lowest-tie rule sees cells in
  // index order inside each group
  private val (memberStart, memberIdx) = {
    val byGroup = Array.fill(g)(scala.collection.mutable.ArrayBuffer.empty[Int])
    groupOf.zipWithIndex.foreach { case (grp, c) => byGroup(grp) += c }
    val starts = new Array[Int](g + 1)
    val idx = new Array[Int](k)
    var pos = 0
    var i = 0
    while (i < g) {
      starts(i) = pos
      byGroup(i).foreach { c => idx(pos) = c; pos += 1 }
      i += 1
    }
    starts(g) = pos
    (starts, idx)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell_pruned"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell_pruned needs array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vv = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      vv(j) = v.getLong(j)
      j += 1
    }
    val r = NearestCellPruned.search(vv, cents, dim, g, coarse, radii,
      memberStart, memberIdx)
    org.apache.spark.sql.catalyst.InternalRow(r(0), r(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[]")
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "long[]")
    val radiiRef = ctx.addReferenceObj("radii", radii, "long[]")
    val msRef = ctx.addReferenceObj("memberStart", memberStart, "int[]")
    val miRef = ctx.addReferenceObj("memberIdx", memberIdx, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vv = ctx.freshName("vv")
      val j = ctx.freshName("j")
      val bad = ctx.freshName("bad")
      val res = ctx.freshName("res")
      s"""
         |boolean $bad = ($v.numElements() != $dim);
         |long[] $vv = null;
         |if (!$bad) {
         |  $vv = new long[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $bad = true; break; }
         |    $vv[$j] = $v.getLong($j);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $res = graft.functions.NearestCellPruned.search(
         |    $vv, $centsRef, $dim, ${g}, $coarseRef, $radiiRef, $msRef, $miRef);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Long.valueOf($res[0]), java.lang.Long.valueOf($res[1])});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellPruned =
    copy(child = newChild)
}

object NearestCellPruned {
  /** The shared search kernel (called from both eval and generated code —
    * one static JIT-hot method instead of duplicated codegen text).
    * Returns Array(bestD, bestC). */
  def search(v: Array[Long], cents: Array[Long], dim: Int, g: Int,
      coarse: Array[Long], radii: Array[Long],
      memberStart: Array[Int], memberIdx: Array[Int]): Array[Long] = {
    // coarse distances + conservative lower bounds per group
    val lb = new Array[Long](g)
    val order = new Array[Int](g)
    var gi = 0
    while (gi < g) {
      var d = 0L
      val off = gi * dim
      var j = 0
      while (j < dim) {
        val t = v(j) - coarse(off + j)
        d += t * t
        j += 1
      }
      // floor(sqrt(d)) with integer correction: Math.sqrt is within 1 ulp,
      // nudge down then step up — sq never overestimates
      var s = math.sqrt(d.toDouble).toLong - 2
      if (s < 0) s = 0
      while ((s + 1) * (s + 1) <= d) s += 1
      val m = s - radii(gi) // radii are ceil'd outward at build time
      lb(gi) = if (m <= 0) 0L else m * m
      order(gi) = gi
      gi += 1
    }
    // insertion sort groups by (lb, group) — g ≈ √k is small
    var a = 1
    while (a < g) {
      val og = order(a)
      val key = lb(og)
      var b = a - 1
      while (b >= 0 && (lb(order(b)) > key ||
        (lb(order(b)) == key && order(b) > og))) {
        order(b + 1) = order(b)
        b -= 1
      }
      order(b + 1) = og
      a += 1
    }
    var bestD = Long.MaxValue
    var bestC = -1L
    var oi = 0
    while (oi < g && lb(order(oi)) <= bestD) { // <=: ties must be visited
      val grp = order(oi)
      var mi = memberStart(grp)
      val end = memberStart(grp + 1)
      while (mi < end) {
        val c = memberIdx(mi)
        var d = 0L
        val off = c * dim
        var j = 0
        while (j < dim) {
          val t = v(j) - cents(off + j)
          d += t * t
          j += 1
        }
        if (d < bestD || (d == bestD && c < bestC)) { bestD = d; bestC = c.toLong }
        mi += 1
      }
      oi += 1
    }
    Array(bestD, bestC)
  }

  /** Build the coarse structure over the CENTROIDS (driver-side, k rows):
    * g = ceil(√k) coarse centers via a few Lloyd rounds seeded with every
    * √k-th centroid, members assigned to their nearest coarse center,
    * radii = ceil(√(max member distance²)) per group (outward — the bound
    * stays conservative against the kernel's floored √). */
  def build(cents: Array[Seq[Long]]): (Array[Int], Array[Long], Array[Long]) = {
    val k = cents.length
    val dim = cents.head.length
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    def d2(a: Seq[Long], b: Array[Long]): Long = {
      var d = 0L
      var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    var coarse: Array[Array[Long]] =
      // i.toLong: i * k reaches k^1.5 with g = sqrt(k) — Int wraps past
      // k ~ 1.7M, which is exactly the large-k regime this class serves
      Array.tabulate(g)(i => cents(math.min(k - 1, (i.toLong * k / g).toInt)).toArray)
    var groupOf = new Array[Int](k)
    var round = 0
    while (round < 4) { // few Lloyd rounds over k points: cheap, driver-side
      var c = 0
      while (c < k) {
        var best = 0L
        var bestG = -1
        var gg = 0
        while (gg < g) {
          val d = d2(cents(c), coarse(gg))
          if (bestG < 0 || d < best) { best = d; bestG = gg }
          gg += 1
        }
        groupOf(c) = bestG
        c += 1
      }
      val sums = Array.fill(g)(new Array[Long](dim))
      val cnt = new Array[Long](g)
      var c2 = 0
      while (c2 < k) {
        val grp = groupOf(c2)
        cnt(grp) += 1
        var j = 0
        while (j < dim) { sums(grp)(j) += cents(c2)(j); j += 1 }
        c2 += 1
      }
      coarse = Array.tabulate(g)(gg =>
        if (cnt(gg) == 0) coarse(gg)
        else sums(gg).map(x => Math.floorDiv(x, cnt(gg))))
      round += 1
    }
    val radii = new Array[Long](g)
    var c3 = 0
    while (c3 < k) {
      val grp = groupOf(c3)
      val r = math.ceil(math.sqrt(d2(cents(c3), coarse(grp)).toDouble)).toLong + 1
      if (r > radii(grp)) radii(grp) = r
      c3 += 1
    }
    (groupOf, coarse.flatten, radii)
  }
}

/** Nearest centroid where the candidate set arrives as a COLUMN — a flat
  * `array<long>` of `k·dim` longs riding in the row — instead of a driver
  * literal. This is the unbounded-k building block: [[NearestCell]] /
  * [[NearestCellPruned]] reference one driver-held array, which caps k at
  * what a single JVM (and every executor, via the broadcast) can hold;
  * here the centroid payload is DATA, so a join keyed by coarse group
  * distributes it — each task holds only ITS groups' centroids
  * ([[graft.ext.Similarity.hierarchicalAssignQ]]).
  *
  * Returns `struct(d, c)` with `c` the LOCAL 0-based candidate index (the
  * caller maps it through its parallel cell-id array), ties to the lowest
  * index — the same (d, c) struct-min contract as the literal kernels.
  *
  * NULL when: either array is NULL, any element is NULL, the vector is
  * empty, or the flat length is not a positive multiple of the vector
  * length (a torn centroid pack must not yield a plausible cell). */
case class NearestInFlat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("c", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_in_flat"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_in_flat needs (array<bigint>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val f = b.asInstanceOf[ArrayData]
    val res = NearestInFlat.search(v, f)
    if (res == null) null
    else org.apache.spark.sql.catalyst.InternalRow(res(0), res(1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, f) => {
      val res = ctx.freshName("res")
      s"""
         |long[] $res = graft.functions.NearestInFlat.search($v, $f);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Long.valueOf($res[0]), java.lang.Long.valueOf($res[1])});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestInFlat = copy(left = newLeft, right = newRight)
}

object NearestInFlat {
  /** Shared search kernel (eval + generated code): argmin over the packed
    * candidates, ties to the lowest index; null (as Java null) on any
    * malformed input per the expression contract. */
  def search(v: ArrayData, f: ArrayData): Array[Long] = {
    val dim = v.numElements()
    val fn = f.numElements()
    if (dim == 0 || fn == 0 || fn % dim != 0) return null
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      j += 1
    }
    var i = 0
    while (i < fn) {
      if (f.isNullAt(i)) return null
      i += 1
    }
    val k = fn / dim
    var bestD = Long.MaxValue
    var bestC = -1L
    var c = 0
    while (c < k) {
      var d = 0L
      val off = c * dim
      var jj = 0
      while (jj < dim) {
        val t = v.getLong(jj) - f.getLong(off + jj)
        d += t * t
        jj += 1
      }
      if (d < bestD) { bestD = d; bestC = c.toLong }
      c += 1
    }
    Array(bestD, bestC)
  }
}

object VectorExpressions {
  import org.apache.spark.sql.graft.Bridge
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def nearestInFlat(v: Column, flat: Column): Column =
    Bridge.column(NearestInFlat(Bridge.expression(v), Bridge.expression(flat)))
  def nearestCell(v: Column, cents: Array[Seq[Long]]): Column = {
    require(cents.nonEmpty && cents.map(_.length).distinct.length == 1,
      "nearest_cell: centroids must be non-empty and same-dimension")
    Bridge.column(NearestCell(Bridge.expression(v),
      cents.flatten.toArray, cents.head.length))
  }
  def nearestCellPruned(v: Column, cents: Array[Seq[Long]]): Column = {
    require(cents.nonEmpty && cents.map(_.length).distinct.length == 1,
      "nearest_cell_pruned: centroids must be non-empty and same-dimension")
    val (groupOf, coarse, radii) = NearestCellPruned.build(cents)
    Bridge.column(NearestCellPruned(Bridge.expression(v),
      cents.flatten.toArray, cents.head.length, groupOf, coarse, radii))
  }
}

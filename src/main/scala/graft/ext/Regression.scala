package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Closed-form least-squares fitting of a small linear model over
  * corpus-scale integer features — the "train a quality/length probe on the
  * whole corpus" operator, done the way a 100 TB corpus allows: ONE
  * aggregation pass builds the d×d Gram matrix and the d-vector X·y (d²+d+1
  * numbers to the driver, independent of corpus size), and the normal
  * equations solve by Cramer's rule in EXACT BigInt arithmetic — no learning
  * rate, no convergence loop, no RNG, and bit-identical answers on any
  * cluster layout. The same construction under iterative training lives in
  * [[Similarity.lloydCentroidsQ]] (k-means) — this is its supervised,
  * non-iterative sibling.
  *
  * Weights surface as ppm integers ⌊10⁶·det(Aⱼ)/det(A)⌋ with
  * truncation-toward-zero division, which DuckDB's HUGEINT `//` mirrors
  * exactly — the full fit sits under the SQL oracle gate (q172).
  *
  * Scale notes: feature/label values must keep per-row products inside
  * Long (|x·y| < 2⁶³ — ANSI mode throws on violation rather than wrapping);
  * the SUMS accumulate as decimal(38,0), so row count never overflows.
  */
object Regression {

  /** Exact determinant by cofactor expansion — d ≤ 4 keeps it trivial and
    * the BigInt arithmetic makes it exact at any magnitude. */
  private[graft] def det(m: Vector[Vector[BigInt]]): BigInt =
    if (m.size == 1) m(0)(0)
    else (m(0).indices).map { j =>
      val minor = m.tail.map(r => r.patch(j, Nil, 1))
      val sign = if (j % 2 == 0) BigInt(1) else BigInt(-1)
      sign * m(0)(j) * det(minor)
    }.sum

  /** Fit y ≈ Σⱼ wⱼ·xⱼ by exact integer normal equations.
    *
    * `features` are (name, integer column) pairs — include `lit(1L)` for an
    * intercept. Returns a ONE-ROW DataFrame: `n` plus one `w_<name>_ppm`
    * BIGINT per feature (⌊10⁶·wⱼ⌋, truncated toward zero). Throws when the
    * Gram matrix is singular (collinear features) — a silent pseudo-inverse
    * would hide a modeling bug. */
  def fitLinearPpm(spark: SparkSession, df: DataFrame,
      features: Seq[(String, Column)], label: Column): DataFrame = {
    val d = features.size
    require(d >= 1 && d <= 4, s"fitLinearPpm supports 1-4 features, got $d")
    val xs = features.map(_._2.cast("long"))
    val y = label.cast("long")
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    val aggs =
      (for (i <- 0 until d; j <- i until d)
        yield dec(xs(i) * xs(j)).as(s"g_${i}_$j")) ++
        (0 until d).map(i => dec(xs(i) * y).as(s"b_$i")) :+
        count(lit(1)).as("n")
    // d²+d+1 numbers — a bounded, corpus-size-independent collect
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def big(name: String): BigInt =
      BigInt(row.getAs[java.math.BigDecimal](name).toBigIntegerExact)
    val gram = Vector.tabulate(d, d) { (i, j) =>
      big(s"g_${math.min(i, j)}_${math.max(i, j)}")
    }
    val b = Vector.tabulate(d)(i => big(s"b_$i"))
    val detA = det(gram)
    require(detA != 0, "fitLinearPpm: singular Gram matrix (collinear features)")
    val wPpm = (0 until d).map { j =>
      // Cramer: column j of the Gram matrix replaced by the X·y vector
      val replaced = Vector.tabulate(d, d)((r, c) => if (c == j) b(r) else gram(r)(c))
      val w = (BigInt(1000000) * det(replaced)) / detA // trunc-toward-zero — DuckDB `//`
      require(w.isValidLong, s"fitLinearPpm: weight $j overflows Long ppm")
      w.toLong
    }
    val names = "n" +: features.map { case (nm, _) => s"w_${nm}_ppm" }
    spark.createDataFrame(Seq(Tuple1(0)))
      .select(
        (lit(row.getAs[Long]("n")).as("n") +:
          wPpm.zip(features).map { case (w, (nm, _)) => lit(w).as(s"w_${nm}_ppm") }): _*)
      .select(names.map(col): _*)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Closed-form least-squares fitting of small linear models over
  * corpus-scale integer features — the "train a quality/length probe on the
  * whole corpus" operator, done the way a 100 TB corpus allows: ONE
  * aggregation pass builds the d×d Gram matrix and the d-vector X·y (d²+d+1
  * numbers to the driver, independent of corpus size), and the normal
  * equations solve by Cramer's rule in EXACT BigInt arithmetic — no learning
  * rate, no convergence loop, no RNG, and bit-identical answers on any
  * cluster layout. The same construction under iterative training lives in
  * [[Similarity.lloydCentroidsQ]] (k-means) — this is its supervised,
  * non-iterative sibling. [[fitLinearPpmByGroup]] trains one model PER
  * GROUP (per language / domain / source) in the same single pass — the
  * driver solves |groups|·O(d³), bounded by group cardinality, never by
  * corpus size.
  *
  * Weights surface as ppm integers ⌊10⁶·det(Aⱼ)/det(A)⌋ with
  * truncation-toward-zero division, which DuckDB's HUGEINT `//` mirrors
  * exactly — the full fit sits under the SQL oracle gate (q172, q174).
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

  /** Rows where EVERY feature and the label are non-null — the only rows
    * that can enter the moments consistently (`sum` skips NULL products
    * while `count` would not, which would mix moments over different row
    * subsets into silently wrong weights). Both fit entry points filter on
    * this and report `n` = rows actually fitted. */
  private def nonNullRows(features: Seq[(String, Column)], label: Column): Column =
    (features.map(_._2) :+ label).map(_.isNotNull).reduce(_ && _)

  /** The Gram/moment aggregates for `features` against `label`: upper
    * triangle of X'X, the X'y vector, and the row count — d²+d+1 columns. */
  private def gramAggs(features: Seq[(String, Column)], label: Column): Seq[Column] = {
    val d = features.size
    val xs = features.map(_._2.cast("long"))
    val y = label.cast("long")
    def dec(c: Column): Column = sum(c.cast("decimal(38,0)"))
    (for (i <- 0 until d; j <- i until d)
      yield dec(xs(i) * xs(j)).as(s"g_${i}_$j")) ++
      (0 until d).map(i => dec(xs(i) * y).as(s"b_$i")) :+
      count(lit(1)).as("n")
  }

  /** Cramer solve from one collected aggregate row: (n, Some(ppm weights)),
    * or (n, None) when the Gram matrix is singular. */
  private def solvePpm(row: Row, d: Int): (Long, Option[Seq[Long]]) = {
    // empty input: the decimal sums are NULL — report (0, singular) instead
    // of tripping over them (fitLinearPpm turns that into a clear throw).
    // The null-row filter upstream makes non-empty sums non-null; a guard
    // over the MOMENT fields (never e.g. a legitimately-null group key)
    // keeps a future caller's unfiltered row from NPE-ing anyway.
    val momentNames =
      (for (i <- 0 until d; j <- i until d) yield s"g_${i}_$j") ++
        (0 until d).map(i => s"b_$i")
    if (row.getAs[Long]("n") == 0L ||
      momentNames.exists(nm => row.isNullAt(row.fieldIndex(nm))))
      return (row.getAs[Long]("n"), None)
    def big(name: String): BigInt =
      BigInt(row.getAs[java.math.BigDecimal](name).toBigIntegerExact)
    val gram = Vector.tabulate(d, d) { (i, j) =>
      big(s"g_${math.min(i, j)}_${math.max(i, j)}")
    }
    val b = Vector.tabulate(d)(i => big(s"b_$i"))
    val detA = det(gram)
    val n = row.getAs[Long]("n")
    if (detA == 0) (n, None)
    else (n, Some((0 until d).map { j =>
      // Cramer: column j of the Gram matrix replaced by the X·y vector
      val replaced = Vector.tabulate(d, d)((r, c) => if (c == j) b(r) else gram(r)(c))
      val w = (BigInt(1000000) * det(replaced)) / detA // trunc-toward-zero — DuckDB `//`
      require(w.isValidLong, s"fitLinearPpm: weight $j overflows Long ppm")
      w.toLong
    }))
  }

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
    val aggs = gramAggs(features, label)
    // d²+d+1 numbers — a bounded, corpus-size-independent collect
    val row = df.filter(nonNullRows(features, label))
      .agg(aggs.head, aggs.tail: _*).collect()(0)
    val (n, ws) = solvePpm(row, d)
    val wPpm = ws.getOrElse(throw new IllegalArgumentException(
      if (n == 0) "fitLinearPpm: empty input"
      else "fitLinearPpm: singular Gram matrix (collinear features)"))
    spark.createDataFrame(Seq(Tuple1(0)))
      .select(
        (lit(n).as("n") +:
          wPpm.zip(features).map { case (w, (nm, _)) => lit(w).as(s"w_${nm}_ppm") }): _*)
  }

  /** Driver-side convenience: the fitted ppm weights as (name → ppm). */
  def fitWeights(spark: SparkSession, df: DataFrame,
      features: Seq[(String, Column)], label: Column): Seq[(String, Long)] = {
    val one = fitLinearPpm(spark, df, features, label).collect()(0)
    features.map { case (nm, _) => nm -> one.getAs[Long](s"w_${nm}_ppm") }
  }

  /** One model PER GROUP in a single pass: the Gram aggregation runs
    * `groupBy(group)` (one shuffle keyed by group — the same cost as any
    * per-group rollup), the driver solves |groups| tiny systems. Groups
    * whose Gram matrix is singular (constant features, < d distinct
    * points) get NULL weights rather than failing the fleet — a per-domain
    * training run must survive degenerate domains. Output: (grp, n,
    * w_<name>_ppm …), one row per group. */
  def fitLinearPpmByGroup(spark: SparkSession, df: DataFrame, group: Column,
      features: Seq[(String, Column)], label: Column): DataFrame = {
    val d = features.size
    require(d >= 1 && d <= 4, s"fitLinearPpmByGroup supports 1-4 features, got $d")
    val aggs = gramAggs(features, label)
    // bounded by GROUP cardinality (languages/sources/domains), not corpus.
    // NULL group KEYS survive (they train their own "null" model — dirty
    // keys must not kill the fleet); null-FEATURE rows are excluded like
    // the global fit.
    val rows = df.filter(nonNullRows(features, label))
      .groupBy(group.cast("string").as("grp"))
      .agg(aggs.head, aggs.tail: _*).collect().toSeq
    val out = rows.map { row =>
      val (n, ws) = solvePpm(row, d)
      Row.fromSeq(row.getAs[String]("grp") +: n +:
        (ws match {
          case Some(w) => w
          case None => Seq.fill[Any](d)(null)
        }))
    }
    val schema = StructType(
      StructField("grp", StringType, nullable = true) +:
        StructField("n", LongType, nullable = false) +:
        features.map { case (nm, _) =>
          StructField(s"w_${nm}_ppm", LongType, nullable = true)
        })
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }
}

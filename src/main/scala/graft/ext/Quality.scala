package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.idiv

/** Dataset-quality gates for training-data pipelines: a declarative
  * constraint-audit suite (the Deequ/Great-Expectations shape — Schelter et
  * al., VLDB'18 "Automating Large-Scale Data Quality Verification" — a
  * public-knowledge construction) and inter-annotator agreement (Cohen's
  * kappa, Cohen 1960) for labeled-data QA.
  *
  * Both operators are exact-integer (ppm metrics, no floats in the result)
  * so every number is cross-engine mirrorable. Shapes are 100 TB-safe:
  * the row-wise constraints fold into ONE aggregation pass over the table
  * (conditional sums — adding a constraint adds a column, not a scan);
  * uniqueness adds one distinct aggregate; each foreign-key constraint is
  * one left-anti count against its reference table (broadcast while the
  * reference is dimension-sized, shuffled hash join past that — AQE's
  * call). Kappa's confusion matrix is one (labelA, labelB)-keyed two-phase
  * hash aggregation; everything after runs on the |classes|²-sized relation.
  */
object Quality {

  /** One declarative expectation over a table. `name` keys the result row. */
  sealed trait Constraint { def name: String }

  /** Column is non-null in at least `minPpm` of rows (default: all). */
  final case class Complete(name: String, col: Column,
      minPpm: Long = 1000000L) extends Constraint

  /** The column tuple has no duplicate non-null values (candidate key). */
  final case class Unique(name: String, cols: Seq[Column]) extends Constraint

  /** Non-null values fall in the closed interval [lo, hi]. */
  final case class InRange(name: String, col: Column, lo: Column,
      hi: Column) extends Constraint

  /** Non-null values come from the given finite domain. */
  final case class InSet(name: String, col: Column,
      values: Seq[String]) extends Constraint

  /** Non-null values satisfy an arbitrary row predicate. */
  final case class Satisfies(name: String, pred: Column) extends Constraint

  /** Every non-null value exists in `ref`'s `refCol` (referential
    * integrity; orphans are the violations). */
  final case class ForeignKey(name: String, col: Column, ref: DataFrame,
      refCol: Column) extends Constraint

  /** Audit `df` against `constraints`; one result row per constraint:
    * (constraint, n_rows, n_checked, n_violations, metric_ppm, pass).
    * `n_checked` is the constraint's own denominator (all rows for
    * Complete/Unique, non-null rows for the value constraints);
    * `metric_ppm` = 1e6 · passing/checked (1e6 on an empty denominator —
    * a vacuous constraint holds); `pass` = violations == 0 AND any
    * completeness floor met. Violation ROWS are deliberately not returned
    * (at 100 TB that's a table, not an answer) — callers re-filter with
    * the constraint's own predicate to materialize offenders. */
  def constraintAudit(df: DataFrame,
      constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraintAudit: no constraints")
    // Row-wise constraints: one conditional-sum aggregation pass. Each
    // constraint contributes (violations, checked) columns; Unique
    // contributes an exact distinct count over the key tuple.
    val rowWise = constraints.collect {
      case c: Complete  => c.name -> (c.col.isNull, lit(true))
      case c: InRange   =>
        c.name -> (c.col.isNotNull && !c.col.between(c.lo, c.hi),
          c.col.isNotNull)
      case c: InSet     =>
        c.name -> (c.col.isNotNull && !c.col.isin(c.values: _*),
          c.col.isNotNull)
      case c: Satisfies =>
        // NULL predicate = violation: a gate that cannot evaluate must
        // not wave the row through (the q183 filter-attrition rule).
        c.name -> (!coalesce(c.pred, lit(false)), lit(true))
    }
    val uniques = constraints.collect { case c: Unique => c }
    val fks = constraints.collect { case c: ForeignKey => c }

    val aggCols =
      Seq(count(lit(1)).as("__n")) ++
      rowWise.flatMap { case (n, (viol, checked)) => Seq(
        sum(when(viol, 1L).otherwise(0L)).as(s"__v_$n"),
        sum(when(checked, 1L).otherwise(0L)).as(s"__c_$n"))
      } ++
      uniques.flatMap { u =>
        // Distinct only over FULLY non-null key tuples: a bare
        // struct(cols) is never null, so count_distinct would count
        // null-containing tuples while __k (the row denominator)
        // excludes them — {1,1,NULL} would hide a duplicate and
        // {1,2,NULL} would report -1 violations. Gating the struct with
        // when(...) turns partially-null keys into NULL, which
        // count_distinct skips, keeping both sides on the same rows.
        val allSet = u.cols.map(_.isNotNull).reduce(_ && _)
        Seq(
          count_distinct(when(allSet, struct(u.cols: _*)))
            .as(s"__d_${u.name}"),
          sum(when(allSet, 1L).otherwise(0L)).as(s"__k_${u.name}"))
      }
    // `base` is one row re-selected by every constraint's result row; the
    // plan TEXT replicates the aggregation per branch, but the branches are
    // canonically identical, so runtime ReuseExchange executes the pass
    // once — an eager truncate here measured SLOWER (1.4 → 2.0 s at sf0.1:
    // one extra job bought nothing). Leave lazy; see OPTIMIZATION_r12.md.
    val base = df.agg(aggCols.head, aggCols.tail: _*)

    def resultRow(src: DataFrame, name: String, checked: Column,
        violations: Column): DataFrame =
      src.select(lit(name).as("constraint"), col("__n").as("n_rows"),
          checked.as("n_checked"), violations.as("n_violations"),
          when(checked === 0L, 1000000L)
            .otherwise(idiv((checked - violations) * 1000000L, checked))
            .as("metric_ppm"))
        .withColumn("pass", (col("n_violations") === 0L).cast("long"))

    val rowResults = rowWise.map { case (n, _) =>
      constraints.find(_.name == n).get match {
        // Complete's pass applies the ppm floor (nulls are allowed up to
        // 1e6 - minPpm of the table), not the zero-violation rule.
        case c: Complete =>
          resultRow(base, n, col(s"__c_$n"), col(s"__v_$n"))
            .withColumn("pass",
              (col("metric_ppm") >= c.minPpm).cast("long"))
        case _ => resultRow(base, n, col(s"__c_$n"), col(s"__v_$n"))
      }
    }
    val uniqResults = uniques.map { u =>
      // Violations = key rows minus distinct keys (the count of EXTRA
      // copies). Both __d and __k are computed over the same rows — the
      // fully-non-null key tuples — so the difference is exact; rows
      // with any null key column are a Complete constraint's job.
      resultRow(base, u.name, col(s"__k_${u.name}"),
        col(s"__k_${u.name}") - col(s"__d_${u.name}"))
    }
    val fkResults = fks.map { f =>
      val orphans = df.select(f.col.as("__fk")).filter(col("__fk").isNotNull)
        .join(f.ref.select(f.refCol.as("__fk")).distinct(), Seq("__fk"),
          "left_anti")
        .agg(count(lit(1)).as("__v"))
      val nonNull = df.agg(
        sum(when(f.col.isNotNull, 1L).otherwise(0L)).as("__c"),
        count(lit(1)).as("__n"))
      resultRow(nonNull.crossJoin(orphans), f.name, col("__c"), col("__v"))
    }

    (rowResults ++ uniqResults ++ fkResults)
      .reduce(_.unionByName(_))
      .orderBy(col("constraint"))
  }

  /** Benford first-digit audit (Newcomb 1881; Benford 1938 — the
    * data-forensics standard for "were these numbers made up"): the
    * distribution of first significant digits of a positive numeric
    * column against Benford's log₁₀(1+1/d), reported per digit with the
    * deviation, plus the total-variation distance as the one-number
    * verdict. The expected ppm table comes from [[benfordExpectedPpm]] —
    * plan-time constants interpolated into both engines (no log
    * in-engine); the first digit is read from the DECIMAL STRING of
    * ⌊10³·v⌋ (first char of a positive integer's decimal form IS the
    * first significant digit — no float log10, whose last-ulp behavior
    * near powers of ten differs by libm). Non-positive values are
    * excluded (Benford is defined on positive magnitudes). Returns per
    * digit (digit, n, obs_ppm, exp_ppm, dev_ppm, tvd_ppm — tvd repeated
    * on every row).
    *
    * 100 TB shape: one digit-keyed aggregation (9 groups); the string
    * read rides the scan. */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val d = substring(floor(value * 1000).cast("long").cast("string"), 1, 1)
      .cast("long")
    val base = df.filter(value > 0).select(d.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = base.agg(sum(col("n")).as("tn"))
    val exp = benfordExpectedPpm
    val expCol = element_at(array(exp.map(lit): _*), col("digit").cast("int"))
    val per = base.crossJoin(broadcast(tot))
      .withColumn("obs_ppm", idiv(col("n") * 1000000L, col("tn")))
      .withColumn("exp_ppm", expCol)
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
    val tvd = per.agg(idiv(sum(col("dev_ppm")), lit(2L)).as("tvd_ppm"))
    per.crossJoin(broadcast(tvd))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        col("dev_ppm"), col("tvd_ppm"))
  }

  /** Benford expected first-digit frequencies ⌊10⁶·log₁₀(1+1/d)⌋, d = 1..9
    * — evaluated once here, interpolated into both plans. */
  def benfordExpectedPpm: Seq[Long] =
    (1 to 9).map(d => (1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /** Functional-dependency audit (the profiling step behind schema
    * discovery and key/dimension validation, Papenbrock et al. VLDB'15
    * territory at exact-check granularity): does lhs → rhs hold? A
    * violating group is an lhs value whose rows carry ≥ 2 distinct rhs
    * values; the audit reports group and row blast radius per candidate
    * FD. NULLs participate as distinct values via a U+0002 sentinel on
    * BOTH sides (a NULL next to a real value IS a dependency violation —
    * dropping NULLs would certify a broken column, and concat_ws silently
    * skips NULLs, the portableRowHash trap); multi-column lhs keys join
    * on U+0001 so ("ab","c") can't collide with ("a","bc"). Each
    * candidate costs one lhs-keyed aggregation; candidates
    * audit independently, so the result unions |deps| scalar rows.
    * Returns (fd, n_groups, n_violating_groups, n_rows_in_violation,
    * holds). */
  def fdAudit(df: DataFrame,
      deps: Seq[(String, Seq[Column], Column)]): DataFrame = {
    require(deps.nonEmpty, "fdAudit: need at least one candidate FD")
    deps.map { case (name, lhs, rhs) =>
      val g = df.select(
          concat_ws("\u0001",
            lhs.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*)
            .as("__l"),
          coalesce(rhs.cast("string"), lit("\u0002")).as("__r"))
        .groupBy(col("__l"))
        .agg(countDistinct(col("__r")).as("nd"), count(lit(1)).as("n"))
      g.agg(count(lit(1)).as("n_groups"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L))
            .as("n_violating_groups"),
          sum(when(col("nd") >= 2, col("n")).otherwise(0L))
            .as("n_rows_in_violation"))
        .select(lit(name).as("fd"), col("n_groups"),
          col("n_violating_groups"), col("n_rows_in_violation"),
          (col("n_violating_groups") === 0).cast("long").as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Cohen's kappa (Cohen 1960) between two label columns, exact-integer:
    * one row (n, n_agree, po_ppm, pe_ppm, kappa_ppm). po = observed
    * agreement; pe = chance agreement from the marginals (Σ_c pA_c·pB_c);
    * kappa = (po − pe)/(1 − pe), all in ppm with DECIMAL(38,0) guarding
    * the n² products (n = 10⁸ rows puts n²·10⁶ at 10²² — past Long).
    * kappa_ppm is NULL when pe = 1e6 (a constant labeler agrees by chance
    * alone — kappa is undefined, not 0). NULL labels count as their own
    * class on both sides (an abstention IS a disagreement with any real
    * label): both columns coalesce to a sentinel before the matrix.
    *
    * 100 TB shape: ONE (a, b)-keyed two-phase hash aggregation over the
    * corpus; marginals, pe, and kappa run on the |classes|²-sized
    * confusion relation. */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val sentinel = "null"
    val conf = df.select(
        coalesce(labelA.cast("string"), lit(sentinel)).as("a"),
        coalesce(labelB.cast("string"), lit(sentinel)).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val totals = conf.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("n_agree"))
    val margA = conf.groupBy(col("a")).agg(sum(col("c")).as("na"))
    val margB = conf.groupBy(col("b")).agg(sum(col("c")).as("nb"))
    val peNum = margA.join(margB, col("a") === col("b"))
      .agg(coalesce(sum(expr(
        "CAST(na AS DECIMAL(38,0)) * nb")), lit(0L).cast("decimal(38,0)"))
        .as("pe_num"))
    totals.crossJoin(peNum)
      .withColumn("po_ppm", idiv(col("n_agree") * 1000000L, col("n")))
      .withColumn("pe_ppm", expr(
        "CAST((pe_num * 1000000) DIV (CAST(n AS DECIMAL(38,0)) * n) " +
          "AS BIGINT)"))
      // negative kappa (systematic disagreement) divides as explicit
      // sign · (|po−pe| // (1e6−pe)): Spark's DIV truncates toward zero
      // while DuckDB's // floors — on a negative numerator they differ
      // by one ulp, so both engines are pinned to the magnitude form
      .withColumn("kappa_ppm",
        when(col("pe_ppm") === 1000000L, lit(null).cast("long"))
          .when(col("po_ppm") >= col("pe_ppm"),
            idiv((col("po_ppm") - col("pe_ppm")) * 1000000L,
              lit(1000000L) - col("pe_ppm")))
          .otherwise(-idiv((col("pe_ppm") - col("po_ppm")) * 1000000L,
            lit(1000000L) - col("pe_ppm"))))
      .select(col("n"), col("n_agree"), col("po_ppm"), col("pe_ppm"),
        col("kappa_ppm"))
  }
}

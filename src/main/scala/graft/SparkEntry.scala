package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator/capability from SURVEY.md §2 (or a
  * 100TB-pipeline extension), expressed Spark-first; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL over the same parquet tables.
  *
  * Determinism rules (the driver hash-compares results):
  *   - every query ends in an ORDER BY that fully determines the projected
  *     values (lineitem contains intentional duplicate rows — ORDER BY must
  *     cover all projected columns or a unique expression);
  *   - double aggregates that accumulate across rows are `round(...)`ed in
  *     both dialects (summation order differs between engines; per-row
  *     arithmetic is IEEE-deterministic and needs no rounding);
  *   - column names and types are aliased identically on both sides
  *     (rank/year/... are cast to BIGINT where the engines' defaults differ).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → filter (pushed to parquet) → two-phase hash agg →
    * sort (reference: transform_group_by_partial/final + merge sort). */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_tpch_q1")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreRelational.queries ++
      JoinsSubqueries.queries ++
      WindowsSetsDates.queries ++
      StreamingQueries.queries ++
      DialectQueries.queries ++
      PipelineOps.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Keys absent here get the driver's weaker rows-only
    * check (non-SQL-expressible ops: LSH signatures, etc.). */
  def oracleSql: Map[String, String] =
    CoreRelational.oracle ++
      JoinsSubqueries.oracle ++
      WindowsSetsDates.oracle ++
      StreamingQueries.oracle ++
      DialectQueries.oracle ++
      PipelineOps.oracle
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, as pure
  * higher-order-function expressions (codegen'd, no UDF, no shuffle).
  * Accumulation is forced to double and sequential so results are
  * reproducible across engines (the DuckDB oracle mirrors the same
  * element order). */
object Vectors {

  /** Elementwise cast to double — float math differs between engines;
    * all reductions happen in double. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-in-double dot product, as a codegen'd primitive loop
    * (graft.functions.DotProduct) — bit-identical to the HOF spelling
    * `aggregate(zip_with(..))` but allocation-free per row, which is what
    * makes pair joins feasible (the pair side evaluates this per PAIR). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}

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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}

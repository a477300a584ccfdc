package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the right row with the
  * largest `ts` ≤ the left row's `ts` within the same key group — the
  * standard event-time enrichment of a training-data pipeline ("the feature
  * value as of this event"). Equal timestamps match (inclusive), like
  * DuckDB/kdb/pandas `merge_asof`.
  *
  * NOT implemented as a range/theta join: Spark would plan
  * `l.k = r.k AND l.ts >= r.ts` as an equi-join on k with a per-group
  * quadratic filter, then need another aggregation to keep only the latest
  * match — per-key O(|L|·|R|). Instead both sides union into one stream,
  * shuffle ONCE on the key, sort within each partitionBy-key window on
  * `(ts, side)` with right rows ordered before coincident left rows, and
  * carry the latest right payload forward with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame — per-key O((|L|+|R|) log(|L|+|R|)) and one
  * shuffle total, the shape that survives 100 TB (per-key state is one
  * payload, the sort is Spark's spillable window sort).
  *
  * Ties on the RIGHT side (same key, same ts) are broken deterministically:
  * the MAX payload struct (natural struct order, ts first) wins, so the
  * output is invariant under repartitioning and input order. Payload columns
  * must therefore be of orderable types (no maps); pre-aggregate the right
  * side if a different tie-break is wanted.
  *
  * `toleranceSeconds`: when set, a match older than the tolerance is
  * discarded (payload columns become NULL, the left row survives — left-join
  * semantics either way).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, toleranceSeconds: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val payloadCols = right.columns.filterNot((keys :+ ts).toSet).toSeq
    require(payloadCols.nonEmpty, "right side has no payload columns")
    val outNames = (payloadCols :+ ts).map(rightPrefix + _)
    val clash = outNames.filter(left.columns.toSet)
    require(clash.isEmpty,
      s"asofJoin output columns ${clash.mkString(", ")} collide with left-side " +
        s"columns; pass a different rightPrefix")

    // Right payload struct carries its own ts for the tolerance check.
    val rp = struct((col(ts).as("__rts") +: payloadCols.map(col)): _*)
    val r2 = right.select(
      (keys.map(col) :+ col(ts) :+ lit(0).as("__side") :+ rp.as("__rp")) ++
        left.columns.filterNot((keys :+ ts).toSet).toSeq
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l2 = left.select(
      (keys.map(col) :+ col(ts) :+ lit(1).as("__side") :+
        lit(null).cast(r2.schema("__rp").dataType).as("__rp")) ++
        left.columns.filterNot((keys :+ ts).toSet).toSeq.map(col): _*)

    // __rp in the sort: right rows tied on (key, ts) order ascending by their
    // payload struct, so last() — the match — is the max payload: one
    // deterministic winner regardless of partitioning or input order. Left
    // rows (__side 1) sort after all coincident right rows either way.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc, col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r2.unionByName(l2)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol: Column = toleranceSeconds match {
      case None => col("__m").isNotNull
      case Some(tol) =>
        col("__m").isNotNull &&
          col(ts).cast("double") - col("__m.__rts").cast("double") <= tol.toDouble
    }
    val out = matched.withColumn("__ok", withinTol)
    val leftCols = left.columns.toSeq.map(col)
    val rightOut = payloadCols.map(c =>
      when(col("__ok"), col(s"__m.$c")).as(s"$rightPrefix$c")) :+
      when(col("__ok"), col("__m.__rts")).as(s"$rightPrefix$ts")
    out.select((leftCols ++ rightOut): _*)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream operators over the `events` table (ts, user_id,
  * event_type, value, props). The reference has no event-time model
  * (SURVEY.md §2.9) — these are the extension surface, batch-first so the
  * DuckDB oracle stays comparable; `graft.streaming` holds the Structured
  * Streaming variants.
  *
  * Scale: every op is a single hash-shuffle on the entity key (user_id) or a
  * pure map — no driver-side state; sessionization is the standard
  * lag+cumsum formulation which AQE can re-plan for skewed users.
  */
object EventsOps {

  /** Time-bucketed aggregation (tumbling window as a group key).
    *
    * Sums accumulate in DECIMAL, not double: decimal addition is exact and
    * ORDER-INDEPENDENT, so the result is identical across engines and
    * partitionings — double accumulation differs in the last ulps by
    * summation order, and no rounding precision is safe against boundary
    * values (surfaced at sf0.1). The per-row double→decimal(30,10) cast is
    * deterministic in both engines. */
  def timeBucket(events: DataFrame, unit: String): DataFrame = {
    val s10 = sum(col("value").cast("decimal(30,10)"))
    events.groupBy(date_trunc(unit, col("ts")).as("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(s10.cast("double"), 2).as("s"),
        round(s10.cast("double") / count(lit(1)), 6).as("a"))
  }

  /** Mark each event with a new-session flag: a session breaks after
    * `gapSeconds` of inactivity per user. Exact-integer microsecond
    * comparison keeps it engine-reproducible.
    *
    * Boundary note: a gap of EXACTLY `gapSeconds` stays in-session here
    * (`>` breaks), while `session_window`/the stateful sessionizer start a
    * new session (end bound exclusive). Both conventions exist in the wild;
    * each op's oracle mirrors its own. */
  def withSessionFlag(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        (col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") > gapSeconds * 1000000L).cast("int"))
      .drop("__prev_us")
  }

  /** Assign a per-user session index (cumulative sum of break flags). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSessionFlag(events, gapSeconds)
      .withColumn("session_id", sum(col("new_session")).over(w))
  }

  /** Sessions per user — the oracle-checkable reduction of sessionize. */
  def sessionCounts(events: DataFrame, gapSeconds: Long): DataFrame =
    withSessionFlag(events, gapSeconds)
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
}

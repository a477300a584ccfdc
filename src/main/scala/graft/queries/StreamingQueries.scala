package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Structured Streaming queries run to completion (Trigger.AvailableNow over
  * the events parquet) so the batch oracle can check them: the streaming
  * result of a windowed aggregation over a finite source must equal the batch
  * aggregation of the same data.
  *
  * q35 (stateful flatMapGroupsWithState sessions) has no SQL oracle: in
  * append mode only sessions closed by data or by the final watermark emit —
  * deterministic, but a cross-engine SQL restatement would re-implement the
  * operator; ScalaTest covers it against the batch sessionizer instead.
  */
object StreamingQueries {

  /** Streaming state partitioning: each stateful operator opens one state
    * store per shuffle partition, so a batch-sized-parallelism default (32)
    * pays 32 store inits for a bounded-cardinality state. 4 fits the keyset
    * at any sf here (measured: 8→4 shaved ~0.3 s/query at sf0.1); at 100 TB
    * this knob scales with key cardinality, not core count. Restored after
    * the (synchronous) run. */
  private def withStatePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_stream_tumbling" -> ((s, dir) => withStatePartitions(s, 4) {
      val agg = EventStreams.tumblingAgg(EventStreams.readEvents(s, dir), "1 hour")
      EventStreams.runAvailableNow(agg, "q33_sink", needFinalBatch = false)
        .orderBy(col("h"), col("event_type"))
    }),
    "q34_stream_session_window" -> ((s, dir) => withStatePartitions(s, 4) {
      val sess = EventStreams.sessionWindowAgg(
        EventStreams.readEvents(s, dir).filter(col("user_id") < 100), gap = "30 minutes")
      EventStreams.runAvailableNow(sess, "q34_sink", needFinalBatch = false)
        .orderBy(col("user_id"), col("session_start"))
    }),
    "q35_stream_stateful_sessions" -> ((s, dir) => withStatePartitions(s, 4) {
      val sess = EventStreams.sessionizeStateful(
        EventStreams.readEvents(s, dir).filter(col("user_id") < 100), gapSeconds = 1800)
      EventStreams.runAvailableNow(sess.toDF(), "q35_sink", OutputMode.Append)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    }),
  )

  def oracle: Map[String, String] = Map(
    "q33_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS s
        |FROM events GROUP BY h, event_type ORDER BY h, event_type""".stripMargin,
    // Session bounds per Spark session_window semantics: a new session starts
    // when the gap to the previous event is >= 30 min (end bound exclusive);
    // session_end = last event + gap.
    "q34_stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_us
        |  FROM events WHERE user_id < 100),
        |f AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (
        |  SELECT user_id, us, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id,
        |  make_timestamp(min(us)) AS session_start,
        |  make_timestamp(max(us) + 1800000000) AS session_end,
        |  count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
  )
}

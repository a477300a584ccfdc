package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** The events generator has shipped `ts` under several parquet encodings
  * (TIMESTAMP(NANOS), plain timestamp[us]); [[Tables.events]] must normalize
  * all of them to TimestampType with identical values — a silent mismatch
  * here skews every event-time window by 1000×. */
class EventsReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "2024-03-01 10:00:00.123456", 7L, "click", 1.5, "{}"),
    (2L, "2024-03-01 10:30:00.000001", 8L, "view", 2.5, "{}"))

  private def writeAndRead(tsCol: org.apache.spark.sql.Column,
      castTo: Option[String]): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-evread").toString + "/events.parquet"
    val base = rows.toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    castTo.fold(base)(t => base.withColumn("ts", col("ts").cast(t)))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Tables.events(spark, dir)
  }

  test("timestamp[us] NTZ footer (current generator) reads as TimestampType") {
    val df = writeAndRead(col("raw_ts").cast(TimestampNTZType), None)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSeq
    assert(got === rows.map(_._2))
  }

  test("timestamp[us] LTZ footer reads as TimestampType unchanged") {
    val df = writeAndRead(col("raw_ts").cast(TimestampType), None)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSeq
    assert(got === rows.map(_._2))
  }

  test("raw nano longs (the nanosAsLong decode of a NANOS footer) rebuild µs exactly") {
    // Spark cannot author a TIMESTAMP(NANOS) footer; what the legacy conf
    // hands the reader for one is a LongType column of raw nanos — author
    // that directly and pin the rebuild arm (floor div, not double division).
    val df = writeAndRead(
      (unix_micros(col("raw_ts").cast(TimestampType)) * 1000L).cast(LongType), None)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id").select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect().toSeq
    assert(got === rows.map(_._2))
  }

  test("streaming readEvents agrees with the batch reader on the current testdata") {
    val batch = Tables.table(spark, TestSpark.sfDir, "events")
    val stream = graft.streaming.EventStreams.readEvents(spark, TestSpark.sfDir)
    assert(stream.schema("ts").dataType === TimestampType)
    val streamed = graft.streaming.EventStreams.runAvailableNow(
      stream.select("event_id", "ts"), "evread_parity",
      org.apache.spark.sql.streaming.OutputMode.Append)
    val b = batch.select("event_id", "ts").orderBy("event_id").collect().toSeq
    val s = streamed.orderBy("event_id").collect().toSeq
    assert(s === b)
  }
}

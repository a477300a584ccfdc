package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventsOps
import graft.streaming.EventStreams

case class TestEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, ts: String, uid: Long = 1L, typ: String = "click", v: Double = 1.0) =
    TestEv(id, t(ts), uid, typ, v)

  test("tumbling agg: streaming result equals batch aggregation of same data") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    val evs = Seq(
      ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:40:00", v = 2.5),
      ev(3, "2024-01-01 11:10:00"), ev(4, "2024-01-01 11:20:00", typ = "view"),
      ev(5, "2024-01-01 13:00:00"))
    in.addData(evs)
    val q = EventStreams.tumblingAgg(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("tumb_sink")
      .outputMode(OutputMode.Complete).start()
    try { in.addData(); q.processAllAvailable() } finally q.stop()

    val got = spark.table("tumb_sink")
      .orderBy("h", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = evs.toDF()
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("s"))
      .orderBy("h", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("sliding windows: each event lands in width/slide overlapping buckets") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    in.addData(ev(1, "2024-01-01 10:20:00"))
    val q = EventStreams.slidingAgg(in.toDF(), "1 hour", "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("slide_sink")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val starts = spark.table("slide_sink").orderBy("ws").collect()
      .map(_.getTimestamp(0).toString)
    // one event at 10:20 → windows [9:30,10:30) and [10:00,11:00)
    assert(starts.toSeq == Seq("2024-01-01 09:30:00.0", "2024-01-01 10:00:00.0"))
  }

  test("watermark: late event below the watermark is dropped in append mode") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    val q = EventStreams.tumblingAgg(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wm_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events in [10:00,11:00) + one at 12:30 → watermark 12:00
      in.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"),
        ev(3, "2024-01-01 12:30:00"))
      q.processAllAvailable()
      // batch 2: a LATE event for the already-closed 10:00 window, plus a
      // fresh one that keeps the stream moving
      in.addData(ev(4, "2024-01-01 10:40:00"), ev(5, "2024-01-01 14:30:00"))
      q.processAllAvailable()
    } finally q.stop()
    val tenOClock = spark.table("wm_sink")
      .filter(col("h") === lit(t("2024-01-01 10:00:00"))).collect()
    assert(tenOClock.length == 1)
    assert(tenOClock(0).getAs[Long]("n") == 2) // late event 4 was dropped
  }

  test("stateful sessionizer: closes sessions by data gap and by watermark timeout") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    val sess = EventStreams.sessionizeStateful(in.toDF(), gapSeconds = 1800)
    val q = sess.toDF().writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10s apart (one session), then an event 2h later
      // (closes session 1 in-data); user 2's far-future event advances the
      // watermark so user 1's second session closes by TIMEOUT. User 2's own
      // session stays open (watermark never passes its gap) — not emitted.
      in.addData(
        ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:00:10", v = 2.0),
        ev(3, "2024-01-01 12:00:00", v = 5.0))
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-02 09:00:00", uid = 2L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_sink").orderBy("session_start").collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 1L))
    assert(rows(0).getAs[Long]("n_events") == 2)
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(0).getAs[Timestamp]("session_start") == t("2024-01-01 10:00:00"))
    // session end = last event + gap
    assert(rows(0).getAs[Timestamp]("session_end") == t("2024-01-01 10:30:10"))
    assert(rows(1).getAs[Long]("n_events") == 1)
    assert(rows(1).getAs[Timestamp]("session_start") == t("2024-01-01 12:00:00"))
  }

  test("session_window agg matches the batch lag+cumsum sessionizer") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    // three users, mixed gaps, no exact-gap boundaries
    val evs = Seq(
      ev(1, "2024-01-01 08:00:00", 1), ev(2, "2024-01-01 08:10:00", 1),
      ev(3, "2024-01-01 09:30:00", 1), ev(4, "2024-01-01 08:05:00", 2),
      ev(5, "2024-01-01 11:00:00", 2), ev(6, "2024-01-01 11:20:00", 2),
      ev(7, "2024-01-01 07:00:00", 3))
    in.addData(evs)
    val q = EventStreams.sessionWindowAgg(in.toDF(), "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sw_sink")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sw_sink").orderBy("user_id", "session_start").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events")))
    val want = EventsOps.sessionize(evs.toDF(), 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events")))
    assert(got.toSeq == want.toSeq)
  }

  test("stream dedup: duplicate ids within the watermark horizon are dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    val q = EventStreams.dedupStream(in.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:00"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      in.addData(ev(1, "2024-01-01 10:00:00"), ev(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_sink").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // both duplicate 1s dropped
  }

  test("watermark-scoped dedup drops RESTAMPED redeliveries; (id,ts) dedup passes them") {
    implicit val ctx = spark.sqlContext
    // redelivered copy of event 1 arrives with a different timestamp
    val redelivered = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:01"),
      ev(2, "2024-01-01 10:01:00"))

    val inA = MemoryStream[TestEv]
    val qA = EventStreams.dedupStreamWithinWatermark(inA.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("wmdedup_sink")
      .outputMode(OutputMode.Append).start()
    try { inA.addData(redelivered: _*); qA.processAllAvailable() } finally qA.stop()
    val a = spark.table("wmdedup_sink").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.toSeq == Seq(1L, 2L), "restamped duplicate must be dropped")

    // the (id, ts)-keyed op treats the restamp as a NEW event — this is the
    // gap dedupStreamWithinWatermark exists to close
    val inB = MemoryStream[TestEv]
    val qB = EventStreams.dedupStream(inB.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("tsdedup_sink")
      .outputMode(OutputMode.Append).start()
    try { inB.addData(redelivered: _*); qB.processAllAvailable() } finally qB.stop()
    assert(spark.table("tsdedup_sink").count() == 3)
  }

  test("stream-static enrichment joins without shuffling the stream") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[TestEv]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, "2024-01-01 10:00:00", uid = 1), ev(2, "2024-01-01 10:01:00", uid = 9))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enrich_sink").select("user_id", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows == Map(1L -> "gold", 9L -> null))
  }

  test("stream-stream interval join equals the batch interval join") {
    val ev = EventStreams.readEvents(spark, TestSpark.sfDir)
    val stream = EventStreams.intervalJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      key = "user_id", window = "1 hour")
    val got = EventStreams.runAvailableNow(stream, "ssjoin_sink",
        org.apache.spark.sql.streaming.OutputMode.Append, needFinalBatch = false)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

    val batch = graft.tables.Tables.table(spark, TestSpark.sfDir, "events")
    val c = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val expected = c.join(p, col("cu") === col("pu") &&
        col("pts") > col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 hour"))
      .select("cid", "pid").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture should produce at least one join pair")
  }

  test("left-outer interval join: matched = inner join; nulls stop at the watermark frontier") {
    val ev = EventStreams.readEvents(spark, TestSpark.sfDir)
    val stream = EventStreams.intervalJoinLeftOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      key = "user_id", window = "1 hour")
    val rows = EventStreams.runAvailableNow(stream, "ssjoin_outer_sink",
        org.apache.spark.sql.streaming.OutputMode.Append)
      .select(col("l_id"), col("r_id")).collect()
    val matched = rows.filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val unmatched = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet

    val batch = graft.tables.Tables.table(spark, TestSpark.sfDir, "events")
    val c = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = batch.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val cond = col("cu") === col("pu") &&
      col("pts") > col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 hour")
    val expectedMatched = c.join(p, cond)
      .select("cid", "pid").as[(Long, Long)].collect().toSet
    assert(matched === expectedMatched)
    // frontier: unmatched rows emit iff the final GLOBAL watermark strictly
    // passed cts + 1 h. The global watermark is the MIN over both branches'
    // watermarks (each = that branch's max event time floored to ms, minus
    // the 30-min delay) — the lagging side holds every join open.
    def branchMaxMs(tpe: String): Long =
      batch.filter(col("event_type") === tpe)
        .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L * 1000L
    val wmUs = math.min(branchMaxMs("click"), branchMaxMs("purchase")) -
      1800L * 1000000L
    val expectedUnmatched = c.join(p, cond, "left_anti")
      .filter(unix_micros(col("cts")) + 3600L * 1000000L < wmUs)
      .select("cid").as[Long].collect().toSet
    assert(unmatched === expectedUnmatched)
    assert(matched.nonEmpty && unmatched.nonEmpty)
  }

  test("streaming novel ingest equals the batch incremental dedup (min-id kept)") {
    val fp = graft.ext.TextAnalysis.contentFingerprint(col("text"))
    val docs = graft.tables.Tables.table(spark, TestSpark.sfDir, "documents")
    val corpusFps = docs.filter(col("doc_id") % 2 === 0).select(fp.as("fp")).distinct()
    // maxFilesPerTrigger=1 still exercises the stateful agg across the
    // stream's partitioned arrival; result must be min-id deterministic
    val stream = EventStreams.readDocuments(spark, TestSpark.sfDir, maxFilesPerTrigger = 1)
      .filter(col("doc_id") % 2 === 1)
    val got = EventStreams.runAvailableNow(
        EventStreams.novelIngest(stream, corpusFps, fp), "novel_sink",
        org.apache.spark.sql.streaming.OutputMode.Complete, needFinalBatch = false)
      .select("doc_id").as[Long].collect().toSet
    val expected = graft.ext.Dedup.novelAgainst(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        fp, col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming novelty gate equals the batch snapshot scorer, batch-boundary blind") {
    val docs = graft.tables.Tables.table(spark, TestSpark.sfDir, "documents")
    val corpusGrams = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(graft.ext.Dedup.wordNgramHashes(col("text"), 3)).as("h"))
      .distinct()
    val stream = EventStreams.readDocuments(spark, TestSpark.sfDir, maxFilesPerTrigger = 1)
      .filter(col("doc_id") % 2 === 1)
    val got = EventStreams.runAvailableNow(
        EventStreams.noveltyStream(stream, corpusGrams, col("text"), n = 3),
        "novelty_stream_sink",
        org.apache.spark.sql.streaming.OutputMode.Complete, needFinalBatch = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch reference: the bucketed-snapshot scorer over the same split
    spark.sql("DROP TABLE IF EXISTS novelty_stream_snap")
    graft.ext.Dedup.snapshotShingles(docs.filter(col("doc_id") % 2 === 0),
      col("text"), "novelty_stream_snap", n = 3, buckets = 4)
    try {
      val expected = graft.ext.Dedup.noveltyAgainstSnapshot(spark,
          "novelty_stream_snap", docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS novelty_stream_snap")
  }

  test("CDC upsert sink commits pointer-swapped versions on a VersionedTable root") {
    // Same out-of-order delivery as the flat-dir test below, but the sink
    // target is a versioned root: every micro-batch must land as a new
    // committed version (atomic marker PUT, no renames), the CURRENT
    // pointer must answer the same version-aware merge, and the
    // pre-stream version must stay time-travel-readable.
    val src = java.nio.file.Files.createTempDirectory("graft-cdcv-src").toString
    val rootDir = java.nio.file.Files.createTempDirectory("graft-cdcv-snap")
    val root = "file://" + rootDir.toString + "/snap"
    try {
      val VT = graft.tables.VersionedTable
      VT.init(spark, root, Seq(
        ev(1, "2024-01-01 07:00:00", uid = 1, typ = "seed", v = 0.0)).toDF())
      val batches = Seq(
        Seq(ev(10, "2024-01-01 12:00:00", uid = 1, typ = "late", v = 9.0),
          ev(1, "2024-01-01 09:00:00", uid = 2, typ = "a", v = 1.0)),
        Seq(ev(3, "2024-01-01 08:00:00", uid = 1, typ = "old", v = 3.0),
          ev(7, "2024-01-01 09:30:00", uid = 2, typ = "c", v = 7.0)))
      batches.zipWithIndex.foreach { case (b, i) =>
        b.toDF().coalesce(1).write.parquet(s"$src/f$i.parquet")
      }
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[TestEv]].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/f*.parquet")
      EventStreams.runUpsertSink(stream, root, "user_id", Seq("ts", "event_id"))
      // one committed version per micro-batch on top of the init
      assert(VT.versions(spark, root) == Seq(1L, 2L, 3L))
      val got = VT.read(spark, root)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSet
      assert(got === Set((1L, 10L, "late"), (2L, 7L, "c")))
      // time travel: the seed version is still exactly readable
      assert(VT.readVersion(spark, root, 1L).select("event_type")
        .as[String].collect().toSeq == Seq("seed"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(src)); rm(rootDir.toFile)
    }
  }

  test("CDC upsert sink: out-of-order micro-batches cannot clobber newer state") {
    // Three source files delivered one per micro-batch, with the NEWEST
    // version of user 1 arriving in the FIRST file and an older version
    // last — plain last-batch-wins would end on the stale row; the
    // version-aware merge must keep the (ts, event_id) max per user.
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src").toString
    val snapRoot = java.nio.file.Files.createTempDirectory("graft-cdc-snap")
    val snap = snapRoot.toString + "/snap"
    try {
      val batches = Seq(
        Seq(ev(10, "2024-01-01 12:00:00", uid = 1, typ = "late", v = 9.0),
          ev(1, "2024-01-01 09:00:00", uid = 2, typ = "a", v = 1.0)),
        Seq(ev(5, "2024-01-01 10:00:00", uid = 1, typ = "mid", v = 5.0),
          ev(2, "2024-01-01 09:30:00", uid = 2, typ = "b", v = 2.0)),
        Seq(ev(3, "2024-01-01 08:00:00", uid = 1, typ = "old", v = 3.0),
          ev(7, "2024-01-01 09:30:00", uid = 2, typ = "c", v = 7.0)))
      batches.zipWithIndex.foreach { case (b, i) =>
        b.toDF().coalesce(1).write.parquet(s"$src/f$i.parquet")
      }
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[TestEv]].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/f*.parquet")
      EventStreams.runUpsertSink(stream, snap, "user_id", Seq("ts", "event_id"))
      val got = spark.read.parquet(snap)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSet
      // user 1: ts-max is event 10 from the FIRST batch; user 2: ts tie at
      // 09:30 breaks to the higher event_id (7)
      assert(got === Set((1L, 10L, "late"), (2L, 7L, "c")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(src)); rm(snapRoot.toFile)
    }
  }

  test("file source end-to-end: streaming tumbling agg equals batch over sf0.001 events") {
    val stream = EventStreams.tumblingAgg(
      EventStreams.readEvents(spark, TestSpark.sfDir), "1 hour")
    val got = EventStreams.runAvailableNow(stream, "file_e2e_sink")
      .agg(sum("n"), count(lit(1))).collect()(0)
    val batch = graft.tables.Tables.table(spark, TestSpark.sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .agg(sum("n"), count(lit(1))).collect()(0)
    assert(got.getLong(0) == batch.getLong(0)) // same total events
    assert(got.getLong(1) == batch.getLong(1)) // same number of buckets
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Crash-injection support for [[StreamingRecoverySpec]]: a codegen-opaque
  * probe that throws ONCE, mid-task, after `threshold` rows have flowed
  * through it while armed — simulating an executor dying in the middle of a
  * micro-batch (some state-store partitions have committed the new version,
  * the offset log has not). Static state is visible across Spark's local
  * executor threads (one JVM). */
object CrashOnce {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile var threshold = 0L
  @volatile var firedAtRow = -1L

  def reset(thresh: Long): Unit = {
    rowsSeen.set(0L); threshold = thresh; firedAtRow = -1L; armed.set(true)
  }
  def disarm(): Unit = armed.set(false)

  def probe(): Boolean = {
    val n = rowsSeen.incrementAndGet()
    if (n > threshold && armed.compareAndSet(true, false)) {
      firedAtRow = n
      throw new RuntimeException(s"graft-test: injected mid-batch crash at row $n")
    }
    true
  }
}

/** Round-9 verdict item 3: kill a stateful streaming query mid-batch and
  * restart it from the SAME RocksDB checkpoint; the resumed run's output
  * must be identical to an uninterrupted run's — any divergence fails here.
  *
  * Coverage, one test per state-recovery class in the graded entries:
  *   - flatMapGroupsWithState sessionizer (q35's operator) — custom state +
  *     event-time timeouts, append-mode parquet sink (exactly-once manifest);
  *   - dropDuplicates streaming dedup (q57's) — built-in keyed state;
  *   - foreachBatch CDC upsert (q122's) — the crash lands AFTER the batch's
  *     upsert is applied but BEFORE the offset commit (the classic
  *     at-least-once window), so the replay must be IDEMPOTENT;
  *   - Complete-mode session-window aggregation (q34's family) — windowed
  *     agg state resumed mid-stream must converge to the full-data answer.
  *
  * The crash is injected inside the post-shuffle stage (a probe filter after
  * the stateful operator, or inside foreachBatch), so state-store tasks that
  * processed poison-free groups COMMIT their new version while the failing
  * task aborts — the partial-state-version case the RocksDB provider must
  * roll back on restart. Each test asserts the first run really failed, that
  * at least one micro-batch had committed before the crash (checkpoint
  * commits log), and that the recovered output equals the clean run's. */
class StreamingRecoverySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val crashProbe = udf(() => CrashOnce.probe()).asNondeterministic()

  /** sf0.001 events split into 4 time-ordered parquet chunks in a temp dir —
    * a multi-batch file source (maxFilesPerTrigger=1 → 4 micro-batches),
    * identical file set for the clean and the crash-recovery run. */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft-recovery-src").toString
    val ev = graft.tables.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .orderBy(col("ts"), col("event_id"))
    val rows = ev.count()
    val chunk = (rows + 3) / 4
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts"), col("event_id"))
    val rn = ev.withColumn("rn", row_number().over(w))
    for (k <- 0 until 4) {
      rn.filter(col("rn") > k * chunk && col("rn") <= (k + 1) * chunk)
        .drop("rn").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/chunk-$k")
    }
    dir
  }

  private def eventStream(): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("basePath", srcDir)
      .parquet(s"$srcDir/chunk-*")
  }

  /** The entries' production state configuration: RocksDB provider with
    * changelog checkpointing, 4 state partitions. */
  private def withStreamConf[A](body: => A): A = {
    val overrides = Seq(
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def committedBatches(cp: String): Int =
    Option(new java.io.File(s"$cp/commits").list())
      .map(_.count(!_.startsWith("."))).getOrElse(0)

  private def runToParquet(df: DataFrame, cp: String, out: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def sortedRows(path: String): Seq[String] =
    spark.read.parquet(path).collect().map(_.toString).sorted.toSeq

  /** Clean run + crash-recovery run of an append-mode stateful stream;
    * asserts the crash fired, a batch had committed, and outputs match. */
  private def recoveryHarness(name: String, mk: () => DataFrame,
      crashThreshold: Long => Long): Unit = withStreamConf {
    val root = Files.createTempDirectory(s"graft-recovery-$name").toString
    // clean reference (probe present but unarmed — identical plan)
    CrashOnce.disarm(); CrashOnce.rowsSeen.set(0L)
    runToParquet(mk(), s"$root/cp-clean", s"$root/out-clean")
    val clean = sortedRows(s"$root/out-clean")
    val cleanRows = CrashOnce.rowsSeen.get()
    assert(clean.nonEmpty, s"$name: clean run produced no rows")

    // crash run: arm to fire mid-stream, expect the query to die
    CrashOnce.reset(crashThreshold(cleanRows))
    val crashed =
      try { runToParquet(mk(), s"$root/cp", s"$root/out"); false }
      catch { case _: StreamingQueryException => true }
    assert(crashed, s"$name: injected crash did not surface")
    assert(CrashOnce.firedAtRow > 0, s"$name: probe never fired")
    val before = committedBatches(s"$root/cp")
    assert(before >= 1,
      s"$name: crash landed before any batch committed (threshold too low)")
    info(s"$name: crashed at probe row ${CrashOnce.firedAtRow}, " +
      s"$before batches committed, restarting from checkpoint")

    // restart from the same checkpoint + sink; must run to completion
    CrashOnce.disarm()
    runToParquet(mk(), s"$root/cp", s"$root/out")
    val recovered = sortedRows(s"$root/out")
    assert(recovered === clean,
      s"$name: post-recovery output diverged (clean=${clean.size} rows, " +
        s"recovered=${recovered.size})")
  }

  test("flatMapGroupsWithState sessionizer survives a mid-batch crash (q35 operator)") {
    recoveryHarness("sessionizer", () =>
      EventStreams.sessionizeStateful(
          eventStream().filter(col("user_id") < 100), gapSeconds = 1800)
        .toDF()
        .filter(crashProbe()),
      cleanRows => cleanRows / 2)
  }

  test("streaming dedup survives a mid-batch crash (q57 operator)") {
    recoveryHarness("dedup", () =>
      EventStreams.dedupStream(
          eventStream().unionByName(eventStream()), Seq("event_id"))
        .filter(crashProbe()),
      cleanRows => cleanRows / 2)
  }

  test("CDC upsert replay is idempotent across a post-apply crash (q122 operator)") {
    withStreamConf {
      val root = Files.createTempDirectory("graft-recovery-cdc").toString
      val crashAtBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
      val arm = new java.util.concurrent.atomic.AtomicBoolean(false)

      def run(cp: String, snap: String): Unit = {
        val q = eventStream().writeStream
          .foreachBatch { (batch: Dataset[Row], bid: Long) =>
            val s = batch.sparkSession
            val latest = graft.tables.Snapshots.latestPerKey(
              batch, "user_id", Seq("ts", "event_id"))
            val (fs, rootP) = graft.tables.Hfs.fsFor(s, snap)
            if (!fs.exists(rootP)) latest.write.parquet(snap)
            else graft.tables.Snapshots.upsertLatestByKey(
              s, snap, latest, "user_id", Seq("ts", "event_id"))
            // the at-least-once window: the batch's effect is fully applied,
            // the offset commit has not happened — die HERE; the replay on
            // restart re-applies the same batch and must be a no-op
            if (bid >= 1 && arm.compareAndSet(true, false)) {
              crashAtBatch.set(bid)
              throw new RuntimeException("graft-test: crash after upsert apply")
            }
          }
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      arm.set(false)
      run(s"$root/cp-clean", s"$root/snap-clean")
      val clean = sortedRows(s"$root/snap-clean")
      assert(clean.nonEmpty)

      arm.set(true)
      val crashed =
        try { run(s"$root/cp", s"$root/snap"); false }
        catch { case _: StreamingQueryException => true }
      assert(crashed && crashAtBatch.get() >= 1)
      assert(committedBatches(s"$root/cp") >= 1)
      info(s"cdc: crashed after applying batch ${crashAtBatch.get()}, restarting")
      run(s"$root/cp", s"$root/snap") // replays the applied batch → no-op
      assert(sortedRows(s"$root/snap") === clean,
        "CDC snapshot diverged after post-apply crash replay")
    }
  }

  test("Complete-mode session-window agg resumes mid-stream to the full answer (q34 family)") {
    withStreamConf {
      val root = Files.createTempDirectory("graft-recovery-complete").toString
      val arm = new java.util.concurrent.atomic.AtomicBoolean(false)
      @volatile var lastResult: Seq[String] = Nil

      def run(cp: String): Unit = {
        val agg = EventStreams.sessionWindowAgg(
          eventStream().filter(col("user_id") < 100), gap = "30 minutes")
        val q = agg.writeStream
          .foreachBatch { (batch: Dataset[Row], bid: Long) =>
            if (bid >= 1 && arm.compareAndSet(true, false))
              throw new RuntimeException("graft-test: crash in complete-mode sink")
            lastResult = batch.collect().map(_.toString).sorted.toSeq
          }
          .outputMode(OutputMode.Complete)
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      arm.set(false)
      run(s"$root/cp-clean")
      val clean = lastResult
      assert(clean.nonEmpty)

      arm.set(true); lastResult = Nil
      val crashed =
        try { run(s"$root/cp"); false }
        catch { case _: StreamingQueryException => true }
      assert(crashed)
      assert(committedBatches(s"$root/cp") >= 1)
      run(s"$root/cp")
      assert(lastResult === clean,
        "Complete-mode result diverged after mid-stream recovery")
    }
  }
}

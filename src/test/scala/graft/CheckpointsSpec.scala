package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Checkpoints

/** Unit pins for the lineage-truncation switch behind every iterative
  * operator (see StreamingRecoverySpec / the GATE_FAULT stage for the
  * end-to-end proof). */
class CheckpointsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("default mode: localCheckpoint (no checkpoint dir required)") {
    spark.conf.unset("spark.graft.reliableCheckpoint")
    val out = Checkpoints.truncate(Seq(1, 2, 3).toDF("x"))
    assert(out.count() === 3)
    // local checkpoints do not touch the reliable-checkpoint machinery
    assert(out.queryExecution.analyzed.collectLeaves().nonEmpty)
  }

  test("reliable mode: sets a checkpoint dir lazily and survives re-entry") {
    // a dedicated session: SQLConf is session-scoped, so flipping the
    // reliable flag here cannot leak into concurrently running suites
    // whose Checkpoints.truncate calls would otherwise take the reliable
    // path mid-test (round-10 ADVICE)
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.graft.reliableCheckpoint", "true")
    val out = Checkpoints.truncate(Seq(4, 5).toDF("x"))
    assert(out.count() === 2)
    val dir = s.sparkContext.getCheckpointDir
    assert(dir.isDefined, "reliable truncate must set a checkpoint dir")
    // second call reuses the dir (no churn), data still correct
    val out2 = Checkpoints.truncate(Seq(6).toDF("x"))
    assert(out2.count() === 1)
    assert(s.sparkContext.getCheckpointDir === dir)
    // the checkpointed data really lives under the dir (reloadable by
    // ANY executor — the property localCheckpoint lacks)
    val files = new java.io.File(new java.net.URI(dir.get))
    assert(files.exists)
  }
}

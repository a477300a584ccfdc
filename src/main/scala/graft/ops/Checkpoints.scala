package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage truncation with a fault-tolerance switch.
  *
  * Every iterative operator here (connected components, PageRank/HITS/LPA,
  * BPE rounds, Lloyd chains' cached frames) truncates lineage between
  * rounds. `localCheckpoint` is the right default: it caches the blocks on
  * executors (MEMORY_AND_DISK) with no filesystem round-trip. But it is
  * documented NON-fault-tolerant — the blocks live on exactly the executor
  * that computed them, so losing one executor mid-iteration makes the frame
  * unrecomputable and fails the job (Spark cannot rebuild a truncated
  * lineage). On a clean run that never happens; under the round-10 fault
  * gate (induced executor kills + speculation, dev/gate.sh GATE_FAULT) it
  * happens constantly — and it is exactly what a 1000-executor production
  * run experiences weekly.
  *
  * `spark.graft.reliableCheckpoint=true` (set automatically by
  * SparkBoot when SPARK_GRAFT_FAULT=1) switches every call site to a
  * RELIABLE `checkpoint()`: the frame is written to the checkpoint
  * directory (a real filesystem all executors share — at 100 TB that is
  * the object store), so any executor can reload it after a loss. The
  * checkpoint dir is set lazily from `spark.graft.checkpointDir` (default:
  * a per-session temp dir) and old checkpoint files are GC'd with the
  * frames that reference them (`spark.cleaner.referenceTracking
  * .cleanCheckpoints` is enabled by SparkBoot in fault mode). */
object Checkpoints {

  def truncate[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    val reliable = spark.conf
      .getOption("spark.graft.reliableCheckpoint").contains("true")
    if (!reliable) ds.localCheckpoint()
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) synchronized {
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption("spark.graft.checkpointDir")
            .getOrElse(java.nio.file.Files
              .createTempDirectory("graft-reliable-ckpt").toString)
          sc.setCheckpointDir(dir)
        }
      }
      ds.checkpoint()
    }
  }
}

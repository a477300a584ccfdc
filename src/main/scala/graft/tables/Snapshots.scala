package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a mutable corpus directory: MERGE-style upsert
  * and snapshot diff — the data-management half of an ingest pipeline (the
  * reference stops at INSERT; a living corpus needs replace-by-key and
  * "what changed since the last training run").
  *
  * Both operators are one shuffle keyed by the row key. At 100 TB the
  * upsert's anti join co-locates against a bucketed snapshot exactly like
  * incremental dedup (q82's wiring — pay the shuffle once at write); for a
  * hive-partitioned corpus, rewrite only the partitions the update batch
  * touches (dynamic partition overwrite) instead of the whole directory.
  *
  * Commit protocol — two modes, one API:
  *   - A [[VersionedTable]] root (has `_commits/`) commits via the
  *     pointer-swap log: write the full new version, then one atomic
  *     marker PUT. No renames — safe on object stores, where a 100 TB
  *     corpus actually lives.
  *   - A plain flat directory keeps the tmp-then-swap protocol, now
  *     through the Hadoop [[org.apache.hadoop.fs.FileSystem]] API (so
  *     `hdfs:` paths work and `file:` tests exercise the same code), with
  *     the same failure-point guarantee: every failure leaves a complete
  *     copy on disk. Directory rename is atomic on HDFS and local
  *     filesystems but copy+delete on S3 — use a versioned root there.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, path: String) = Hfs.fsFor(spark, path)

  /** Flat-directory replace via tmp-then-swap, never leaving a partial
    * dataset: the original moves aside first (same discipline as
    * [[Layout.compact]]); Hadoop FS renames, not `java.io.File`. */
  private def replaceDir(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val (fs, dst) = fsFor(spark, path)
    val base = path.stripSuffix("/")
    val tmp = new Path(base + ".upsert-tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(base + ".upsert-bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    require(fs.rename(dst, bak), s"upsert: could not move $path aside")
    if (!fs.rename(tmp, dst)) {
      fs.rename(bak, dst)
      throw new IllegalStateException(s"upsert: rename $tmp -> $path failed; original restored")
    }
    fs.delete(bak, true): Unit
  }

  /** Current snapshot contents, whichever commit protocol the root uses. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    if (VersionedTable.isVersioned(spark, path)) VersionedTable.read(spark, path)
    else spark.read.parquet(path)

  private def rewrite(spark: SparkSession, path: String)
      (transform: DataFrame => DataFrame): Unit =
    if (VersionedTable.isVersioned(spark, path)) {
      VersionedTable.commit(spark, path)(transform): Unit
    } else {
      // the tmp write executes the plan while `path` is still intact
      replaceDir(spark, transform(spark.read.parquet(path)), path)
    }

  /** MERGE-style upsert: rows of `updates` replace same-key rows of the
    * snapshot at `path`; new keys insert. One anti-join shuffle on `key`;
    * the update batch (the small side) broadcasts when it fits. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
      key: String): Unit =
    rewrite(spark, path) { existing =>
      require(existing.columns.sorted.sameElements(updates.columns.sorted),
        s"upsert: schema mismatch ${existing.columns.toSeq} vs ${updates.columns.toSeq}")
      val survivors = existing.join(
        broadcast(updates.select(col(key)).distinct()), Seq(key), "left_anti")
      updates.unionByName(survivors)
    }

  /** One row per key: the MAX over `orderCols` (then the remaining payload
    * as tie-break, so the pick is total even on duplicate versions) — a
    * single hash aggregation, no window sort. `orderCols` should be a
    * per-key total order (e.g. ts + a unique id) for CDC semantics. */
  def latestPerKey(df: DataFrame, key: String, orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(_ == key).toSeq
    val st = struct((orderCols ++ payload.filterNot(orderCols.contains)).map(col): _*)
    df.groupBy(col(key)).agg(max(st).as("__m"))
      .select(col(key) +: payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Version-aware upsert (CDC apply): merge `updates` into the snapshot
    * keeping, per key, the row that is LATEST by `orderCols` — regardless
    * of which side it came from. This is what makes out-of-order delivery
    * safe: a late-arriving batch with an older version cannot overwrite a
    * newer snapshot row (plain [[upsertByKey]] would let it). One hash
    * aggregation over existing ∪ updates. */
  def upsertLatestByKey(spark: SparkSession, path: String, updates: DataFrame,
      key: String, orderCols: Seq[String]): Unit =
    rewrite(spark, path) { existing =>
      require(existing.columns.sorted.sameElements(updates.columns.sorted),
        s"upsert: schema mismatch ${existing.columns.toSeq} vs ${updates.columns.toSeq}")
      latestPerKey(existing.unionByName(updates), key, orderCols)
    }

  /** CDC batch-sink step that is REPLAY-IDEMPOTENT at batch 0 (round-11
    * ADVICE): a streaming restart replays the first micro-batch if the
    * kill landed after some snapshot files committed but before the
    * checkpoint offset did — a bare `if (!exists) write.parquet(path)`
    * then takes the upsert path against a PARTIAL snapshot (possibly with
    * `_temporary` leftovers). Here the bootstrap is tmp-then-rename, so the
    * final path only ever appears complete (`_SUCCESS` inside the renamed
    * dir); a directory without the marker is a dead partial bootstrap and
    * is deleted before retrying. Replays after a COMPLETED bootstrap fall
    * through to [[upsertLatestByKey]], which re-merging the same batch
    * cannot change (latest-per-key of identical rows). */
  def bootstrapOrUpsertLatest(spark: SparkSession, path: String,
      updates: DataFrame, key: String, orderCols: Seq[String]): Unit = {
    val (fs, root) = fsFor(spark, path)
    val marker = new Path(root, "_SUCCESS")
    if (fs.exists(root) && !fs.exists(marker)) fs.delete(root, true)
    if (!fs.exists(root)) {
      val tmp = new Path(root.toString + ".bootstrap-tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      updates.write.parquet(tmp.toString)
      require(fs.rename(tmp, root),
        s"bootstrap: rename $tmp -> $path failed")
    } else upsertLatestByKey(spark, path, updates, key, orderCols)
  }

  /** Retention / right-to-erasure delete: rewrite the snapshot WITHOUT the
    * rows matching `predicate` (a failed delete never leaves a partial
    * dataset — pointer-swap or tmp-then-swap per the root's protocol).
    * This is the flat-layout path and touches all data once; for
    * date/tenant-partitioned corpora prefer [[dropPartitions]], which
    * deletes whole directories and touches no data at all. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Unit =
    rewrite(spark, path)(_.filter(!predicate))

  /** O(1)-data deletion for hive-partitioned layouts: drop the directories
    * of the named partition values outright. No rows are read or written —
    * at 100 TB this is the only acceptable shape for retention windows
    * ("drop months older than X") and per-tenant erasure. A recursive
    * `FileSystem.delete` per directory: no renames, object-store-safe
    * as-is. */
  def dropPartitions(spark: SparkSession, path: String, col: String,
      values: Seq[String]): Unit = {
    val (fs, _) = fsFor(spark, path)
    values.foreach { v =>
      val d = new Path(path, s"$col=$v")
      if (fs.exists(d)) fs.delete(d, true)
    }
  }

  /** Snapshot diff by key + content fingerprint: one row per key present in
    * either side, `status` ∈ added | removed | changed | unchanged. The
    * "what moved since the last run" report that decides an incremental
    * re-train; one full-outer shuffle on the key. */
  /** Column-level change attribution between two snapshots sharing a key
    * — the question row-status diffs can't answer: WHICH columns drive
    * the churn (a migration that was supposed to touch one field but
    * rewrote three shows up here, not in a row count). One NULL-safe
    * full-outer join, then |columns| conditional sums over the common
    * keys; returns one row per compared column
    * (column, n_changed, n_added, n_removed, n_common) with the row
    * ledger repeated on each row so a single result reads complete. */
  def columnDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnDiff: no columns to compare")
    val o = oldSnap.select(
      (col(key).as("k") +: (lit(1L).as("o_in") +:
        cols.map(c => col(c).as(s"o_$c")))): _*)
    val n = newSnap.select(
      (col(key).as("k") +: (lit(1L).as("n_in") +:
        cols.map(c => col(c).as(s"n_$c")))): _*)
    val j = o.join(n, Seq("k"), "full_outer")
    val common = col("o_in").isNotNull && col("n_in").isNotNull
    val aggs =
      Seq(sum(when(col("o_in").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("n_in").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(common, 1L).otherwise(0L)).as("n_common")) ++
      cols.map(c => sum(when(common && !(col(s"o_$c") <=> col(s"n_$c")),
        1L).otherwise(0L)).as(s"chg_$c"))
    // `one` is a single row but is consumed once PER COMPARED COLUMN by the
    // union below — left lazy, each consumption replays the full-outer join
    // and both snapshot scans (3 columns = 3 joins = 9 scans in q286's
    // un-truncated plan). Materialize the row once.
    val one = j.agg(aggs.head, aggs.tail: _*)
      .transform(graft.ops.Checkpoints.truncate(_))
    cols.map(c => one.select(lit(c).as("column"),
        col(s"chg_$c").as("n_changed"), col("n_added"), col("n_removed"),
        col("n_common")))
      .reduce(_ unionByName _)
  }

  def diffByFingerprint(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, fp: Column): DataFrame = {
    val o = oldSnap.select(col(key).as("k"), fp.as("old_fp"))
    val n = newSnap.select(col(key).as("k"), fp.as("new_fp"))
    o.join(n, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}

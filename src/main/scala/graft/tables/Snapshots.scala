package graft.tables

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
  */
object Snapshots {

  /** Write `df` to `path` via tmp-then-swap, never leaving a partial
    * dataset: the original moves aside first (same discipline as
    * [[Layout.compact]]). */
  private def replaceDir(df: DataFrame, path: String): Unit = {
    val tmp = path.stripSuffix("/") + ".upsert-tmp"
    df.write.mode("overwrite").parquet(tmp)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    val bak = new java.io.File(path.stripSuffix("/") + ".upsert-bak")
    if (bak.exists) rm(bak)
    require(new java.io.File(path).renameTo(bak), s"upsert: could not move $path aside")
    if (!new java.io.File(tmp).renameTo(new java.io.File(path))) {
      bak.renameTo(new java.io.File(path))
      throw new IllegalStateException(s"upsert: rename $tmp -> $path failed; original restored")
    }
    rm(bak)
  }

  /** MERGE-style upsert: rows of `updates` replace same-key rows of the
    * snapshot at `path`; new keys insert. One anti-join shuffle on `key`;
    * the update batch (the small side) broadcasts when it fits. */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
      key: String): Unit = {
    val existing = spark.read.parquet(path)
    require(existing.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert: schema mismatch ${existing.columns.toSeq} vs ${updates.columns.toSeq}")
    val survivors = existing.join(
      broadcast(updates.select(col(key)).distinct()), Seq(key), "left_anti")
    // replaceDir writes tmp first (the plan still reads `path` safely),
    // then swaps — no materialization needed
    replaceDir(updates.unionByName(survivors), path)
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
    * aggregation over existing ∪ updates, then the tmp-then-swap write. */
  def upsertLatestByKey(spark: SparkSession, path: String, updates: DataFrame,
      key: String, orderCols: Seq[String]): Unit = {
    val existing = spark.read.parquet(path)
    require(existing.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert: schema mismatch ${existing.columns.toSeq} vs ${updates.columns.toSeq}")
    replaceDir(latestPerKey(existing.unionByName(updates), key, orderCols), path)
  }

  /** Retention / right-to-erasure delete: rewrite the snapshot WITHOUT the
    * rows matching `predicate` (tmp-then-swap — a failed delete never
    * leaves a partial dataset). This is the flat-layout path and touches
    * all data once; for date/tenant-partitioned corpora prefer
    * [[dropPartitions]], which deletes whole directories and touches no
    * data at all. */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Unit =
    replaceDir(spark.read.parquet(path).filter(!predicate), path)

  /** O(1)-data deletion for hive-partitioned layouts: drop the directories
    * of the named partition values outright. No rows are read or written —
    * at 100 TB this is the only acceptable shape for retention windows
    * ("drop months older than X") and per-tenant erasure. */
  def dropPartitions(path: String, col: String, values: Seq[String]): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    values.foreach { v =>
      val d = new java.io.File(path, s"$col=$v")
      if (d.exists) rm(d)
    }
  }

  /** Snapshot diff by key + content fingerprint: one row per key present in
    * either side, `status` ∈ added | removed | changed | unchanged. The
    * "what moved since the last run" report that decides an incremental
    * re-train; one full-outer shuffle on the key. */
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

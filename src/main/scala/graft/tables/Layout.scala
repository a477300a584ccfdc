package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout control for data skipping: range- and Z-order-clustered
  * writes.
  *
  * `repartitionByRange(keys)` gives each output file a DISJOINT key range,
  * and `sortWithinPartitions` orders rows inside, so every parquet footer's
  * min/max statistics become selective: a reader filtering on the cluster
  * key prunes whole files (and row groups) without touching data. At 100 TB
  * this is the difference between scanning everything and scanning the one
  * file a date predicate selects. (The reference's `Part`/statistics model —
  * plan_partition.rs, plan_statistics.rs — stops at exact row counts; file
  * pruning is the Spark-native extension of it.)
  */
object Layout {

  def writeRangeClustered(df: DataFrame, path: String, files: Int, keys: Seq[Column]): Unit =
    df.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Hive-style partitioned write: one directory per distinct value of
    * `partitionCols` — the standard date/tenant/language layout at 100 TB.
    * Unlike footer-stats clustering (above), pruning here happens at FILE
    * LISTING time: a filter on the partition column never even enumerates
    * the other directories (`PartitionFilters` in the scan, asserted in
    * ScaleOpsSpec).
    *
    * The pre-write shuffle hash-clusters rows by (partition value, salt)
    * across the session's full shuffle parallelism: each partition VALUE
    * lands in at most `filesPerPartition` tasks (the content-hash salt
    * spreads large values), so every directory gets at most
    * `filesPerPartition` files — the small-file-storm guard (a naive
    * partitioned write of a wide shuffle emits one file per task × value) —
    * while all tasks write IN PARALLEL. The tempting spelling
    * `repartition(filesPerPartition, cols)` sets the TOTAL partition count
    * to `filesPerPartition` and serializes the entire write through that
    * many tasks — a single-task write at the default, the same scale-killer
    * class as a global-window rank pass. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    val salt = pmod(hash(df.columns.map(col): _*), lit(filesPerPartition))
    df.repartition((partitionCols.map(col) :+ salt): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** [[compact]] preserving a clustered layout: plain compaction
    * `repartition(files)` hash-scatters rows, so a range-clustered
    * table's disjoint per-file key ranges — and every footer-stats prune
    * a reader relied on — silently dissolve on the first maintenance
    * pass. This variant re-clusters while it compacts
    * (`repartitionByRange` + in-file sort on `clusterKeys`), so the
    * layout contract survives maintenance. Same commit protocols as
    * [[compact]] (versioned root → pointer-swap; flat dir → Hadoop-FS
    * tmp-then-swap). */
  def compactClustered(spark: org.apache.spark.sql.SparkSession, path: String,
      clusterKeys: Seq[Column], targetBytes: Long = 128L << 20): Unit =
    compactImpl(spark, path, targetBytes, Some(clusterKeys))

  /** Small-file compaction: rewrite a parquet dataset into ~`targetBytes`
    * files (computed from the CURRENT on-disk size, so compaction is
    * idempotent). The read side of a 100 TB pipeline degrades linearly with
    * file count — listing, footer fetches, task scheduling are all per-file
    * — and streaming/incremental sinks produce exactly this fragmentation;
    * scheduled compaction is the standing fix. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L << 20): Unit =
    compactImpl(spark, path, targetBytes, None)

  private def compactImpl(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long, clusterKeys: Option[Seq[Column]]): Unit = {
    // all metadata through the Hadoop FileSystem resolved from the path URI
    // (file:/hdfs:/s3a: — same code), never java.io.File, which sees
    // nothing on a cluster filesystem
    val (fs, root) = Hfs.fsFor(spark, path)
    // A versioned root commits compaction as a new pointer-swapped version:
    // full rewrite, one atomic marker PUT, no renames — the object-store
    // path (see VersionedTable; directory rename on S3 is copy+delete).
    def shaped(df: DataFrame, files: Int): DataFrame = clusterKeys match {
      case Some(keys) => df.repartitionByRange(files, keys: _*)
        .sortWithinPartitions(keys: _*)
      case None => df.repartition(files)
    }
    if (VersionedTable.isVersioned(spark, path)) {
      val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(root,
        s"v${VersionedTable.currentVersion(spark, path).get}")).getLength
      val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      VersionedTable.commit(spark, path)(shaped(_, files))
      return
    }
    // Hive-partitioned layout: compact each partition DIRECTORY in place
    // (recursing through nested partition levels). Compacting the root as
    // one dataset would read with partition inference and rewrite flat —
    // partition columns silently become data columns and every directory
    // (with its listing-time pruning) disappears.
    val partDirs = fs.listStatus(root)
      .filter(f => f.isDirectory && f.getPath.getName.contains("="))
    if (partDirs.nonEmpty) {
      partDirs.foreach(d =>
        compactImpl(spark, d.getPath.toString, targetBytes, clusterKeys))
      return
    }
    val bytes = fs.getContentSummary(root).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val base = path.stripSuffix("/")
    val tmp = new org.apache.hadoop.fs.Path(base + ".compact-tmp")
    shaped(df, files).write.mode("overwrite").parquet(tmp.toString)
    // non-destructive swap: the original moves aside FIRST, so every failure
    // point leaves a complete copy on disk (the write above, the rename in,
    // or the final cleanup — never a window with only a partial dataset).
    // Atomic on HDFS/local; object stores should use a versioned root.
    val bak = new org.apache.hadoop.fs.Path(base + ".compact-bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    require(fs.rename(root, bak), s"compact: could not move $path aside")
    if (!fs.rename(tmp, root)) {
      fs.rename(bak, root) // roll back
      throw new IllegalStateException(s"compact: rename $tmp -> $path failed; original restored")
    }
    fs.delete(bak, true): Unit
  }

  /** Morton (Z-order) interleave of two `bits`-bit nonneg ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure shift/or expression
    * tree — codegen'd, no UDF. */
  def morton(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-order-clustered write: files are clustered on the Morton interleave
    * of the two columns' quantile ranks, so footer min/max statistics stay
    * selective on BOTH dimensions at once — a range-clustered layout prunes
    * perfectly on its leading key and not at all on the second; Z-order
    * trades a little of the first dimension's locality for pruning on both.
    *
    * Ranks come from a SAMPLED QUANTILE MAP, not a global sort: one
    * `approxQuantile` pass (Greenwald–Khanna sketch — bounded memory per
    * partition, merged on the driver, never shuffled) yields the 2^bits
    * bucket boundaries per dimension, and each row ranks itself against the
    * broadcast boundary array with a codegen'd binary search
    * ([[graft.functions.SearchSorted]]). A `ntile` window would funnel the
    * whole dataset through ONE task per dimension — at 100 TB that write
    * never completes; the sketch pass is embarrassingly parallel and the
    * rank map it produces is a few KB regardless of data size. */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
      a: Column, b: Column, bits: Int = 12): Unit = {
    val buckets = 1 << bits
    val tagged = df.withColumn("__za", a.cast("double")).withColumn("__zb", b.cast("double"))
    // boundary at each interior quantile; sketch error a quarter-bucket so
    // neighboring buckets stay distinct where the data has spread
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val eps = 1.0 / (4.0 * buckets)
    val Array(qa, qb) = tagged.stat.approxQuantile(Array("__za", "__zb"), probs, eps)
    val ra = graft.functions.SearchSorted.searchSorted(col("__za"), qa)
    val rb = graft.functions.SearchSorted.searchSorted(col("__zb"), qb)
    tagged.withColumn("__z", morton(ra, rb, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__za", "__zb")
      .write.mode("overwrite").parquet(path)
  }
}

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided star schema (`TESTDATA.md`) plus the
  * reference's virtual tables.
  *
  * Mirrors the reference's `Table` trait surface
  * (fusequery/query/src/datasources/table.rs:19-51) re-expressed as plain
  * DataFrame readers: Spark's DataSource V2 + Catalyst supply the scan
  * pushdown slots (`plan_scan.rs:14-22`) natively — `.explain` shows
  * `PushedFilters`/`ReadSchema` when callers filter/project.
  */
object Tables {
  val starSchema: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one star-schema table from an sf directory. Parquet scan: column
    * pruning + predicate pushdown happen in Catalyst; do not pre-cache (at
    * 100 TB the scan must stream, not pin). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Read the events table, normalizing `ts` to TimestampType (µs, session
    * TZ = UTC) whatever the generator wrote:
    *   - TIMESTAMP(NANOS) footers: Spark's vectorized reader rejects nanos,
    *     so read raw longs (`nanosAsLong`) and rebuild the µs timestamp with
    *     integer division (a plain `/` would go through double and lose
    *     precision above 2^53 ns);
    *   - plain timestamp[us] footers (current generator): read natively;
    *     NTZ → LTZ cast is value-identical under the UTC session TZ. */
  def events(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = eventsRaw(spark, path)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Batch-read events with `ts` in its on-disk type: raw nano longs for
    * TIMESTAMP(NANOS) footers (flipping the sticky legacy conf on first
    * contact), the native timestamp type otherwise. The streaming source
    * probes this schema to build its own. */
  private[graft] def eventsRaw(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      // nanos footer rejected at schema inference — flip the legacy long
      // reader and retry (conf is sticky; later reads take the LongType arm)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
    }

  /** Register every star-schema table as a temp view so `spark.sql` queries
    * (EXISTS/scalar subqueries, CTEs) can reference them by name.
    *
    * Memoized per (session, sfDir): each `spark.read.parquet` costs a file
    * listing + footer schema read, so re-registering ten tables on every
    * statement added ~0.5 s of pure catalog overhead per dialect entry
    * (q38 was the visible case). Temp views are session-scoped and nothing
    * else writes these names (q96's scratch table uses its own name), so a
    * second call with the same sfDir is a provable no-op. A different sfDir
    * re-registers — Verify/Bench runs that switch scale factors stay
    * correct. */
  private val registered = new java.util.WeakHashMap[SparkSession, String]
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    registered.synchronized {
      // the memo can go stale if a caller drops temp views wholesale
      // (Bench's group hygiene does) — or drops/shadows a SINGLE view while
      // the rest survive, so every name is probed: ten catalog existence
      // checks are in-memory map lookups (~µs), still ~1000x cheaper than
      // ten parquet footer reads, and the probe no longer assumes
      // registration is all-or-nothing (round-9 ADVICE finding).
      if (registered.get(spark) != sfDir ||
          !starSchema.forall(spark.catalog.tableExists)) {
        starSchema.foreach { n =>
          table(spark, sfDir, n).createOrReplaceTempView(n)
        }
        registered.put(spark, sfDir)
      }
    }

  /** Reference `numbers(N)` / `numbers_mt(N)` table function
    * (datasources/system/numbers_table.rs:28-137): a virtual `number: UInt64`
    * column, 0..N, generated in parallel partitions. Spark-native mapping is
    * `spark.range` — generated per-partition with exact statistics, no I/O.
    * UInt64 → LongType (SURVEY.md §1.2; all test ranges < 2^63). */
  def numbers(spark: SparkSession, n: Long, partitions: Option[Int] = None): DataFrame = {
    val parts = partitions.getOrElse(spark.sparkContext.defaultParallelism)
    spark.range(0L, n, 1L, parts).withColumnRenamed("id", "number")
  }
}

package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's virtual system database
  * (fusequery/query/src/datasources/system/system_database.rs:19-58):
  * `system.one`, `system.databases`, `system.tables`, `system.settings`,
  * `system.functions`, `system.contributors`, `system.clusters`,
  * `system.processes` — small metadata relations over engine state.
  *
  * Spark-native restatement: tiny literal DataFrames over `spark.catalog` and
  * the session conf, registered as temp views. Temp-view names cannot carry a
  * dot, so the SQL dialect layer rewrites `system.x` → `system_x`
  * (graft.sql.Dialect). These relations are driver-side by design — metadata,
  * never data-scale.
  */
object SystemTables {

  /** `system.one` (datasources/system/one_table.rs): one row, `dummy=1`;
    * the scan target for constant-only SELECTs. */
  def one(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(1.toByte).toDF("dummy")
  }

  def databases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().collect().map(_.name).toSeq.toDF("name")
  }

  /** Catalog tables across ALL databases plus the virtual system tables
    * themselves (tables_table.rs lists them under database `system` with
    * `System<Name>` engines); temp views are engine machinery, not tables. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // dialect-created tables carry their reference engine label ("CSV",
    // "remote", …) — tables_table.rs renders Table::engine(); Spark's
    // tableType stands in for tables created outside the dialect
    val labels = graft.sql.GraftSession.tableEngines(spark)
    val catalog = spark.catalog.listDatabases().collect().map(_.name).toSeq
      .flatMap(db => spark.catalog.listTables(db).collect()
        .filter(!_.isTemporary)
        .map(t => (db, t.name,
          labels.getOrElse(s"$db.${t.name}".toLowerCase, t.tableType))))
    val virtual = all.map(n => ("system", n, s"System${n.capitalize}"))
    (catalog ++ virtual).toDF("database", "name", "engine")
  }

  def settings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // engine settings (SET max_threads=… registry) overlay the Spark conf,
    // like the reference's settings table (system/settings_table.rs)
    (spark.conf.getAll ++ graft.sql.GraftSession.settingsRegistry(spark).toMap)
      .toSeq.sorted.toDF("name", "value")
  }

  def functions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect().map(_.name).sorted.toSeq.toDF("name")
  }

  /** Static metadata tables (contributors_table.rs, clusters_table.rs,
    * processes_table.rs) — shape parity; content is this engine's. */
  def contributors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("graft").toDF("name")
  }

  def clusters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("local", "localhost", 0L)).toDF("name", "address", "priority")
  }

  def processes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.statusTracker.getActiveJobIds().map(_.toLong)
      .toSeq.toDF("id")
  }

  // ---- system.tracing -----------------------------------------------------

  /** `system.tracing` analogue (tracing_table.rs:32-44): the reference
    * tails its own JSON tracing log — one row per engine event, schema
    * (v, name, msg, level, hostname, pid, time). The Spark-native
    * restatement keeps a bounded per-session ring of engine events: one
    * per front-door statement ([[graft.sql.GraftSession]].sql) and one per
    * action completion (QueryExecutionListener), with `msg` carrying the
    * statement/action text plus duration and row count — the same
    * free-text cost-message style as the reference's log lines. Driver-
    * side metadata by design, never data-scale: the ring caps at 1024. */
  private val traceBufs =
    new java.util.WeakHashMap[SparkSession,
      java.util.ArrayDeque[(String, Int, java.time.Instant)]]

  private def traceBuf(spark: SparkSession) = traceBufs.synchronized {
    var b = traceBufs.get(spark)
    if (b == null) {
      b = new java.util.ArrayDeque[(String, Int, java.time.Instant)]()
      traceBufs.put(spark, b)
    }
    b
  }

  /** Append one trace event (level follows the reference's numeric log
    * levels — 20 info, 50 error). */
  def trace(spark: SparkSession, msg: String, level: Int = 20): Unit = {
    val b = traceBuf(spark)
    b.synchronized {
      b.addLast((msg, level, java.time.Instant.now()))
      if (b.size > 1024) b.removeFirst()
    }
  }

  /** Install the action-completion listener once per session (idempotent).
    * QueryExecutionListener events arrive asynchronously on the listener
    * bus; readers of `system.tracing` see completed actions on the next
    * scan, exactly as the reference sees flushed log lines. */
  private val listenerInstalled = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def installTraceListener(spark: SparkSession): Unit =
    if (listenerInstalled.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val rows = qe.executedPlan.metrics.get("numOutputRows")
              .map(_.value).getOrElse(-1L)
            trace(spark,
              s"action $funcName: $rows rows, cost ${durationNs / 1000000} ms")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              ex: Exception): Unit =
            trace(spark, s"action $funcName FAILED: ${ex.getMessage}", 50)
        })

  /** Current ring depth WITHOUT a Spark action — metrics endpoints must not
    * fire the very QueryExecutionListener whose counters they report. */
  def tracingDepth(spark: SparkSession): Int = {
    val b = traceBuf(spark)
    b.synchronized(b.size)
  }

  def tracing(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val b = traceBuf(spark)
    val snap = b.synchronized {
      val it = b.iterator(); val out = Seq.newBuilder[(String, Int, java.time.Instant)]
      while (it.hasNext) out += it.next()
      out.result()
    }
    val pid = ProcessHandle.current().pid()
    snap.map { case (msg, level, t) =>
      (0L, "graft", msg, level.toByte, "localhost", pid,
        java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME.format(
          t.atOffset(java.time.ZoneOffset.UTC)))
    }.toDF("v", "name", "msg", "level", "hostname", "pid", "time")
  }

  val all: Seq[String] = Seq("one", "databases", "tables", "settings",
    "functions", "contributors", "clusters", "processes", "tracing")

  /** (Re-)register ONE system table as its `system_<name>` temp view —
    * the on-use form: these views are CATALOG SNAPSHOTS (listDatabases ×
    * listTables for `tables`, listFunctions for `functions` — hundreds of
    * metastore round trips), so building all nine eagerly per session, or
    * refreshing all nine because a query touched one, is measurable
    * front-door latency paid for nothing. The SQL layer registers exactly
    * the views a statement references, at reference semantics (live
    * metadata on every scan — system_database.rs). */
  def register(spark: SparkSession, name: String): Unit = (name match {
    case "one" => one(spark)
    case "databases" => databases(spark)
    case "tables" => tables(spark)
    case "settings" => settings(spark)
    case "functions" => functions(spark)
    case "contributors" => contributors(spark)
    case "clusters" => clusters(spark)
    case "processes" => processes(spark)
    case "tracing" => tracing(spark)
    case other => throw new IllegalArgumentException(s"no system table $other")
  }).createOrReplaceTempView(s"system_$name")

  /** Register every system table as `system_<name>` temp view. */
  def registerAll(spark: SparkSession): Unit = all.foreach(register(spark, _))
}

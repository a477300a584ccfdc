package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

import graft.functions.HashExpressions
import graft.tables.SystemTables

/** The engine's SQL entry point — the Spark restatement of the reference's
  * session + PlanParser front door (fusequery/query/src/sessions/,
  * sql/plan_parser.rs:87-130):
  *
  *   - `sql(text)` accepts the reference dialect (SHOW, numbers(), LIMIT BY,
  *     combinator suffixes, system tables, `CREATE TABLE ... ENGINE = ...`)
  *     and delegates everything else to Spark SQL — SELECT/INSERT/DDL/SET/
  *     EXPLAIN/DESCRIBE/USE are native;
  *   - scalar functions the reference ships that Spark lacks are registered
  *     as Catalyst expressions (siphash64, simhash64) so SQL text can call
  *     them inside whole-stage codegen;
  *   - system tables register as `system_*` views (SystemTables).
  *
  * Interpreter dispatch (interpreters/interpreter_factory.rs) and the
  * optimizer (optimizers/optimizer.rs) have no code here on purpose: Catalyst
  * subsumes them (SURVEY.md §4.1).
  */
class GraftSession(val spark: SparkSession) {

  // system views register ON USE (sql() below): they are catalog snapshots
  // whose eager construction cost 2-3 s of front-door latency per session
  // and was refreshed wholesale on every system query — the round-7 q38
  // profiling finding. Reference semantics are unchanged: a scan reads
  // live metadata, because the view re-registers right before each use.
  SystemTables.installTraceListener(spark)
  GraftSession.registerFunctions(spark)
  graft.plans.CountFromStats.install(spark)
  graft.plans.TopKStrategy.install(spark)
  graft.plans.RangeAggStrategy.install(spark)

  /** `CREATE TABLE name (cols) ENGINE = CSV|Parquet|Memory|Null
    * [location = 'p'] [has_header = true]` (sql/sql_parser.rs:126-186,
    * datasources/local: csv_table.rs, parquet_table.rs, null_table.rs)
    * → Spark `USING csv|parquet OPTIONS(...)`.
    * Memory/Null map to managed parquet tables (Null's discard-on-write has
    * no Spark catalog analogue; reads-start-empty holds either way). */
  private val CreateTableRe =
    """(?is)^(CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[\w.]+\s*\(.*?\))\s*ENGINE\s*=\s*(\w+)(.*)$""".r
  private val LocationRe = """(?i)location\s*=\s*'([^']+)'""".r
  private val HeaderRe = """(?i)has_header\s*=\s*(true|1)""".r

  private val CreateDbRe =
    """(?is)^(CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?[\w.]+)\s+ENGINE\s*=\s*\w+\s*$""".r
  private val DropDbRe =
    """(?is)^(DROP\s+DATABASE\s+(?:IF\s+EXISTS\s+)?[\w.]+)\s*$""".r

  /** Reference columns default to NOT NULL (`DataField.nullable=false`
    * unless declared — data_field.rs:11); Spark DDL defaults nullable. */
  private def notNullColumns(cols: String): String =
    splitTopLevel(cols).map { c =>
      if ("""(?i)\bnull\b""".r.findFirstIn(c).isDefined) c.trim
      else c.trim + " NOT NULL"
    }.mkString(", ")

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0
    s.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => out += s.substring(start, i); start = i + 1
      case _ =>
    }
    out += s.substring(start)
    out.toSeq
  }

  private val CreateHeadRe =
    """(?is)^(CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+))\s*\((.*)\)$""".r

  /** Declared NOT NULL columns per table. Spark's file-source catalog
    * relaxes nullability on read, so DESCRIBE consults the DDL declaration
    * (the reference's catalog keeps `DataField.nullable` as declared). */
  private val declaredNotNull = scala.collection.mutable.Map[String, Set[String]]()

  private def recordNullability(table: String, cols: String): Unit = {
    val nn = splitTopLevel(cols).flatMap { c =>
      val name = c.trim.split("\\s+").headOption.getOrElse("")
      val explicitNullable = """(?i)\bnull\b""".r.findFirstIn(c).isDefined &&
        """(?i)not\s+null""".r.findFirstIn(c).isEmpty
      if (explicitNullable || name.isEmpty) None else Some(name.toLowerCase)
    }.toSet
    declaredNotNull(table.toLowerCase) = nn
    declaredNotNull(table.split("\\.").last.toLowerCase) = nn
  }

  /** Reference engine label per dialect-created engine keyword — what
    * `system.tables` renders (the reference's `Table::engine()` strings:
    * csv_table.rs:65 "CSV", remote_table.rs "remote", …). */
  private def engineLabel(engine: String): String = engine.toLowerCase match {
    case "csv" => "CSV"
    case "parquet" => "Parquet"
    case "json" => "JSON"
    case "orc" => "ORC"
    case "memory" => "Memory"
    case "null" => "Null"
    case "remote" => "remote"
    case other => other
  }

  /** Reference column types Spark's DDL parser lacks a bare spelling for. */
  private def mapRefTypes(cols: String): String =
    cols.replaceAll("(?i)\\bvarchar\\b(?!\\s*\\()", "STRING")
      .replaceAll("(?i)\\bdatetime\\b", "TIMESTAMP")

  /** `ENGINE = Remote` (and bare CREATEs under `SET default_engine =
    * remote`, the reference's distributed-build default): the table's data
    * lives in this session's STORE NODE (GraftSession.store — an
    * HttpApiServer with the /v1/remote endpoints, the fusestore analogue)
    * and the catalog entry reads/writes it through the `graft-remote` DSv2
    * connector, so INSERT streams over the wire (staged append + commit)
    * and SELECT fetches splits with pushdown — remote_table.rs semantics
    * end to end. */
  private def remoteCreate(head: String, tbl: String, cols: String): String = {
    recordNullability(tbl, cols)
    val (srv, port, root) = GraftSession.store(spark)
    val parts = tbl.split("\\.")
    val (db, name) =
      if (parts.length == 2) (parts(0), parts(1))
      else (spark.catalog.currentDatabase, parts(0))
    val key = s"${db}__$name"
    val dir = s"$root/$db/$name"
    val exists = try spark.catalog.tableExists(s"$db.$name")
      catch { case _: Exception => false }
    if (!exists) {
      // fresh incarnation: a leftover dir from a dropped same-name table
      // must not resurrect its rows
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        mapRefTypes(cols).replaceAll("(?i)\\s+not\\s+null", ""))
      srv.registerRemoteTable(key, dir, Some(schema))
    }
    GraftSession.tableEngines(spark)(s"$db.$name".toLowerCase) = "remote"
    s"$head (${notNullColumns(mapRefTypes(cols))}) USING `graft-remote` " +
      s"OPTIONS (url 'http://127.0.0.1:$port', `table` '$key')"
  }

  private def recordEngine(tbl: String, label: String): Unit = {
    val parts = tbl.split("\\.")
    val (db, name) =
      if (parts.length == 2) (parts(0), parts(1))
      else (spark.catalog.currentDatabase, parts(0))
    GraftSession.tableEngines(spark)(s"$db.$name".toLowerCase) = label
  }

  private def rewriteCreate(sql: String): Option[String] = sql.trim match {
    case CreateTableRe(head, engine, rest) if engine.equalsIgnoreCase("remote") =>
      val _ = rest // Remote takes no location options
      head match {
        case CreateHeadRe(h, tbl, cols) => Some(remoteCreate(h, tbl, cols))
        case _ => throw new IllegalArgumentException(s"cannot parse: $head")
      }
    case CreateTableRe(head, engine, rest) =>
      val opts = scala.collection.mutable.ArrayBuffer[String]()
      LocationRe.findFirstMatchIn(rest).foreach(m => opts += s"path '${m.group(1)}'")
      if (HeaderRe.findFirstIn(rest).isDefined) opts += "header 'true'"
      val using = engine.toLowerCase match {
        case "csv" => "csv"
        case "parquet" => "parquet"
        case "json" => "json" // beyond-reference formats Spark gives for free
        case "orc" => "orc"
        case "memory" | "null" => "parquet"
        case other => throw new IllegalArgumentException(s"unknown engine $other")
      }
      val optClause = if (opts.nonEmpty) opts.mkString(" OPTIONS (", ", ", ")") else ""
      val headNN = head match {
        case CreateHeadRe(h, tbl, cols) =>
          recordNullability(tbl, cols)
          recordEngine(tbl, engineLabel(engine))
          s"$h (${notNullColumns(cols)})"
        case _ => head
      }
      Some(s"$headNN USING $using$optClause")
    // bare CREATE under the remote default engine (the reference's
    // distributed build defaults to the remote/fusestore engine — the 09_*
    // suites' CREATEs carry no ENGINE clause)
    case CreateHeadRe(h, tbl, cols)
        if settings.get("default_engine").exists(_.equalsIgnoreCase("remote")) =>
      Some(remoteCreate(h, tbl, cols))
    case CreateDbRe(create) => Some(create) // ENGINE=Local is the only engine
    case DropDbRe(drop) => Some(s"$drop CASCADE") // reference drops tables too
    case _ => None
  }

  /** `DESCRIBE t` with reference type names (§1.2 mapping, reversed) and
    * reference nullability rendering (10_0000_describe_table golden). */
  private val DescRe = """(?is)^DESC(?:RIBE)?\s+(?:TABLE\s+)?([\w.]+)\s*$""".r

  private def refTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "Utf8"
      case BooleanType => "Boolean"
      case BinaryType => "Binary"
      case DateType => "Date32"
      case _: TimestampType => "Timestamp"
      case NullType => "Null"
      case other => other.sql
    }
  }

  private def describe(table: String): DataFrame = {
    import spark.implicits._
    val nn = declaredNotNull.getOrElse(table.toLowerCase,
      declaredNotNull.getOrElse(table.split("\\.").last.toLowerCase, Set.empty[String]))
    spark.table(table).schema.fields.toSeq
      .map { f =>
        val nullable = if (nn.nonEmpty) !nn.contains(f.name.toLowerCase) else f.nullable
        (f.name, refTypeName(f.dataType), if (nullable) "YES" else "NO")
      }
      .toDF("Field", "Type", "Null")
  }

  /** Engine settings registry (sessions/settings.rs): `SET name = value` for
    * dot-free reference setting names lands here instead of Spark's conf;
    * `max_threads` maps onto the one Spark knob with the same meaning for a
    * local pipeline. Reference SET produces no result rows. Per-SparkSession
    * (so `system.settings`/SHOW SETTINGS can surface it). */
  val settings: scala.collection.mutable.Map[String, String] =
    GraftSession.settingsRegistry(spark)

  private val SetRe = """(?is)^SET\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$""".r

  /** `EXPLAIN GRAPH <stmt>` (sql_parser.rs:196, plan_display.rs:18-34):
    * one Utf8 `explain` row holding a GraphViz digraph of the optimized
    * plan. The reference renders an empty `digraph {}` (display_graphviz is
    * a TODO); here the nodes and dataflow edges are real. */
  private val ExplainGraphRe = """(?is)^EXPLAIN\s+GRAPH\s+(.+)$""".r

  /** Restricted MERGE surface over parquet snapshot directories (the
    * reference has no MERGE; this is the SQL spelling of
    * [[graft.tables.Snapshots.upsertByKey]] — full-row semantics only, the
    * form a corpus-maintenance pipeline actually issues):
    * {{{
    * MERGE INTO LOCATION '<dir>' USING (<select>) ON <key>
    *   WHEN MATCHED THEN UPDATE SET *
    *   WHEN NOT MATCHED THEN INSERT *
    * }}}
    * `USING <table>` (unparenthesized) is accepted as shorthand for
    * `USING (SELECT * FROM <table>)`. Returns one row
    * (n_source_rows, n_matched, snapshot_rows) so scripts can assert
    * effect — n_matched is the count of source keys that hit an existing
    * snapshot row (an UPDATE), computed against the pre-merge snapshot. */
  private val MergeRe =
    ("""(?is)^MERGE\s+INTO\s+LOCATION\s+'([^']+)'\s+USING\s+(?:\((.+)\)|([\w.]+))\s+""" +
      """ON\s+(\w+)\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$""").r

  private def runMerge(path: String, sourceSql: String, key: String): DataFrame = {
    // localCheckpoint (eager): the source SELECT executes exactly ONCE — a
    // non-deterministic source must merge and report the SAME row set, and
    // the matched-count probe below must see the rows that were written
    val updates = sql(sourceSql).transform(graft.ops.Checkpoints.truncate(_))
    // matched = source keys present in the PRE-merge snapshot (true UPDATE
    // count); computed before upsert rewrites the directory
    // readSnapshot resolves either commit protocol: a flat parquet dir or a
    // VersionedTable root (pointer-swap commits) both accept MERGE INTO
    val nMatched = updates.select(col(key)).distinct()
      .join(graft.tables.Snapshots.readSnapshot(spark, path).select(col(key)).distinct(),
        Seq(key), "left_semi")
      .count()
    val nSource = updates.count()
    graft.tables.Snapshots.upsertByKey(spark, path, updates, key)
    val total = graft.tables.Snapshots.readSnapshot(spark, path).count()
    spark.createDataFrame(Seq((nSource, nMatched, total)))
      .toDF("n_source_rows", "n_matched", "snapshot_rows")
  }

  private def explainGraph(inner: String): DataFrame = {
    import spark.implicits._
    val plan = spark.sql(Dialect.rewrite(inner)).queryExecution.optimizedPlan
    val sb = new StringBuilder
    sb.append("// Begin Graft GraphViz Plan (see https://graphviz.org)\n")
    sb.append("digraph {\n")
    var nextId = 0
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def walk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      val id = nextId; nextId += 1
      sb.append(s"""  n$id [label="${esc(p.simpleString(4))}"];\n""")
      // dataflow direction: child feeds parent
      p.children.foreach(c => sb.append(s"  n${walk(c)} -> n$id;\n"))
      id
    }
    walk(plan)
    sb.append("}\n")
    sb.append("// End Graft GraphViz Plan")
    Seq(sb.toString).toDF("explain")
  }

  private val SysViewRe = """(?i)system_(one|databases|tables|settings|functions|contributors|clusters|processes|tracing)""".r

  /** Front door with statement tracing: every statement lands one
    * `system.tracing` row carrying its text and plan-time cost (execution
    * cost arrives separately via the action listener). The trace appends
    * AFTER the dispatched statement plans, so a query over system.tracing
    * reads the snapshot taken at view refresh and never contains itself. */
  def sql(text: String): DataFrame = {
    val t0 = System.nanoTime()
    try {
      val out = sqlDispatch(text)
      SystemTables.trace(spark, s"statement: ${text.trim.take(256)}, " +
        s"plan cost ${(System.nanoTime() - t0) / 1000000} ms")
      out
    } catch { case e: Throwable =>
      SystemTables.trace(spark,
        s"statement FAILED: ${text.trim.take(256)}: ${e.getMessage}", 50)
      throw e
    }
  }

  private val DropTableStmtRe =
    """(?is)^(DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+))\s*$""".r
  private val DropDbStmtRe =
    """(?is)^(DROP\s+DATABASE\s+(?:IF\s+EXISTS\s+)?([\w.]+))\s*$""".r

  /** After a successful DROP, release the dialect-side artifacts: engine
    * label, and — for Remote tables — the store registration and its data
    * dir (the reference's drop reaches the store service the same way). */
  private def releaseTable(db: String, name: String): Unit = {
    val engines = GraftSession.tableEngines(spark)
    val qual = s"$db.$name".toLowerCase
    if (engines.remove(qual).contains("remote"))
      GraftSession.storeIfStarted(spark).foreach { case (srv, _, root) =>
        srv.dropRemoteTable(s"${db}__$name")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(s"$root/$db/$name"))
      }
  }

  private def sqlDispatch(text: String): DataFrame = text.trim.stripSuffix(";").trim match {
    case SetRe(key, value) if !key.contains(".") =>
      settings(key.toLowerCase) = value
      if (key.equalsIgnoreCase("max_threads"))
        spark.conf.set("spark.sql.shuffle.partitions", value)
      spark.emptyDataFrame
    case DropTableStmtRe(whole, tbl) =>
      val df = spark.sql(whole) // throws first if the table is absent
      val parts = tbl.split("\\.")
      val (db, name) =
        if (parts.length == 2) (parts(0), parts(1))
        else (spark.catalog.currentDatabase, parts(0))
      releaseTable(db, name)
      df
    case DropDbStmtRe(whole, db) =>
      val df = spark.sql(s"$whole CASCADE") // reference drops tables too
      GraftSession.tableEngines(spark).keys
        .filter(_.startsWith(db.toLowerCase + ".")).toSeq
        .foreach(q => releaseTable(db, q.substring(db.length + 1)))
      df
    case DescRe(table) => describe(table)
    case ExplainGraphRe(inner) => explainGraph(inner)
    case MergeRe(path, subquery, table, key) =>
      runMerge(path,
        Option(subquery).getOrElse(s"SELECT * FROM $table"), key)
    case t =>
      val rewritten = rewriteCreate(t).getOrElse(Dialect.rewrite(t))
      // system views are catalog snapshots — (re-)register exactly the
      // ones this statement references, right before use, so DDL executed
      // since the last registration is visible (system_database.rs reads
      // live metadata on every scan) and statements touching none pay
      // nothing
      SysViewRe.findAllMatchIn(rewritten).map(_.group(1).toLowerCase)
        .toSet[String].foreach(SystemTables.register(spark, _))
      spark.sql(rewritten)
  }
}

object GraftSession {
  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)

  /** One dialect session per SparkSession (weakly held): construction
    * registers the function registry and installs the planner strategies
    * (system views register lazily on use — the catalog enumeration that
    * once cost ~2-3 s per construction is gone). Driver queries that
    * enter through the SQL front door share the cached instance the way a
    * real application holds one session. */
  private val sessions = new java.util.WeakHashMap[SparkSession, GraftSession]

  def cached(spark: SparkSession): GraftSession = sessions.synchronized {
    var g = sessions.get(spark)
    if (g == null) { g = new GraftSession(spark); sessions.put(spark, g) }
    g
  }

  /** One ISOLATED session per wire-protocol connection — the Spark
    * restatement of the reference's per-session `FuseQueryContext`
    * (fusequery/query/src/sessions/settings.rs:21-33, one settings object
    * per session): `root.newSession()` shares the SparkContext, cached
    * blocks and the persistent catalog, but owns its SQLConf, current
    * database, temp views and function registry — so one connection's
    * `USE db` / `SET x = y` is invisible to every other connection.
    * Construction re-registers the graft function surface on the new
    * session's own registry (driver-local map inserts, microseconds). */
  def forConnection(root: SparkSession): GraftSession = {
    val s = root.newSession()
    // a fresh session starts from SparkConf defaults, not the root's RUNTIME
    // conf — inherit the server operator's tuning (ansi mode, shuffle
    // partitions, …) as the connection's STARTING point, the way a freshly
    // accepted reference session snapshots the server settings; the
    // connection's own SETs then apply to its session only
    val defaults = s.conf.getAll
    root.conf.getAll.foreach { case (k, v) =>
      if (defaults.get(k) != Some(v) && s.conf.isModifiable(k))
        s.conf.set(k, v)
    }
    new GraftSession(s)
  }

  /** Per-session STORE NODE for ENGINE=Remote tables — the fusestore
    * analogue: an HttpApiServer (its /v1/remote endpoints are the store
    * API) plus a scratch root for table data, started lazily on the first
    * remote CREATE. Weakly held; server threads are daemons. */
  private val stores = new java.util.WeakHashMap[
    SparkSession, (graft.server.HttpApiServer, Int, String)]

  def store(spark: SparkSession): (graft.server.HttpApiServer, Int, String) =
    stores.synchronized {
      var st = stores.get(spark)
      if (st == null) {
        val srv = new graft.server.HttpApiServer(spark)
        val port = srv.start()
        val root = java.nio.file.Files.createTempDirectory("graft-store").toString
        st = (srv, port, root)
        stores.put(spark, st)
      }
      st
    }

  def storeIfStarted(spark: SparkSession)
      : Option[(graft.server.HttpApiServer, Int, String)] =
    stores.synchronized(Option(stores.get(spark)))

  /** Reference engine label per dialect-created catalog table
    * (`db.name` lowercase → "CSV"/"Parquet"/"remote"/…); `system.tables`
    * overlays these on the Spark catalog's tableType. */
  private val engineLabelMaps = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.Map[String, String]]

  def tableEngines(spark: SparkSession): scala.collection.mutable.Map[String, String] =
    engineLabelMaps.synchronized {
      var m = engineLabelMaps.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map[String, String]()
        engineLabelMaps.put(spark, m)
      }
      m
    }

  /** One engine-settings map per SparkSession (weakly held). */
  private val registries =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, String]]

  def settingsRegistry(spark: SparkSession): scala.collection.mutable.Map[String, String] =
    registries.synchronized {
      var m = registries.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map(
          "max_threads" -> String.valueOf(Runtime.getRuntime.availableProcessors),
          "max_block_size" -> "10000")
        registries.put(spark, m)
      }
      m
    }

  /** Recommended scale configuration: AQE with skew handling (runtime
    * re-plan replaces the reference's static ScattersOptimizer,
    * optimizer_scatters.rs), shuffle parallelism sized to the machine
    * (reference `max_threads`, settings.rs:21), and split sizes that keep a
    * partition's working set in executor memory at 100 TB. */
  def tunedConf(cores: Int = Runtime.getRuntime.availableProcessors): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.files.maxPartitionBytes" -> "256m",
    "spark.sql.session.timeZone" -> "UTC")

  def tuned(b: SparkSession.Builder, cores: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    tunedConf(cores).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Reference scalar functions absent from Spark, as codegen'd Catalyst
    * expressions (scalars/hashes/siphash.rs; SimHash is our 100TB-dedup
    * extension). */
  def registerFunctions(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "siphash64",
      { case Seq(e) => HashExpressions.SipHash64(e) })
    Bridge.registerFunction(spark, "siphash",
      { case Seq(e) => HashExpressions.SipHash64(e) })
    Bridge.registerFunction(spark, "simhash64",
      { case Seq(e) => HashExpressions.SimHash64(e) })
    Bridge.registerFunction(spark, "totypename",
      { case Seq(e) => HashExpressions.TypeName(e) })
    // sleep(seconds) (udfs/sleep.rs): per-invocation delay, capped — the
    // reference sleeps once per block; distributed eval sleeps per row, so
    // the cap keeps a stray `SELECT sleep(1) FROM big` from wedging executors
    // (SURVEY.md §7.4 documents the divergence). crashme()/example() are
    // test scaffolding, deliberately not ported.
    // Pipeline scalar surface: the ext/ kernels, SQL-reachable — the
    // reference's model is a rich scalar registry (function_factory.rs);
    // ours extends it with the 100TB-pipeline functions. Kernel-backed
    // entries stay codegen'd; Column-composed helpers register as
    // macro-style builders (the builder inlines the composed expression
    // tree — still whole-stage-codegen'd, never a UDF).
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.IntegerType
    import graft.ext.{TextAnalysis => TA, Vectors}
    def lint(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }
    Bridge.registerFunction(spark, "simhash60md5",
      { case Seq(e) => HashExpressions.SimHash60(e) })
    Bridge.registerFunction(spark, "minhash32",
      { case Seq(e) => HashExpressions.MinHash32(e) })
    Bridge.registerFunction(spark, "word_ngrams",
      { case Seq(e, n) => graft.functions.TextExpressions.WordNgrams(e, lint(n)) })
    Bridge.registerFunction(spark, "word_ngram_hashes",
      { case Seq(e, n) => graft.functions.TextExpressions.WordNgramHashes(e, lint(n)) })
    Bridge.registerFunction(spark, "dot_product",
      { case Seq(a, b) => graft.functions.DotProduct(a, b) })
    Bridge.registerFunction(spark, "hashed_margin",
      { case Seq(e, b) => HashExpressions.LinearMarginExpr(e, lint(b)) })
    def macroFn(name: String,
        f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
      Bridge.registerFunction(spark, name,
        exprs => Bridge.sessionExpression(spark, f(exprs.map(Bridge.column))))
    macroFn("cosine_sim", { case Seq(a, b) => Vectors.cosine(a, b) })
    macroFn("vec_norm", { case Seq(a) => Vectors.norm(a) })
    macroFn("token_count", { case Seq(e) => TA.tokenCount(e) })
    macroFn("bpeish_token_count", { case Seq(e) => TA.bpeishTokenCount(e) })
    macroFn("quality_score", { case Seq(e) => TA.qualityScore(e) })
    macroFn("alpha_ratio", { case Seq(e) => TA.alphaRatio(e) })
    macroFn("stopword_ratio", { case Seq(e) => TA.stopwordRatio(e) })
    macroFn("mean_token_len", { case Seq(e) => TA.meanTokenLen(e) })
    macroFn("lang_id", { case Seq(e) => TA.langId(e) })
    macroFn("content_fingerprint", { case Seq(e) => TA.contentFingerprint(e) })
    macroFn("rolling_fingerprint", { case Seq(e) => TA.rollingFingerprint(e) })
    macroFn("redact_pii", { case Seq(e) => TA.redactPii(e) })
    graft.functions.UniqExactAggregator.register(spark)
    graft.functions.VecSumAggregator.register(spark)
    spark.udf.register("sleep", (secs: Double) => {
      require(secs >= 0, "sleep: negative duration")
      Thread.sleep(math.min((secs * 1000).toLong, 30000L))
      0.toShort
    })
  }
}

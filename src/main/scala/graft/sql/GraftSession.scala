package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  SystemTables.registerAll(spark)
  GraftSession.registerFunctions(spark)

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

  private def rewriteCreate(sql: String): Option[String] = sql.trim match {
    case CreateTableRe(head, engine, rest) =>
      val opts = scala.collection.mutable.ArrayBuffer[String]()
      LocationRe.findFirstMatchIn(rest).foreach(m => opts += s"path '${m.group(1)}'")
      if (HeaderRe.findFirstIn(rest).isDefined) opts += "header 'true'"
      val using = engine.toLowerCase match {
        case "csv" => "csv"
        case "parquet" => "parquet"
        case "memory" | "null" => "parquet"
        case other => throw new IllegalArgumentException(s"unknown engine $other")
      }
      val optClause = if (opts.nonEmpty) opts.mkString(" OPTIONS (", ", ", ")") else ""
      Some(s"$head USING $using$optClause")
    case _ => None
  }

  /** Engine settings registry (sessions/settings.rs): `SET name = value` for
    * dot-free reference setting names lands here instead of Spark's conf;
    * `max_threads` maps onto the one Spark knob with the same meaning for a
    * local pipeline. Reference SET produces no result rows. */
  val settings: scala.collection.mutable.Map[String, String] =
    scala.collection.mutable.Map(
      "max_threads" -> String.valueOf(Runtime.getRuntime.availableProcessors),
      "max_block_size" -> "10000")

  private val SetRe = """(?is)^SET\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*$""".r

  def sql(text: String): DataFrame = text.trim.stripSuffix(";").trim match {
    case SetRe(key, value) if !key.contains(".") =>
      settings(key.toLowerCase) = value
      if (key.equalsIgnoreCase("max_threads"))
        spark.conf.set("spark.sql.shuffle.partitions", value)
      spark.emptyDataFrame
    case t =>
      spark.sql(rewriteCreate(t).getOrElse(Dialect.rewrite(t)))
  }
}

object GraftSession {
  def apply(spark: SparkSession): GraftSession = new GraftSession(spark)

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
    // sleep(seconds) (udfs/sleep.rs): per-invocation delay, capped — the
    // reference sleeps once per block; distributed eval sleeps per row, so
    // the cap keeps a stray `SELECT sleep(1) FROM big` from wedging executors
    // (SURVEY.md §7.4 documents the divergence). crashme()/example() are
    // test scaffolding, deliberately not ported.
    graft.functions.UniqExactAggregator.register(spark)
    spark.udf.register("sleep", (secs: Double) => {
      require(secs >= 0, "sleep: negative duration")
      Thread.sleep(math.min((secs * 1000).toLong, 30000L))
      0.toShort
    })
  }
}

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
    val catalog = spark.catalog.listDatabases().collect().map(_.name).toSeq
      .flatMap(db => spark.catalog.listTables(db).collect()
        .filter(!_.isTemporary)
        .map(t => (db, t.name, t.tableType)))
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

  val all: Seq[String] = Seq("one", "databases", "tables", "settings",
    "functions", "contributors", "clusters", "processes")

  /** Register every system table as `system_<name>` temp view. */
  def registerAll(spark: SparkSession): Unit = {
    one(spark).createOrReplaceTempView("system_one")
    databases(spark).createOrReplaceTempView("system_databases")
    tables(spark).createOrReplaceTempView("system_tables")
    settings(spark).createOrReplaceTempView("system_settings")
    functions(spark).createOrReplaceTempView("system_functions")
    contributors(spark).createOrReplaceTempView("system_contributors")
    clusters(spark).createOrReplaceTempView("system_clusters")
    processes(spark).createOrReplaceTempView("system_processes")
  }
}

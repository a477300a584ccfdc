package graft

import org.apache.spark.sql.SparkSession

import graft.server.{ClickHouseServer, MySqlServer}
import graft.sql.GraftSession

/** Network front-door main — boots one SparkSession and serves the engine
  * over both wire protocols, the reference's deployment shape
  * (fusequery/query/src/bin/fuse-query.rs starts MySQL + ClickHouse
  * handlers on one session manager):
  *
  * {{{
  * sbt "runMain graft.Serve [mysqlPort] [clickhousePort] [sfDir]"
  * # defaults: 3307, 9001, no tables pre-mounted
  * mysql -h 127.0.0.1 -P 3307 -e "SELECT count(*) FROM numbers(1000)"
  * }}}
  *
  * When `sfDir` is given, the TPC-H-ish parquet tables mount as views so
  * wire clients can query them immediately. Runs until killed. */
object Serve {
  def main(args: Array[String]): Unit = {
    val mysqlPort = args.lift(0).map(_.toInt).getOrElse(3307)
    val chPort = args.lift(1).map(_.toInt).getOrElse(9001)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors))
    val spark = GraftSession.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.lift(2).foreach(dir => graft.tables.Tables.registerAll(spark, dir))
    GraftSession.cached(spark) // strategies + functions + trace listener
    val my = new MySqlServer(spark, mysqlPort)
    val ch = new ClickHouseServer(spark, chPort)
    println(s"[serve] mysql on ${my.start()}, clickhouse on ${ch.start()}")
    Thread.currentThread().join() // serve until killed
  }
}

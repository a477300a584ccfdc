package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.server.HttpApiServer

/** End-to-end coverage of the Remote table engine — a live [[HttpApiServer]]
  * serving parquet tables to the `graft-remote` DataSource V2 connector over
  * a real socket (the reference's RemoteTable ↔ store service pair,
  * `remote_table.rs` / `remote_table_do_read.rs`).
  *
  * The pushdown pins matter most: the server records the query params of the
  * last `/v1/remote/read`, so these tests assert the pruned column list, the
  * translated predicate, and the per-split limit actually CROSSED THE WIRE —
  * not just that results are correct. */
class RemoteTableSpec extends AnyFunSuite {

  private lazy val session = TestSpark.spark.newSession()
  private lazy val server = new HttpApiServer(session)
  private lazy val url = s"http://127.0.0.1:${server.start()}"

  private def remote(table: String): DataFrame =
    session.read.format("graft-remote")
      .option("url", url).option("table", table).load()

  // name → dir, for reading back what `serve` wrote
  private val dirs = scala.collection.mutable.Map[String, String]()
  private def serveDirOf(name: String): String = dirs(name)

  /** Write `df` as a multi-file parquet table, register it, return its dir. */
  private def serve(name: String, df: DataFrame, parts: Int = 3): String = {
    val dir = Files.createTempDirectory(s"graft-remote-$name").toString
    df.repartition(parts).write.mode("overwrite").parquet(dir)
    server.registerRemoteTable(name, dir)
    dirs(name) = dir
    dir
  }

  private def sortedRows(df: DataFrame): Seq[Row] = {
    import scala.jdk.CollectionConverters._
    df.collectAsList().asScala.toSeq.sortBy(_.toString)
  }

  test("multi-split round trip: every row arrives once, one partition per remote file") {
    import session.implicits._
    val base = (1L to 1000L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    serve("rt_round", base, parts = 3)
    val r = remote("rt_round")
    assert(r.rdd.getNumPartitions == 3) // splits = the server's 3 files
    assert(sortedRows(r) == sortedRows(base))
  }

  test("type fidelity: temporal, decimal, binary, array and nested struct columns round-trip bit-exactly") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("dec", DecimalType(20, 4)), StructField("bin", BinaryType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("arr", ArrayType(DoubleType)),
      StructField("tags", ArrayType(StringType)),
      StructField("st", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val rows = java.util.Arrays.asList(
      Row(1, 9007199254740993L, 0.1, 0.25f, true, "plain",
        new java.math.BigDecimal("12345678901234.5678"), Array[Byte](0, 1, -2),
        java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        Seq(1.5, Double.NaN, -0.0), Seq("x", null, "z"), Row(7L, "in")),
      Row(2, -1L, Double.PositiveInfinity, -1.5f, false,
        "quo'te \"d\" \\ tab\t nl\n é漢", new java.math.BigDecimal("-0.0001"),
        Array.empty[Byte], java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq.empty[Double], null, Row(null, null)),
      Row(3, null, null, null, null, null, null, null, null, null, null, null, null))
    val base = session.createDataFrame(rows, schema)
    serve("rt_types", base, parts = 1)
    val gotDf = remote("rt_types")
    val wantDf = session.read.schema(schema).parquet(serveDirOf("rt_types"))
    // Array[Byte] has reference toString — compare binary by value separately
    assert(sortedRows(gotDf.drop("bin")).map(_.toString) ==
      sortedRows(wantDf.drop("bin")).map(_.toString))
    def bins(df: DataFrame) = df.select(col("i"), col("bin")).collect()
      .map(r => r.getInt(0) -> Option(r.getAs[Array[Byte]](1)).map(_.toSeq)).toMap
    assert(bins(gotDf) == bins(wantDf))
  }

  test("pushdown crosses the wire: pruned cols, translated predicate, and the scan says so") {
    import session.implicits._
    val base = (1L to 500L)
      .map(i => (i, s"u${i % 7}", i * 2.0, s"pay$i")).toDF("id", "grp", "v", "payload")
    serve("rt_push", base)
    val q = remote("rt_push")
      .filter($"id" > 100L && $"grp" === "u3" && $"grp".isNotNull)
      .select($"id", $"v")
    val got = sortedRows(q)
    val want = sortedRows(
      base.filter($"id" > 100L && $"grp" === "u3").select($"id", $"v"))
    assert(got == want)
    val params = server.lastRemoteRead
    val cols = params("cols").split(',').toSet
    assert(cols == Set("id", "v")) // payload pruned before the wire
    val where = params("where")
    assert(where.contains("`id` > 100L") && where.contains("`grp` = 'u3'"))
    // the physical plan scans the remote table, not a local fallback
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft-remote:rt_push"))
  }

  test("untranslatable predicate stays a client-side residual — correct, and no where on the wire") {
    import session.implicits._
    val base = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    serve("rt_resid", base)
    // Or() with a NaN comparison: the literal translator refuses NaN, so the
    // whole disjunction must NOT be pushed; Spark evaluates it post-scan
    val pred = $"v" === lit(Double.NaN) || $"id" <= 10L
    val got = sortedRows(remote("rt_resid").filter(pred))
    assert(got == sortedRows(base.filter(pred)))
    assert(!server.lastRemoteRead.contains("where"))
  }

  test("limit pushdown caps each split server-side; count(*) prunes to zero columns") {
    import session.implicits._
    val base = (1L to 1000L).map(i => (i, s"x$i")).toDF("id", "s")
    serve("rt_lim", base)
    assert(remote("rt_lim").limit(7).count() == 7L)
    assert(server.lastRemoteRead.get("limit").contains("7"))
    assert(remote("rt_lim").count() == 1000L)
    assert(server.lastRemoteRead.get("count_only").contains("1"))
    assert(!server.lastRemoteRead.contains("cols"))
  }

  test("zero-match predicate yields an empty result, not a protocol error") {
    import session.implicits._
    val base = (1L to 50L).map(i => (i, i.toString)).toDF("id", "s")
    serve("rt_empty", base)
    assert(remote("rt_empty").filter(col("id") > 999L).count() == 0L)
  }

  test("unknown table and foreign split are refused by name") {
    val e = intercept[IllegalStateException] { remote("rt_nope").schema }
    assert(e.getMessage.contains("not registered"))
    // a split the table does not own is rejected even though the file exists
    import session.implicits._
    serve("rt_own", (1L to 5L).toDF("id"), parts = 1)
    serve("rt_other", (1L to 5L).toDF("id"), parts = 1)
    val foreign = session.read.parquet(serveDirOf("rt_other")).inputFiles.head
    val err = intercept[IllegalStateException] {
      graft.sources.RemoteWire.getBody(
        s"$url/v1/remote/read?table=rt_own&split=${graft.sources.RemoteWire.enc(foreign)}")
    }
    assert(err.getMessage.contains("HTTP 500"))
  }

  test("more splits than task slots: the jobless store cannot deadlock a co-hosted session") {
    // regression pin: when the serve side ran Spark jobs, 4+ concurrent
    // client scan tasks (local[4]) blocked on HTTP while holding every task
    // slot and the serve jobs starved — a hard deadlock. The store now
    // scans joblessly (LocalScan), so 8 splits under 4 slots must finish.
    import session.implicits._
    val base = (1L to 4000L).map(i => (i, i % 13, s"p$i")).toDF("id", "k", "s")
    serve("rt_slots", base, parts = 8)
    val got = remote("rt_slots").filter($"k" === 3L).agg(sum($"id")).head.getLong(0)
    val want = base.filter($"k" === 3L).agg(sum($"id")).head.getLong(0)
    assert(got == want)
  }

  test("append: executor-streamed write lands atomically and reads back exactly") {
    import session.implicits._
    val base = (1L to 200L).map(i => (i, s"v$i", i * 0.5)).toDF("id", "s", "v")
    serve("rt_app", base, parts = 2)
    val extra = (201L to 300L).map(i => (i, s"v$i", i * 0.5)).toDF("id", "s", "v")
    extra.repartition(3).write.format("graft-remote")
      .option("url", url).option("table", "rt_app").mode("append").save()
    val after = remote("rt_app")
    assert(after.count() == 300L)
    assert(sortedRows(after) == sortedRows(base.union(extra)))
    // staging is swept on commit — only parquet remains in the table dir
    val leftovers = new java.io.File(serveDirOf("rt_app")).listFiles()
      .filter(_.getName.startsWith(".graft-staging"))
    assert(leftovers.isEmpty)
  }

  test("append round-trips the full type matrix (timestamps, decimals, arrays, structs)") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("dec", DecimalType(20, 4)),
      StructField("ts", TimestampType), StructField("dt", DateType),
      StructField("arr", ArrayType(DoubleType)),
      StructField("st", StructType(Seq(StructField("a", LongType))))))
    val rows = java.util.Arrays.asList(
      Row(1, new java.math.BigDecimal("9876543210.1234"),
        java.sql.Timestamp.valueOf("2025-06-30 12:00:00.000001"),
        java.sql.Date.valueOf("2025-06-30"), Seq(1.0, -0.0, Double.NaN), Row(42L)),
      Row(2, null, null, null, null, Row(null)))
    val df = session.createDataFrame(rows, schema)
    serve("rt_appty", df.limit(0), parts = 1) // empty table, same schema
    df.write.format("graft-remote")
      .option("url", url).option("table", "rt_appty").mode("append").save()
    assert(sortedRows(remote("rt_appty")).map(_.toString) ==
      sortedRows(df).map(_.toString))
  }

  test("append with a mismatched schema is refused before any data moves") {
    import session.implicits._
    serve("rt_appbad", (1L to 5L).map(i => (i, s"x$i")).toDF("id", "s"), parts = 1)
    val bad = (1L to 5L).map(i => (i, i * 1.0)).toDF("id", "wrong")
    val e = intercept[Exception] {
      bad.write.format("graft-remote")
        .option("url", url).option("table", "rt_appbad").mode("append").save()
    }
    // Spark's V2 write analysis catches it (INCOMPATIBLE_DATA_FOR_TABLE)
    // before our own WriteBuilder require — either refusal is fine
    assert(e.getMessage.contains("does not match") ||
      e.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE"))
    assert(remote("rt_appbad").count() == 5L)
  }

  test("unsupported column types are rejected at load, never silently mangled") {
    import session.implicits._
    val base = Seq((1L, Map("k" -> 1L))).toDF("id", "m")
    serve("rt_map", base, parts = 1)
    val e = intercept[UnsupportedOperationException] { remote("rt_map").schema }
    assert(e.getMessage.contains("unsupported column type"))
  }
}

package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.server.ClickHouseServer

/** End-to-end native-protocol coverage: a from-scratch ClickHouse TCP
  * client (varint framing, Hello/Query/Data packets, typed native column
  * decode incl. Nullable — written against the public protocol, sharing
  * no code with the server) drives a real connection, covers the
  * reference's own handler-test shape (clickhouse_handler_test.rs:28:
  * `SELECT COUNT() AS c FROM numbers(1000)` → one row, 1000), and
  * replays the golden stateless subset over the socket. */
class ClickHouseServerSpec extends AnyFunSuite {

  private lazy val session = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.groupByOrdinal", "false")
    s.conf.set("spark.sql.legacy.parser.havingWithoutGroupByAsWhere", "true")
    Seq("system", "local", "for_test").foreach(d =>
      s.sql(s"CREATE DATABASE IF NOT EXISTS $d"))
    s
  }
  private lazy val server = new ClickHouseServer(session)
  private lazy val port = server.start()

  // ---- minimal native client ------------------------------------------------

  /** Shared from-scratch client (extracted to [[WireClients]] for reuse by
    * the fuzz/torture suites). */
  private type Client = WireClients.Ch

  test("hello, ping, the reference handler-test query, typed columns, NULLs") {
    val c = new Client(port)
    try {
      assert(c.serverName == "Graft")
      assert(c.ping())
      // clickhouse_handler_test.rs:28 — the reference's own e2e assertion
      val Right((names, types, rows)) =
        c.query("SELECT COUNT() AS c FROM numbers(1000)"): @unchecked
      assert(names == Seq("c"))
      assert(types.head.contains("Int64"))
      assert(rows == Seq(Seq("1000")))
      // typed lanes: Int64, Float64, UInt8 bool, String, NULL flag
      val Right((_, ts, vs)) = c.query(
        "SELECT 7 AS i, 1.5 AS f, 1 > 100 AS b, 'héllo' AS s, NULL AS n"
      ): @unchecked
      assert(vs.head(0) == "7" && vs.head(1) == "1.5" &&
        vs.head(2) == "false" && vs.head(3) == "héllo" && vs.head(4) == null)
      assert(ts(2).contains("UInt8") && ts(3).contains("String"))
      // multi-block streaming: more rows than one 8192-row block
      val Right((_, _, many)) =
        c.query("SELECT number FROM numbers(20000) ORDER BY number"): @unchecked
      assert(many.length == 20000 && many.head.head == "0" &&
        many.last.head == "19999")
      // an error arrives as an Exception packet and the connection survives
      assert(c.query("SELECT FROM nonsense !!").isLeft)
      assert(c.query("SELECT 7").exists(_._3.head.head == "7"))
    } finally c.close()
  }

  test("session isolation: USE and SET on one connection are invisible to another") {
    val a = new Client(port); val b = new Client(port)
    try {
      assert(a.query("CREATE DATABASE IF NOT EXISTS iso_ch").isRight)
      assert(a.query("USE iso_ch").isRight)
      assert(a.query("SET max_threads = 5").isRight)
      val Right((_, _, dbA)) = a.query("SELECT database() AS d"): @unchecked
      val Right((_, _, dbB)) = b.query("SELECT database() AS d"): @unchecked
      assert(dbA.head.head == "iso_ch")
      assert(dbB.head.head == "default", "USE leaked across connections")
      val Right((_, _, setB)) = b.query(
        "SELECT value FROM system.settings WHERE name = 'max_threads'"): @unchecked
      assert(setB.head.head != "5", "SET leaked across connections")
      // catalog objects stay SHARED: B reads the table A created
      a.query("CREATE TABLE iso_ch.t_iso (x BIGINT) ENGINE = Memory")
        .swap.foreach(e => fail(s"create failed: $e"))
      assert(a.query("INSERT INTO iso_ch.t_iso VALUES (23)").isRight)
      val Right((_, _, shared)) =
        b.query("SELECT x FROM iso_ch.t_iso"): @unchecked
      assert(shared.head.head == "23")
    } finally {
      a.query("DROP DATABASE IF EXISTS iso_ch")
      a.close(); b.close()
    }
  }

  test("concurrency torture: 8 connections (plain + LZ4 + ZSTD) with per-connection state") {
    // 8 parallel clients for 20 rounds each — a third of them LZ4, a third
    // ZSTD — every round mixing typed reads with per-connection USE/SET.
    // Compression raises the stakes: a block routed to the wrong connection
    // also fails the per-connection frame checksum decode.
    val n = 8; val rounds = 20
    (0 until n).foreach(i =>
      session.sql(s"CREATE DATABASE IF NOT EXISTS tort_c$i"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val c = i % 3 match {
          case 0 => new Client(port)
          case 1 => new Client(port, compression = 1L)
          case _ => new Client(port, compression = 1L, zstd = true)
        }
        try {
          def expectOne(sql: String, want: String, what: String): Unit =
            c.query(sql) match {
              case Right((_, _, rows)) if rows.head.head == want => ()
              case Right((_, _, rows)) =>
                failures.add(s"t$i $what: got ${rows.head.head}, want $want")
              case Left(e) => failures.add(s"t$i $what errored: $e")
            }
          if (c.query(s"USE tort_c$i").isLeft) failures.add(s"t$i USE failed")
          if (c.query(s"SET max_threads = ${200 + i}").isLeft)
            failures.add(s"t$i SET failed")
          (1 to rounds).foreach { r =>
            expectOne("SELECT sum(number) AS s FROM numbers(1000)", "499500", s"r$r sum")
            expectOne(s"SELECT avg(number) AS a FROM numbers(${100 * (i + 1)})",
              ((100 * (i + 1) - 1) / 2.0).toString, s"r$r avg")
            expectOne("SELECT database() AS d", s"tort_c$i", s"r$r database")
            expectOne(
              "SELECT value FROM system.settings WHERE name = 'max_threads'",
              (200 + i).toString, s"r$r setting")
            // an exception mid-session must not desync the connection
            if (c.query("SELECT definitely_not_a_function(1)").isRight)
              failures.add(s"t$i r$r: bogus function did not error")
          }
          if (!c.ping()) failures.add(s"t$i final ping failed")
        } catch {
          case e: Throwable => failures.add(s"t$i died: ${e.getMessage}")
        } finally c.close()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    threads.filter(_.isAlive).foreach(t => failures.add(s"${t.getName} hung"))
    (0 until n).foreach(i => session.sql(s"DROP DATABASE IF EXISTS tort_c$i CASCADE"))
    assert(failures.isEmpty, failures.toArray.mkString("; "))
  }

  test("LZ4-compressed session: handler test, typed lanes, multi-frame blocks") {
    val c = new Client(port, compression = 1L)
    try {
      // the reference's own e2e assertion, now under compression
      val Right((names, _, rows)) =
        c.query("SELECT COUNT() AS c FROM numbers(1000)"): @unchecked
      assert(names == Seq("c") && rows == Seq(Seq("1000")))
      // typed lanes survive the frame codec
      val Right((_, _, vs)) = c.query(
        "SELECT 7 AS i, 1.5 AS f, 'héllo' AS s, NULL AS n"): @unchecked
      assert(vs.head(0) == "7" && vs.head(1) == "1.5" &&
        vs.head(2) == "héllo" && vs.head(3) == null)
      // a block body > 1 MiB must split into multiple checksummed frames
      // (8192 rows x ~300-char strings ≈ 2.5 MiB per block body)
      val Right((_, _, wide)) = c.query(
        "SELECT repeat('x', 300) AS s FROM numbers(10000)"): @unchecked
      assert(wide.length == 10000 && wide.forall(_.head.length == 300))
      // errors still arrive uncompressed and the session survives
      assert(c.query("SELECT FROM nonsense !!").isLeft)
      assert(c.query("SELECT 7").exists(_._3.head.head == "7"))
    } finally c.close()
  }

  test("ZSTD-compressed session (network_compression_method=zstd), both directions") {
    val c = new Client(port, compression = 1L, zstd = true)
    try {
      // handler-test shape under ZSTD: the client's Data terminator rides
      // 0x90 frames IN, the server's result blocks ride 0x90 frames OUT
      val Right((names, _, rows)) =
        c.query("SELECT COUNT() AS c FROM numbers(1000)"): @unchecked
      assert(names == Seq("c") && rows == Seq(Seq("1000")))
      // typed lanes survive the zstd codec
      val Right((_, _, vs)) = c.query(
        "SELECT 7 AS i, 1.5 AS f, 'héllo' AS s, NULL AS n"): @unchecked
      assert(vs.head(0) == "7" && vs.head(1) == "1.5" &&
        vs.head(2) == "héllo" && vs.head(3) == null)
      // multi-frame: a block body > 1 MiB splits at MaxUncompressedFrame
      val Right((_, _, wide)) = c.query(
        "SELECT repeat('x', 300) AS s FROM numbers(10000)"): @unchecked
      assert(wide.length == 10000 && wide.forall(_.head.length == 300))
      // errors still arrive uncompressed and the session survives
      assert(c.query("SELECT FROM nonsense !!").isLeft)
      assert(c.query("SELECT 7").exists(_._3.head.head == "7"))
    } finally c.close()
  }

  test("classic typed settings decode; unknown setting rejected cleanly") {
    val c = new Client(port)
    try {
      // varint-valued and string-valued classic layouts parse through
      val r = c.query("SELECT 1 AS x", settings = Seq(
        "max_threads" -> Left(2L),
        "max_block_size" -> Left(4096L),
        "send_logs_level" -> Right("warning")))
      assert(r.exists(_._3 == Seq(Seq("1"))))
    } finally c.close()
    val c2 = new Client(port)
    try {
      // unknown name: the stream position past it is unknowable — expect a
      // descriptive Exception and a server-side close, not a desynced parse
      val r = c2.query("SELECT 1", settings = Seq(
        "graft_mystery_setting" -> Left(1L)))
      assert(r.isLeft && r.swap.exists(_.contains("graft_mystery_setting")))
    } finally c2.close()
  }

  test("stray typed Data packet is fully consumed; session stays in sync") {
    val c = new Client(port)
    try {
      // a native-INSERT-style String block out of band: the round-7 server
      // read only the packet id and desynced; now the whole body drains
      c.sendDataBlock("v", "String", Seq("alpha", "beta", "gamma"))
      assert(c.query("SELECT 41 + 1 AS a").exists(_._3 == Seq(Seq("42"))))
      // an undecodable column type draws an Exception naming it, then close
      c.sendDataBlock("v", "AggregateFunction(uniq, UInt64)", Seq("x"))
      assert(c.readException().contains("AggregateFunction"))
    } finally c.close()
  }

  test("Date/DateTime outside the wire type's range clamp, not bit-truncate") {
    val c = new Client(port)
    try {
      val Right((_, _, rows)) = c.query(
        "SELECT CAST('2200-01-01' AS DATE) AS d"): @unchecked
      // UInt16 days saturate at 2149-06-06 (epoch day 65535) — a plausible
      // date would silently appear under bit truncation
      assert(rows.head.head == "2149-06-06")
      val Right((_, _, r2)) = c.query(
        "SELECT CAST('1950-01-01' AS DATE) AS d"): @unchecked
      assert(r2.head.head == "1970-01-01") // pre-epoch floors at 0
    } finally c.close()
  }

  // ---- golden suites over the native wire -----------------------------------

  private val suiteDir = "/root/reference/tests/suites/0_stateless"
  private val wireSuites = Seq(
    "01_0000_system_numbers", "02_0000_function_arithmetic",
    "02_0005_function_compare", "03_0003_select_group_by",
    "03_0004_select_order_by", "03_0005_select_filter",
    "03_0006_select_having")

  private case class Stmt(sql: String, expectError: Boolean)

  private def parseSuite(path: String): Seq[Stmt] = {
    val out = scala.collection.mutable.ArrayBuffer[Stmt]()
    val buf = new StringBuilder
    var expectError = false
    Files.readAllLines(Paths.get(path)).asScala.foreach { line =>
      if (line.contains("-- {ErrorCode")) expectError = true
      val code = line.indexOf("--") match {
        case -1 => line
        case i => line.substring(0, i)
      }
      buf.append(code).append('\n')
      if (code.trim.endsWith(";")) {
        val sql = buf.toString.trim.stripSuffix(";").trim
        if (sql.nonEmpty) out += Stmt(sql, expectError)
        buf.clear(); expectError = false
      }
    }
    out.toSeq
  }

  for (name <- wireSuites; mode <- Seq("plain", "LZ4", "ZSTD")) {
    test(s"golden suite over the native wire ($mode): $name") {
      assume(Files.exists(Paths.get(s"$suiteDir/$name.sql")),
        "reference checkout not present")
      val c = new Client(port,
        compression = if (mode == "plain") 0L else 1L,
        zstd = mode == "ZSTD")
      try {
        val expected =
          Files.readAllLines(Paths.get(s"$suiteDir/$name.result")).asScala.toVector
        var pos = 0
        parseSuite(s"$suiteDir/$name.sql").zipWithIndex.foreach {
          case (stmt, idx) if stmt.sql.toUpperCase.startsWith("EXPLAIN") =>
            assert(c.query(stmt.sql).isRight, s"[$name #$idx] ${stmt.sql}")
            pos += 1
          case (stmt, idx) =>
            c.query(stmt.sql) match {
              case Left(err) =>
                assert(stmt.expectError,
                  s"[$name #$idx] unexpected exception for ${stmt.sql}: $err")
              case Right((_, _, rows)) =>
                assert(!stmt.expectError,
                  s"[$name #$idx] expected an error: ${stmt.sql}")
                val lines = rows.map(_.map(v =>
                  if (v == null) "NULL" else v).mkString("\t"))
                lines.zipWithIndex.foreach { case (got, li) =>
                  assert(pos + li < expected.length,
                    s"[$name #$idx] more lines than golden: ${stmt.sql}")
                  assert(got == expected(pos + li),
                    s"[$name #$idx] line ${li + 1} of ${stmt.sql}\n" +
                      s"  got:    $got\n  golden: ${expected(pos + li)}")
                }
                pos += lines.length
            }
        }
        assert(pos == expected.length,
          s"[$name] consumed $pos of ${expected.length} golden lines")
      } finally c.close()
    }
  }
}

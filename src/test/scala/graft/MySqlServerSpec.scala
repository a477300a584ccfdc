package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.server.MySqlServer

/** End-to-end wire-protocol coverage: a from-scratch MySQL client (packet
  * framing, HandshakeResponse41, COM_QUERY/COM_PING, text-resultset and
  * ERR/OK parsing — written against the public protocol, sharing no code
  * with the server) drives a real socket connection, then replays a golden
  * stateless-suite subset through it and compares against the reference's
  * expected output byte-for-byte. The client doubles as protocol
  * validation: a framing or length-encoding bug on either side breaks the
  * decode. */
class MySqlServerSpec extends AnyFunSuite {

  // The golden dialect session (mirrors GoldenSuiteSpec's conf: non-ANSI,
  // no GROUP BY ordinals, HAVING-without-GROUP-BY filters rows).
  private lazy val session = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.groupByOrdinal", "false")
    s.conf.set("spark.sql.legacy.parser.havingWithoutGroupByAsWhere", "true")
    // the reference server boots with default/system/local, and the suite
    // goldens include `for_test` left by the DDL suites' run order
    // (GoldenSuiteSpec's documented setup)
    Seq("system", "local", "for_test").foreach(d =>
      s.sql(s"CREATE DATABASE IF NOT EXISTS $d"))
    s
  }
  private lazy val server = new MySqlServer(session)
  private lazy val port = server.start()

  // ---- minimal client ------------------------------------------------------

  /** Shared from-scratch client (extracted to [[WireClients]] for reuse by
    * the fuzz/torture suites). */
  private type Client = WireClients.MySql

  test("handshake, ping, simple query, NULLs, errors over the wire") {
    val c = new Client(port)
    try {
      assert(c.serverVersion.contains("graft"))
      assert(c.ping())
      // stock-client opener
      assert(c.query("select @@version_comment limit 1").isRight)
      // values + column names arrive through the text protocol
      val Right((cols, rows)) =
        c.query("SELECT 1 + 1 AS two, 'a\tb' AS s, NULL AS n"): @unchecked
      assert(cols === Seq("two", "s", "n"))
      assert(rows === Seq(Seq("2", "a\tb", null)))
      // multi-row, deterministic order
      val Right((_, nums)) =
        c.query("SELECT number FROM numbers(5) ORDER BY number"): @unchecked
      assert(nums.map(_.head) === Seq("0", "1", "2", "3", "4"))
      // a bad statement returns ERR, and the connection SURVIVES it
      assert(c.query("SELECT FROM nonsense !!").isLeft)
      assert(c.query("SELECT 7").exists(_._2.head.head == "7"))
      // DDL round-trip: OK packets, then data back
      assert(c.query("DROP TABLE IF EXISTS wire_t").isRight)
      assert(c.query("CREATE TABLE wire_t(a int) ENGINE = Memory").isRight)
      assert(c.query("INSERT INTO wire_t VALUES (3), (1)").isRight)
      val Right((_, got)) =
        c.query("SELECT a FROM wire_t ORDER BY a"): @unchecked
      assert(got.map(_.head) === Seq("1", "3"))
      assert(c.query("DROP TABLE wire_t").isRight)
    } finally c.close()
  }

  test("prepared statements: typed binds, binary resultset, reuse, close") {
    val c = new Client(port)
    try {
      val Right((id, nParams)) = c.prepare(
        "SELECT ? + ? AS s, ? AS t, ? AS n, ? AS d"): @unchecked
      assert(nParams == 5)
      val Right((cols, rows)) = c.execute(id, Seq(
        c.PLong(40), c.PLong(2), c.PStr("it's a \\ test"),
        c.PNull, c.PDate(2024, 5, 17))): @unchecked
      assert(cols == Seq("s", "t", "n", "d"))
      assert(rows == Seq(Seq("42", "it's a \\ test", null, "2024-05-17")))
      // REUSE with different binds — the point of preparing
      val Right((_, r2)) =
        c.execute(id, Seq(c.PLong(1), c.PDouble(0.5), c.PStr("x"),
          c.PStr("y"), c.PDate(1999, 1, 2))): @unchecked
      assert(r2.head.head == "1.5" && r2.head(2) == "y")
      // a parameterized TVF argument flows through the text path
      val Right((id2, _)) = c.prepare(
        "SELECT number FROM numbers(?) ORDER BY number"): @unchecked
      val Right((_, nums)) = c.execute(id2, Seq(c.PLong(3))): @unchecked
      assert(nums.map(_.head) == Seq("0", "1", "2"))
      // a '?' INSIDE a string literal is not a placeholder
      val Right((id3, n3)) = c.prepare("SELECT '?' AS q, ? AS v"): @unchecked
      assert(n3 == 1)
      val Right((_, r3)) = c.execute(id3, Seq(c.PStr("bound"))): @unchecked
      assert(r3 == Seq(Seq("?", "bound")))
      // close releases the id; executing it afterwards is a clean error
      c.stmtClose(id3)
      assert(c.execute(id3, Seq(c.PStr("x"))).isLeft)
      // and the connection still works
      assert(c.query("SELECT 7").exists(_._2.head.head == "7"))
    } finally c.close()
  }

  test("multi-packet framing: >16 MB cells and statements survive the wire") {
    val c = new Client(port)
    try {
      // a single row larger than the 16 MB-1 packet limit: the server must
      // split into continuation chunks (round 7 threw mid-resultset and
      // wrote a missequenced ERR — the ADVICE desync)
      val Right((_, big)) =
        c.query("SELECT repeat('x', 17000000) AS s, 7 AS t"): @unchecked
      assert(big.head.head.length == 17000000 && big.head(1) == "7")
      // an incoming statement over the limit: client splits, server
      // reassembles (was: never reassembled)
      val lit = "y" * 17000000
      val Right((_, n)) =
        c.query(s"SELECT length('$lit') AS n"): @unchecked
      assert(n.head.head == "17000000")
      // the session survives both
      assert(c.ping())
    } finally c.close()
  }

  test("two concurrent connections execute independently") {
    val a = new Client(port); val b = new Client(port)
    try {
      val ra = a.query("SELECT sum(number) AS s FROM numbers(1000)")
      val rb = b.query("SELECT count(number) AS c FROM numbers(1000)")
      assert(ra.exists(_._2.head.head == "499500"))
      assert(rb.exists(_._2.head.head == "1000"))
    } finally { a.close(); b.close() }
  }

  test("session isolation: USE and SET on one connection are invisible to another") {
    val a = new Client(port); val b = new Client(port)
    try {
      assert(a.query("CREATE DATABASE IF NOT EXISTS iso_mysql").isRight)
      // interleave: A switches db and sets a session setting; B must see
      // neither (reference sessions/settings.rs scopes settings per session)
      assert(a.query("USE iso_mysql").isRight)
      assert(a.query("SET max_threads = 3").isRight)
      val Right((_, dbA)) = a.query("SELECT database() AS d"): @unchecked
      val Right((_, dbB)) = b.query("SELECT database() AS d"): @unchecked
      assert(dbA.head.head == "iso_mysql")
      assert(dbB.head.head == "default")
      val Right((_, setB)) = b.query(
        "SELECT value FROM system.settings WHERE name = 'max_threads'"): @unchecked
      assert(setB.head.head != "3", "SET leaked across connections")
      val Right((_, setA)) = a.query(
        "SELECT value FROM system.settings WHERE name = 'max_threads'"): @unchecked
      assert(setA.head.head == "3")
      // catalog objects stay SHARED (persistent catalog): B sees A's table
      a.query("CREATE TABLE iso_mysql.t_iso (x BIGINT) ENGINE = Memory")
        .swap.foreach(e => fail(s"create failed: $e"))
      assert(a.query("INSERT INTO iso_mysql.t_iso VALUES (11)").isRight)
      val Right((_, shared)) =
        b.query("SELECT x FROM iso_mysql.t_iso"): @unchecked
      assert(shared.head.head == "11")
    } finally {
      a.query("DROP DATABASE IF EXISTS iso_mysql")
      a.close(); b.close()
    }
  }

  test("prepared re-execute without types (new_params_bound_flag=0) reuses cached types") {
    val c = new Client(port)
    try {
      val Right((id, _)) = c.prepare("SELECT ? + 1 AS v"): @unchecked
      val Right((_, r1)) = c.execute(id, Seq(c.PLong(41))): @unchecked
      assert(r1.head.head == "42")
      // stock connectors send types only on the FIRST execute
      val Right((_, r2)) =
        c.execute(id, Seq(c.PLong(99)), sendTypes = false): @unchecked
      assert(r2.head.head == "100")
      // a typeless execute with NO prior typed execute is a clean error
      val Right((id2, _)) = c.prepare("SELECT ? AS v"): @unchecked
      assert(c.execute(id2, Seq(c.PLong(1)), sendTypes = false).isLeft)
      // and the connection still works after the error
      assert(c.query("SELECT 5").exists(_._2.head.head == "5"))
    } finally c.close()
  }

  test("NEWDECIMAL binding validates numeric text (no SQL splice)") {
    val c = new Client(port)
    try {
      val Right((id, _)) = c.prepare("SELECT ? + 1 AS v"): @unchecked
      val Right((_, ok)) = c.execute(id, Seq(c.PDec("12.50"))): @unchecked
      assert(ok.head.head == "13.5")
      // non-numeric decimal payload must ERR, not splice into the statement
      val r = c.execute(id, Seq(c.PDec("0 UNION SELECT 666")))
      assert(r.isLeft && r.swap.exists(_.contains("DECIMAL")))
      assert(c.query("SELECT 9").exists(_._2.head.head == "9"))
    } finally c.close()
  }

  test("concurrency torture: 8 connections replay interleaved suites with per-connection state") {
    // The round-8 isolation test drives TWO connections sequentially; this
    // one runs 8 clients in parallel for 20 rounds each, every round mixing
    // reads with per-connection USE/SET — any cross-talk (a session object
    // shared between threads, a result routed to the wrong socket, a
    // settings write leaking) surfaces as a wrong value on SOME thread.
    val n = 8; val rounds = 20
    (0 until n).foreach(i =>
      session.sql(s"CREATE DATABASE IF NOT EXISTS tort_m$i"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val c = new Client(port)
        try {
          def expectOne(sql: String, want: String, what: String): Unit =
            c.query(sql) match {
              case Right((_, rows)) if rows.head.head == want => ()
              case Right((_, rows)) =>
                failures.add(s"t$i $what: got ${rows.head.head}, want $want")
              case Left(e) => failures.add(s"t$i $what errored: $e")
            }
          // per-connection state, distinct per thread
          if (c.query(s"USE tort_m$i").isLeft) failures.add(s"t$i USE failed")
          if (c.query(s"SET max_threads = ${100 + i}").isLeft)
            failures.add(s"t$i SET failed")
          val Right((pid, _)) = c.prepare("SELECT ? * 2 AS v"): @unchecked
          (1 to rounds).foreach { r =>
            expectOne("SELECT sum(number) AS s FROM numbers(1000)", "499500", s"r$r sum")
            expectOne(
              s"SELECT count(DISTINCT number % ${i + 2}) AS u FROM numbers(100)",
              (i + 2).toString, s"r$r uniq")
            // this connection's state, never another's
            expectOne("SELECT database() AS d", s"tort_m$i", s"r$r database")
            expectOne(
              "SELECT value FROM system.settings WHERE name = 'max_threads'",
              (100 + i).toString, s"r$r setting")
            // binary protocol interleaves with text on the same connection
            c.execute(pid, Seq(c.PLong(r))) match {
              case Right((_, rows)) if rows.head.head == (2L * r).toString => ()
              case other => failures.add(s"t$i r$r prepared: $other")
            }
            // an error mid-stream must not desync the connection
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
    (0 until n).foreach(i => session.sql(s"DROP DATABASE IF EXISTS tort_m$i CASCADE"))
    assert(failures.isEmpty, failures.toArray.mkString("; "))
  }

  // ---- golden suites over the wire ----------------------------------------

  private val suiteDir = "/root/reference/tests/suites/0_stateless"
  // the skip-free stateless subset (suites needing documented divergence
  // entries stay in GoldenSuiteSpec, which owns that machinery)
  private val wireSuites = Seq(
    "01_0000_system_numbers", "01_0001_system_tables",
    "02_0000_function_arithmetic", "02_0005_function_compare",
    "02_0005_function_substring", "02_0006_function_argmin_argmax",
    "03_0003_select_group_by", "03_0004_select_order_by",
    "03_0005_select_filter", "03_0006_select_having",
    "06_0000_show_queries")

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

  // Each suite replays twice: through COM_QUERY (text protocol) and
  // through COM_STMT_PREPARE/EXECUTE (binary protocol) — no JDBC driver
  // jar exists in this zero-egress sandbox, so the prepared path is
  // exercised by the from-scratch client's binary implementation, which is
  // the same wire bytes a server-side-prepare connector sends.
  for (name <- wireSuites; prepared <- Seq(false, true)) {
    val mode = if (prepared) "prepared" else "text"
    test(s"golden suite over the wire ($mode): $name") {
      assume(Files.exists(Paths.get(s"$suiteDir/$name.sql")),
        "reference checkout not present")
      val c = new Client(port)
      def run(sql: String): Either[String, (Seq[String], Seq[Seq[String]])] =
        if (!prepared) c.query(sql)
        else c.prepare(sql).flatMap { case (id, _) =>
          val r = c.execute(id, Nil); c.stmtClose(id); r
        }
      try {
        val expected =
          Files.readAllLines(Paths.get(s"$suiteDir/$name.result")).asScala.toVector
        var pos = 0
        parseSuite(s"$suiteDir/$name.sql").zipWithIndex.foreach {
          case (stmt, idx) if stmt.sql.toUpperCase.startsWith("EXPLAIN") =>
            // reference EXPLAIN goldens carry ITS plan text — assert the
            // statement executes over the wire, consume one golden line
            // (GoldenSuiteSpec's documented rule)
            assert(run(stmt.sql).isRight, s"[$name #$idx] ${stmt.sql}")
            pos += 1
          case (stmt, idx) =>
            run(stmt.sql) match {
              case Left(err) =>
                assert(stmt.expectError,
                  s"[$name #$idx] unexpected wire error for ${stmt.sql}: $err")
              case Right((_, rows)) =>
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

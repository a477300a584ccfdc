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

  private final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)

    private def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); var off = 0
      while (off < n) {
        val r = in.read(b, off, n - off)
        if (r < 0) throw new EOFException(); off += r
      }
      b
    }
    private def readPacket(): Array[Byte] = {
      def chunk(): (Int, Array[Byte]) = {
        val h = readN(4)
        val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
        (len, readN(len))
      }
      val (len0, p0) = chunk()
      if (len0 < 0xffffff) p0
      else { // 16 MB-1 continuation convention
        val b = new java.io.ByteArrayOutputStream()
        b.write(p0)
        var len = len0
        while (len == 0xffffff) { val (l, q) = chunk(); len = l; b.write(q) }
        b.toByteArray
      }
    }
    private def writePacket(seq0: Int, p: Array[Byte]): Unit = {
      var seq = seq0; var off = 0
      def header(len: Int): Unit = {
        out.write(len & 0xff); out.write((len >> 8) & 0xff)
        out.write((len >> 16) & 0xff); out.write(seq & 0xff); seq += 1
      }
      while (p.length - off >= 0xffffff) {
        header(0xffffff); out.write(p, off, 0xffffff); off += 0xffffff
      }
      header(p.length - off); out.write(p, off, p.length - off)
      out.flush()
    }

    /** Cursor-based lenenc decode. */
    private def lenencInt(p: Array[Byte], pos: Array[Int]): Long = {
      val first = p(pos(0)) & 0xff; pos(0) += 1
      first match {
        case 0xfc =>
          val v = (p(pos(0)) & 0xffL) | ((p(pos(0) + 1) & 0xffL) << 8)
          pos(0) += 2; v
        case 0xfd =>
          val v = (p(pos(0)) & 0xffL) | ((p(pos(0) + 1) & 0xffL) << 8) |
            ((p(pos(0) + 2) & 0xffL) << 16)
          pos(0) += 3; v
        case 0xfe =>
          var v = 0L
          (0 until 8).foreach(i => v |= (p(pos(0) + i) & 0xffL) << (8 * i))
          pos(0) += 8; v
        case n => n.toLong
      }
    }
    private def lenencStr(p: Array[Byte], pos: Array[Int]): String = {
      val n = lenencInt(p, pos).toInt
      val s = new String(p, pos(0), n, UTF_8); pos(0) += n; s
    }

    // handshake: read greeting, send HandshakeResponse41, expect OK
    val serverVersion: String = {
      val greet = readPacket()
      assert((greet(0) & 0xff) == 0x0a, "protocol version 10 expected")
      val end = greet.indexOf(0.toByte, 1)
      val v = new String(greet, 1, end - 1, UTF_8)
      val resp = new java.io.ByteArrayOutputStream()
      def i4(x: Long): Unit = (0 until 4).foreach(i => resp.write(((x >> (8 * i)) & 0xff).toInt))
      i4(0x0200L | 0x8000L) // CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
      i4(16777216L) // max packet
      resp.write(33) // charset
      resp.write(new Array[Byte](23))
      resp.write("tester".getBytes(UTF_8)); resp.write(0) // user
      resp.write(0) // empty auth response (accept-all server)
      writePacket(1, resp.toByteArray)
      val ok = readPacket()
      assert((ok(0) & 0xff) == 0x00, "handshake not accepted")
      v
    }

    def ping(): Boolean = {
      writePacket(0, Array(0x0e.toByte))
      (readPacket()(0) & 0xff) == 0x00
    }

    /** Left(error message) or Right((columns, rows)); OK-only statements
      * return Right((Nil, Nil)). */
    def query(sql: String): Either[String, (Seq[String], Seq[Seq[String]])] = {
      val payload = Array(0x03.toByte) ++ sql.getBytes(UTF_8)
      writePacket(0, payload)
      val first = readPacket()
      (first(0) & 0xff) match {
        case 0x00 => Right((Nil, Nil))
        case 0xff =>
          Left(new String(first, 9, first.length - 9, UTF_8)) // skip code+#+state
        case _ =>
          val nCols = lenencInt(first, Array(0)).toInt
          val cols = (0 until nCols).map { _ =>
            val p = readPacket(); val pos = Array(0)
            (0 until 4).foreach(_ => lenencStr(p, pos)) // def, schema, table, org_table
            lenencStr(p, pos) // name
          }
          assert((readPacket()(0) & 0xff) == 0xfe, "EOF after columns expected")
          val rows = Seq.newBuilder[Seq[String]]
          var done = false
          while (!done) {
            val p = readPacket()
            if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
            else {
              val pos = Array(0)
              rows += (0 until nCols).map { _ =>
                if ((p(pos(0)) & 0xff) == 0xfb) { pos(0) += 1; null }
                else lenencStr(p, pos)
              }
            }
          }
          Right((cols, rows.result()))
      }
    }

    // ---- prepared statements (binary protocol) ---------------------------

    /** Returns (statementId, nParams) from the prepare-OK chain. */
    def prepare(sql: String): Either[String, (Int, Int)] = {
      writePacket(0, Array(0x16.toByte) ++ sql.getBytes(UTF_8))
      val ok = readPacket()
      if ((ok(0) & 0xff) == 0xff)
        return Left(new String(ok, 9, ok.length - 9, UTF_8))
      assert((ok(0) & 0xff) == 0x00, "prepare-OK expected")
      def le(off: Int, n: Int): Int = {
        var v = 0; (0 until n).foreach(i => v |= (ok(off + i) & 0xff) << (8 * i)); v
      }
      val id = le(1, 4); val nCols = le(5, 2); val nParams = le(7, 2)
      (0 until nParams).foreach(_ => readPacket()) // parameter definitions
      if (nParams > 0) assert((readPacket()(0) & 0xff) == 0xfe)
      (0 until nCols).foreach(_ => readPacket()) // column definitions
      if (nCols > 0) assert((readPacket()(0) & 0xff) == 0xfe)
      Right((id, nParams))
    }

    def stmtClose(id: Int): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0x19)
      (0 until 4).foreach(i => b.write((id >> (8 * i)) & 0xff))
      writePacket(0, b.toByteArray) // no server response, by protocol
    }

    sealed trait P
    case object PNull extends P
    final case class PLong(v: Long) extends P
    final case class PDouble(v: Double) extends P
    final case class PStr(v: String) extends P
    final case class PDec(text: String) extends P // NEWDECIMAL: lenenc text
    final case class PDate(y: Int, m: Int, d: Int) extends P

    /** COM_STMT_EXECUTE with typed binary parameters; decodes the BINARY
      * resultset shape (0x00 row header, offset-2 null bitmap, lenenc
      * string cells — every column is VAR_STRING on this server). */
    def execute(id: Int, params: Seq[P],
        sendTypes: Boolean = true): Either[String, (Seq[String], Seq[Seq[String]])] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0x17)
      (0 until 4).foreach(i => b.write((id >> (8 * i)) & 0xff))
      b.write(0) // flags: CURSOR_TYPE_NO_CURSOR
      b.write(1); b.write(0); b.write(0); b.write(0) // iteration count
      if (params.nonEmpty) {
        val bitmap = new Array[Byte]((params.length + 7) / 8)
        params.zipWithIndex.foreach {
          case (PNull, i) =>
            bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
          case _ => ()
        }
        b.write(bitmap)
        // new_params_bound_flag: stock connectors send types on the FIRST
        // execute only; sendTypes=false models every later execute
        b.write(if (sendTypes) 1 else 0)
        if (sendTypes) params.foreach { p =>
          val t = p match {
            case PNull => 0x06
            case PLong(_) => 0x08
            case PDouble(_) => 0x05
            case PStr(_) => 0xfd
            case PDec(_) => 0xf6
            case PDate(_, _, _) => 0x0a
          }
          b.write(t); b.write(0)
        }
        def wLenenc(n: Int): Unit =
          if (n < 251) b.write(n)
          else if (n < 0x10000) { b.write(0xfc); b.write(n & 0xff); b.write((n >> 8) & 0xff) }
          else { b.write(0xfd); b.write(n & 0xff); b.write((n >> 8) & 0xff); b.write((n >> 16) & 0xff) }
        params.foreach {
          case PLong(v) =>
            (0 until 8).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
          case PDouble(v) =>
            val bits = java.lang.Double.doubleToLongBits(v)
            (0 until 8).foreach(i => b.write(((bits >> (8 * i)) & 0xff).toInt))
          case PStr(s) =>
            val a = s.getBytes(UTF_8); wLenenc(a.length); b.write(a)
          case PDec(s) =>
            val a = s.getBytes(UTF_8); wLenenc(a.length); b.write(a)
          case PDate(y, m, d) =>
            b.write(4); b.write(y & 0xff); b.write((y >> 8) & 0xff)
            b.write(m); b.write(d)
          case PNull => ()
        }
      }
      writePacket(0, b.toByteArray)
      val first = readPacket()
      (first(0) & 0xff) match {
        case 0x00 => Right((Nil, Nil))
        case 0xff => Left(new String(first, 9, first.length - 9, UTF_8))
        case _ =>
          val nCols = lenencInt(first, Array(0)).toInt
          val cols = (0 until nCols).map { _ =>
            val p = readPacket(); val pos = Array(0)
            (0 until 4).foreach(_ => lenencStr(p, pos))
            lenencStr(p, pos)
          }
          assert((readPacket()(0) & 0xff) == 0xfe, "EOF after columns expected")
          val rows = Seq.newBuilder[Seq[String]]
          val nb = (nCols + 7 + 2) / 8
          var done = false
          while (!done) {
            val p = readPacket()
            if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
            else {
              assert((p(0) & 0xff) == 0x00, "binary row header expected")
              val pos = Array(1 + nb)
              rows += (0 until nCols).map { i =>
                val isNull = (p(1 + (i + 2) / 8) & (1 << ((i + 2) % 8))) != 0
                if (isNull) null else lenencStr(p, pos)
              }
            }
          }
          Right((cols, rows.result()))
      }
    }

    def close(): Unit = {
      writePacket(0, Array(0x01.toByte)) // COM_QUIT
      sock.close()
    }
  }

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

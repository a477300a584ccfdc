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

  private final class Client(port: Int, compression: Long = 0L,
      zstd: Boolean = false) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    // the stream block payloads decode from: the raw socket, or (inside a
    // compressed block body) this client's OWN frame decoder — layout
    // implemented independently of the server's; the CityHash128 used for
    // checksums is the shared library port, itself pinned by the C++-twin
    // vectors in CityHashParitySpec
    private var cur: InputStream = in

    /** Independent decoder for the checksummed LZ4 frame stream: 16-byte
      * CityHash128, method byte, compressed size (incl. 9-byte header),
      * uncompressed size, raw LZ4 block. */
    private final class FrameIn(raw: InputStream) extends InputStream {
      private var buf: Array[Byte] = Array.emptyByteArray
      private var pos = 0
      private def rawN(n: Int): Array[Byte] = {
        val b = new Array[Byte](n); var off = 0
        while (off < n) {
          val r = raw.read(b, off, n - off)
          if (r < 0) throw new EOFException(); off += r
        }
        b
      }
      private def le(b: Array[Byte], off: Int, n: Int): Long = {
        var v = 0L; (0 until n).foreach(i => v |= (b(off + i) & 0xffL) << (8 * i)); v
      }
      private def fill(): Unit = {
        val sum = rawN(16)
        val head = rawN(9)
        val cLen = le(head, 1, 4).toInt
        val uLen = le(head, 5, 4).toInt
        val payload = rawN(cLen - 9)
        val whole = head ++ payload
        val (lo, hi) = graft.server.CityHash102.cityHash128(whole, 0, whole.length)
        assert(lo == le(sum, 0, 8) && hi == le(sum, 8, 8),
          "frame checksum mismatch")
        buf = (head(0) & 0xff) match {
          case 0x82 =>
            net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
              .decompress(payload, 0, payload.length, uLen)
          case 0x90 =>
            val dst = new Array[Byte](uLen)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              dst, 0, uLen, payload, 0, payload.length)
            assert(n.toInt == uLen, "zstd frame size mismatch")
            dst
          case other => fail(f"unexpected method byte 0x$other%02x")
        }
        pos = 0
      }
      override def read(): Int = {
        if (pos >= buf.length) fill()
        val b = buf(pos) & 0xff; pos += 1; b
      }
    }

    private def readN(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); var off = 0
      while (off < n) {
        val r = cur.read(b, off, n - off)
        if (r < 0) throw new EOFException(); off += r
      }
      b
    }
    private def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        val b = cur.read(); if (b < 0) throw new EOFException()
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    private def str(): String = {
      val n = varint().toInt
      if (n == 0) "" else new String(readN(n), UTF_8)
    }
    private def wVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def wStr(s: String): Unit = {
      val a = s.getBytes(UTF_8); wVarint(a.length.toLong); out.write(a)
    }
    private def fixedLE(bytes: Int): Long = {
      val a = readN(bytes); var v = 0L
      (0 until bytes).foreach(i => v |= (a(i) & 0xffL) << (8 * i))
      v
    }

    // handshake
    val (serverName, serverRev): (String, Long) = {
      wVarint(0L) // Hello
      wStr("graft-test-client")
      wVarint(21L); wVarint(8L); wVarint(54372L)
      wStr("default"); wStr("tester"); wStr("")
      out.flush()
      assert(varint() == 0L, "server Hello expected")
      val name = str()
      varint(); varint() // version
      val rev = varint()
      if (rev >= 54058L) str() // timezone
      if (rev >= 54372L) str() // display name
      (name, rev)
    }

    def ping(): Boolean = {
      wVarint(4L); out.flush()
      varint() == 4L
    }

    /** Write-side frame encoder (independent of the server's). */
    private def wFrame(body: Array[Byte]): Unit = {
      // this client compresses its own frames with the SAME method it asks
      // the server to use, like clickhouse-client does
      val (buf, n) =
        if (zstd) {
          val max = com.github.luben.zstd.Zstd.compressBound(
            body.length.toLong).toInt
          val b = new Array[Byte](9 + max)
          b(0) = 0x90.toByte
          (b, com.github.luben.zstd.Zstd.compressByteArray(
            b, 9, max, body, 0, body.length, 1).toInt)
        } else {
          val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
          val max = comp.maxCompressedLength(body.length)
          val b = new Array[Byte](9 + max)
          b(0) = 0x82.toByte
          (b, comp.compress(body, 0, body.length, b, 9, max))
        }
      def putLE(off: Int, v: Long, bytes: Int): Unit =
        (0 until bytes).foreach(i => buf(off + i) = (v >>> (8 * i)).toByte)
      putLE(1, 9L + n, 4); putLE(5, body.length.toLong, 4)
      val (lo, hi) = graft.server.CityHash102.cityHash128(buf, 0, 9 + n)
      val sum = new Array[Byte](16)
      (0 until 8).foreach { i =>
        sum(i) = (lo >>> (8 * i)).toByte; sum(8 + i) = (hi >>> (8 * i)).toByte
      }
      out.write(sum); out.write(buf, 0, 9 + n)
    }

    /** The empty-block body (BlockInfo + 0 columns, 0 rows) as bytes. */
    private def emptyBlockBody(): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(1); b.write(0) // BlockInfo field 1: is_overflows = 0
      b.write(2); b.write(Array[Byte](-1, -1, -1, -1)) // field 2: bucket -1
      b.write(0) // BlockInfo end
      b.write(0); b.write(0) // 0 columns, 0 rows
      b.toByteArray
    }

    /** Send one typed client Data packet (INSERT-payload shape). */
    def sendDataBlock(colName: String, chType: String,
        values: Seq[String]): Unit = {
      wVarint(2L); wStr("") // client Data + table name (plain always)
      val b = new java.io.ByteArrayOutputStream()
      def bVarint(v0: Long): Unit = {
        var v = v0
        while ((v & ~0x7fL) != 0) { b.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
        b.write(v.toInt)
      }
      b.write(1); b.write(0); b.write(2)
      b.write(Array[Byte](-1, -1, -1, -1)); b.write(0)
      bVarint(1L); bVarint(values.length.toLong)
      val nm = colName.getBytes(UTF_8); bVarint(nm.length.toLong); b.write(nm)
      val tp = chType.getBytes(UTF_8); bVarint(tp.length.toLong); b.write(tp)
      values.foreach { v =>
        val a = v.getBytes(UTF_8); bVarint(a.length.toLong); b.write(a)
      }
      if (compression != 0L) wFrame(b.toByteArray) else out.write(b.toByteArray)
      out.flush()
    }

    def sendQuery(sql: String, settings: Seq[(String, Either[Long, String])] = Nil): Unit = {
      wVarint(1L) // Query
      wStr("") // query id
      // ClientInfo (classic layout at rev 54372)
      out.write(1) // initial query
      wStr(""); wStr(""); wStr("") // initial user/id/address
      out.write(1) // TCP interface
      wStr("tester"); wStr("testhost"); wStr("graft-test-client")
      wVarint(21L); wVarint(8L); wVarint(54372L)
      wStr("") // quota key (rev >= 54060)
      val allSettings =
        if (zstd) settings :+ ("network_compression_method" ->
          (Right("zstd"): Either[Long, String]))
        else settings
      allSettings.foreach { case (name, v) =>
        wStr(name)
        v.fold(wVarint, wStr) // classic typed layouts: varint or string
      }
      wStr("") // settings terminator
      wVarint(2L) // stage: complete
      wVarint(compression)
      wStr(sql)
      // external-tables terminator: empty client Data block (its BODY is
      // compressed when the query negotiated compression)
      wVarint(2L) // client Data
      wStr("") // table name
      if (compression != 0L) wFrame(emptyBlockBody())
      else out.write(emptyBlockBody())
      out.flush()
    }

    /** Decode one server block; returns (names, types, rows as rendered
      * strings with null → null). */
    private def readBlock(): (Seq[String], Seq[String], Seq[Seq[String]]) = {
      str() // temporary table name (always plain)
      // the block BODY rides the compressed frame stream when negotiated
      if (compression != 0L) cur = new FrameIn(in)
      try readBlockBody()
      finally cur = in
    }

    private def readBlockBody(): (Seq[String], Seq[String], Seq[Seq[String]]) = {
      var field = varint()
      while (field != 0L) {
        field match {
          case 1L => cur.read()
          case 2L => readN(4)
          case other => fail(s"unknown BlockInfo field $other")
        }
        field = varint()
      }
      val nCols = varint().toInt
      val nRows = varint().toInt
      val names = Seq.newBuilder[String]; val types = Seq.newBuilder[String]
      val cols = (0 until nCols).map { _ =>
        val name = str(); val tpe = str()
        names += name; types += tpe
        val (base, nullable) =
          if (tpe.startsWith("Nullable(")) (tpe.stripPrefix("Nullable(").stripSuffix(")"), true)
          else (tpe, false)
        val nulls: Array[Boolean] =
          if (nullable) Array.fill(nRows)(cur.read() == 1)
          else Array.fill(nRows)(false)
        (0 until nRows).map { r =>
          val v: String = base match {
            case "Int8" => fixedLE(1).toByte.toString
            case "Int16" => fixedLE(2).toShort.toString
            case "Int32" => fixedLE(4).toInt.toString
            case "Int64" => fixedLE(8).toString
            case "UInt8" => graft.sql.Render.value(fixedLE(1) == 1L)
            case "Float32" => graft.sql.Render.value(
              java.lang.Float.intBitsToFloat(fixedLE(4).toInt).toDouble)
            case "Float64" => graft.sql.Render.value(
              java.lang.Double.longBitsToDouble(fixedLE(8)))
            case "Date" => java.time.LocalDate.ofEpochDay(fixedLE(2)).toString
            case "DateTime" =>
              new java.sql.Timestamp(fixedLE(4) * 1000L).toString
            case "String" => str()
            case other => fail(s"client cannot decode type $other")
          }
          if (nulls(r)) null else v
        }
      }
      (names.result(), types.result(),
        (0 until nRows).map(r => cols.map(c => c(r))))
    }

    /** Left(exception message) or Right((names, types, rows)). */
    def query(sql: String,
        settings: Seq[(String, Either[Long, String])] = Nil):
        Either[String, (Seq[String], Seq[String], Seq[Seq[String]])] = {
      sendQuery(sql, settings)
      var names = Seq.empty[String]; var types = Seq.empty[String]
      val rows = Seq.newBuilder[Seq[String]]
      while (true) {
        varint() match {
          case 1L => // Data
            val (n, t, r) = readBlock()
            if (n.nonEmpty) { names = n; types = t }
            rows ++= r
          case 2L => // Exception
            readN(4) // code
            str() // name
            val msg = str()
            str(); in.read() // stack, nested
            return Left(msg)
          case 5L => return Right((names, types, rows.result()))
          case 3L | 6L | 7L | 8L => // progress/profile/totals/extremes unused
            fail("server sent a packet this test does not expect")
          case other => fail(s"unexpected server packet $other")
        }
      }
      sys.error("unreachable")
    }

    /** Read one Exception packet off the wire (no query in flight). */
    def readException(): String = {
      assert(varint() == 2L, "expected an Exception packet")
      readN(4); str()
      val msg = str()
      str(); cur.read()
      msg
    }

    def close(): Unit = sock.close()
  }

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

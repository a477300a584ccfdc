package graft

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** From-scratch wire-protocol test clients, shared by the server specs and
  * the fuzz/torture suites. Written against the PUBLIC protocols (MySQL
  * client/server protocol; ClickHouse native TCP), sharing no code with the
  * servers — a framing or length-encoding bug on either side breaks the
  * decode. Extracted from MySqlServerSpec / ClickHouseServerSpec so
  * WireFuzzSpec can drive sentinel connections with full decoding. */
object WireClients {

  /** Minimal MySQL client: packet framing, HandshakeResponse41,
    * COM_QUERY/COM_PING, text resultsets, and the binary prepared path
    * (COM_STMT_PREPARE/EXECUTE/CLOSE). */
  final class MySql(port: Int, user: String = "tester",
      auth: Array[Byte] = Array.empty) {
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
      writePacket(1, MySql.handshakeResponse41(user, auth))
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

  object MySql {
    /** HandshakeResponse41 payload bytes (accept-all server; user `tester`,
      * empty auth) — also the fuzz corpus's valid-handshake template. */
    def handshakeResponse41: Array[Byte] = handshakeResponse41("tester", Array.empty)

    /** HandshakeResponse41 with arbitrary credentials — the auth-parity
      * probe (WireAuthSpec): any user + any auth-response bytes must be
      * accepted, the reference's posture. */
    def handshakeResponse41(user: String, auth: Array[Byte]): Array[Byte] = {
      val resp = new java.io.ByteArrayOutputStream()
      def i4(x: Long): Unit =
        (0 until 4).foreach(i => resp.write(((x >> (8 * i)) & 0xff).toInt))
      i4(0x0200L | 0x8000L) // CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
      i4(16777216L) // max packet
      resp.write(33) // charset
      resp.write(new Array[Byte](23))
      resp.write(user.getBytes(UTF_8)); resp.write(0) // user
      // one raw byte is only a valid length-encoded integer below 251; a
      // longer auth blob needs a lenenc-int and would silently corrupt here
      require(auth.length < 251, s"auth blob ${auth.length}B needs lenenc-int")
      resp.write(auth.length) // length-prefixed auth response (SECURE_CONN)
      resp.write(auth)
      resp.toByteArray
    }

    /** Frame a payload as wire packets (fuzz corpus helper). */
    def framed(seq: Int, payload: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(payload.length & 0xff); b.write((payload.length >> 8) & 0xff)
      b.write((payload.length >> 16) & 0xff); b.write(seq & 0xff)
      b.write(payload)
      b.toByteArray
    }
  }

  /** Minimal ClickHouse native-TCP client: varint framing, Hello/Query/Data
    * packets, typed native column decode incl. Nullable, and the
    * checksummed LZ4/ZSTD compressed frame stream. */
  final class Ch(port: Int, compression: Long = 0L, zstd: Boolean = false,
      user: String = "tester", password: String = "") {
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
          case other =>
            throw new AssertionError(f"unexpected method byte 0x$other%02x")
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
      out.write(Ch.helloBytes(user, password))
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
    private def emptyBlockBody(): Array[Byte] = Ch.emptyBlockBody()

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
          case other => throw new AssertionError(s"unknown BlockInfo field $other")
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
            case other => throw new AssertionError(s"client cannot decode type $other")
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
            throw new AssertionError("server sent a packet this test does not expect")
          case other => throw new AssertionError(s"unexpected server packet $other")
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

  object Ch {
    /** The client Hello packet bytes (fuzz corpus template). */
    def helloBytes: Array[Byte] = helloBytes("tester", "")

    /** Hello with arbitrary credentials (WireAuthSpec — accept-all parity). */
    def helloBytes(user: String, password: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      def v(v0: Long): Unit = {
        var x = v0
        while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
        b.write(x.toInt)
      }
      def s(t: String): Unit = {
        val a = t.getBytes(UTF_8); v(a.length.toLong); b.write(a)
      }
      v(0L) // Hello
      s("graft-test-client")
      v(21L); v(8L); v(54372L)
      s("default"); s(user); s(password)
      b.toByteArray
    }

    /** The plain (uncompressed) Query packet bytes for `sql` (fuzz corpus
      * template) — classic rev-54372 ClientInfo, no settings, stage
      * complete, compression off, empty external-tables terminator. */
    def queryBytes(sql: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      def v(v0: Long): Unit = {
        var x = v0
        while ((x & ~0x7fL) != 0) { b.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
        b.write(x.toInt)
      }
      def s(t: String): Unit = {
        val a = t.getBytes(UTF_8); v(a.length.toLong); b.write(a)
      }
      v(1L); s("") // Query + id
      b.write(1); s(""); s(""); s("") // ClientInfo
      b.write(1)
      s("tester"); s("testhost"); s("graft-test-client")
      v(21L); v(8L); v(54372L)
      s("") // quota key
      s("") // settings terminator
      v(2L) // stage: complete
      v(0L) // no compression
      s(sql)
      v(2L); s("") // external-tables terminator Data packet
      b.write(emptyBlockBody())
      b.toByteArray
    }

    def emptyBlockBody(): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(1); b.write(0) // BlockInfo field 1: is_overflows = 0
      b.write(2); b.write(Array[Byte](-1, -1, -1, -1)) // field 2: bucket -1
      b.write(0) // BlockInfo end
      b.write(0); b.write(0) // 0 columns, 0 rows
      b.toByteArray
    }
  }
}

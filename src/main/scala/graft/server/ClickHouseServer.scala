package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sql.{GraftSession, Render}

/** ClickHouse NATIVE wire-protocol front door — the reference's second
  * entry point (servers/clickhouse/clickhouse_handler.rs:1,
  * interactive_worker_base.rs:32), restated over the library's SQL
  * session the same way [[MySqlServer]] restates the MySQL one.
  *
  * Protocol scope (public ClickHouse TCP protocol, pinned at negotiated
  * revision ≤ 54372 — the display-name era, BEFORE strings-serialized
  * settings flags/OpenTelemetry/interserver additions, so the ClientInfo
  * and settings layouts are the stable classic ones):
  *   - client Hello → server Hello (name, version, revision, timezone,
  *     display name);
  *   - Query (id, ClientInfo, settings-until-empty-name, stage,
  *     compression, text) → typed native Data blocks → EndOfStream;
  *     the trailing empty client Data block (external-tables terminator)
  *     is consumed;
  *   - Ping → Pong; Cancel closes; errors → Exception packet (code,
  *     name, message, stack, nested flag), connection survives;
  *   - compression is NOT negotiated away silently: a client requesting
  *     LZ4 gets a descriptive Exception (run clickhouse-client with
  *     --compression 0), because half-implementing the checksummed frame
  *     format would corrupt streams at the first large block.
  *
  * Column encodings are the REAL native ones for the common types —
  * fixed-width little-endian Int8/16/32/64, Float32/64, UInt8 bools,
  * varint-length Strings, Date (UInt16 days), DateTime (UInt32 seconds),
  * Nullable(T) as a null-flag byte column ahead of the values — and the
  * [[graft.sql.Render]] string form for everything else (decimals,
  * arrays, maps), so a native client reads typed data where types exist
  * and faithful text where they don't. Rows stream in bounded blocks via
  * `toLocalIterator` — the server never materializes a result. */
class ClickHouseServer(spark: SparkSession, port: Int = 0,
    blockRows: Int = 8192) {

  @volatile private var serverSocket: ServerSocket = _
  @volatile private var running = false

  def start(): Int = synchronized {
    require(serverSocket == null, "ClickHouseServer already started")
    serverSocket = new ServerSocket(port)
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = serverSocket.accept()
          val t = new Thread(() => handleConnection(sock))
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Throwable if !running =>
          case e: Throwable =>
            System.err.println(s"[clickhouse] accept failed: ${e.getMessage}")
        }
      }
    })
    acceptor.setDaemon(true)
    acceptor.setName("graft-clickhouse-acceptor")
    acceptor.start()
    serverSocket.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    if (serverSocket != null) { serverSocket.close(); serverSocket = null }
  }

  // ---- primitive codecs ----------------------------------------------------

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n); var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("client closed"); off += r
    }
    buf
  }

  private def readVarint(in: InputStream): Long = {
    var v = 0L; var shift = 0
    while (true) {
      val b = in.read()
      if (b < 0) throw new EOFException("client closed")
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v
  }

  private def readString(in: InputStream): String = {
    val n = readVarint(in).toInt
    if (n == 0) "" else new String(readN(in, n), UTF_8)
  }

  private def writeVarint(out: OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeString(out: OutputStream, s: String): Unit = {
    val a = s.getBytes(UTF_8); writeVarint(out, a.length.toLong); out.write(a)
  }

  private def writeFixedLE(out: OutputStream, v: Long, bytes: Int): Unit =
    (0 until bytes).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))

  // server packet ids
  private val SrvHello = 0L; private val SrvData = 1L; private val SrvException = 2L
  private val SrvPong = 4L; private val SrvEndOfStream = 5L
  // client packet ids
  private val CliHello = 0L; private val CliQuery = 1L; private val CliData = 2L
  private val CliCancel = 3L; private val CliPing = 4L

  /** Highest revision this server speaks; the classic pre-54429 layouts. */
  private val ServerRevision = 54372L

  // ---- connection lifecycle ------------------------------------------------

  private def handleConnection(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      // client Hello
      require(readVarint(in) == CliHello, "expected client Hello")
      readString(in) // client name
      readVarint(in); readVarint(in) // client version major/minor
      val clientRev = readVarint(in)
      val db = readString(in)
      readString(in); readString(in) // user, password: accept-all
      val rev = math.min(clientRev, ServerRevision)
      // server Hello
      writeVarint(out, SrvHello)
      writeString(out, "Graft")
      writeVarint(out, 21L); writeVarint(out, 8L) // version major/minor
      writeVarint(out, ServerRevision)
      if (rev >= 54058L) writeString(out, "UTC")
      if (rev >= 54372L) writeString(out, "graft")
      out.flush()
      if (db.nonEmpty && db != "default")
        GraftSession.cached(spark).sql(s"USE $db")

      var open = true
      while (open) {
        readVarint(in) match {
          case CliPing =>
            writeVarint(out, SrvPong); out.flush()
          case CliCancel => open = false
          case CliHello => // protocol error — one hello per connection
            open = false
          case CliQuery =>
            val query = readQueryPacket(in, rev)
            // external-tables terminator: an empty client Data block
            consumeClientData(in, rev)
            query match {
              case Left(reject) => sendException(out, reject); out.flush()
              case Right(text) => runQuery(out, text)
            }
          case CliData =>
            // stray data block (e.g. INSERT payload form) — consume, ignore
            ()
          case other =>
            sendException(out, s"unsupported client packet $other")
            out.flush()
        }
      }
    } catch {
      case _: EOFException =>
      case e: Throwable =>
        System.err.println(s"[clickhouse] connection error: ${e.getMessage}")
    } finally sock.close()
  }

  /** Parse a Query packet at `rev`; Left(reason) when it must be rejected
    * (compression), Right(queryText) otherwise. */
  private def readQueryPacket(in: InputStream, rev: Long): Either[String, String] = {
    readString(in) // query id
    if (rev >= 54032L) { // ClientInfo
      val kind = in.read()
      if (kind > 0) {
        readString(in); readString(in); readString(in) // initial user/id/addr
        val iface = in.read() // 1 = TCP
        if (iface == 1) {
          readString(in); readString(in); readString(in) // os_user, host, name
          readVarint(in); readVarint(in); readVarint(in) // version + revision
        } else {
          readString(in); readString(in) // HTTP method + user agent
        }
        if (rev >= 54060L) readString(in) // quota key
        if (rev >= 54401L) readVarint(in) // version patch
      }
    }
    // settings: (name, value) pairs, empty name terminates. At the pinned
    // classic revisions values are strings for custom settings from our own
    // client; a full typed-settings decode is out of scope — any settings
    // present are skipped as string pairs.
    var name = readString(in)
    while (name.nonEmpty) { readString(in); name = readString(in) }
    readVarint(in) // processing stage (2 = complete)
    val compression = readVarint(in)
    val text = readString(in)
    if (compression != 0L)
      Left("compression is not supported by this server; " +
        "reconnect with --compression 0 (network_compression_method=none)")
    else Right(text)
  }

  /** Consume one client Data packet (external-tables terminator / INSERT
    * payload): table name + block header + columns (all-String assumed for
    * nonzero payloads from our scope). */
  private def consumeClientData(in: InputStream, rev: Long): Unit = {
    val id = readVarint(in)
    require(id == CliData, s"expected client Data terminator, got packet $id")
    if (rev >= 50264L) readString(in) // temporary table name
    // BlockInfo
    var field = readVarint(in)
    while (field != 0L) {
      field match {
        case 1L => in.read() // is_overflows
        case 2L => readN(in, 4) // bucket_num i32
        case _ => throw new java.io.IOException(s"unknown BlockInfo field $field")
      }
      field = readVarint(in)
    }
    val nCols = readVarint(in).toInt
    val nRows = readVarint(in).toInt
    (0 until nCols).foreach { _ =>
      readString(in); readString(in) // name, type (String assumed)
      (0 until nRows).foreach(_ => readString(in))
    }
  }

  private def sendException(out: OutputStream, msg: String): Unit = {
    writeVarint(out, SrvException)
    writeFixedLE(out, 1105L, 4) // code (i32 LE)
    writeString(out, "DB::Exception")
    writeString(out, msg)
    writeString(out, "") // stack trace
    out.write(0) // no nested exception
  }

  // ---- typed native column encodings ---------------------------------------

  private sealed trait Enc {
    def chType: String
    def write(out: OutputStream, v: Any): Unit
    def default(out: OutputStream): Unit
  }
  private final class FixedEnc(val chType: String, bytes: Int,
      toLong: Any => Long) extends Enc {
    def write(out: OutputStream, v: Any): Unit =
      writeFixedLE(out, toLong(v), bytes)
    def default(out: OutputStream): Unit = writeFixedLE(out, 0L, bytes)
  }
  private final class StrEnc(render: Any => String) extends Enc {
    val chType = "String"
    def write(out: OutputStream, v: Any): Unit = writeString(out, render(v))
    def default(out: OutputStream): Unit = writeString(out, "")
  }

  private def encoderFor(dt: DataType): Enc = dt match {
    case ByteType => new FixedEnc("Int8", 1, v => v.asInstanceOf[Byte].toLong)
    case ShortType => new FixedEnc("Int16", 2, v => v.asInstanceOf[Short].toLong)
    case IntegerType => new FixedEnc("Int32", 4, v => v.asInstanceOf[Int].toLong)
    case LongType => new FixedEnc("Int64", 8, v => v.asInstanceOf[Long])
    case BooleanType =>
      new FixedEnc("UInt8", 1, v => if (v.asInstanceOf[Boolean]) 1L else 0L)
    case FloatType => new FixedEnc("Float32", 4,
      v => java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL)
    case DoubleType => new FixedEnc("Float64", 8,
      v => java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case DateType => new FixedEnc("Date", 2,
      v => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay)
    case _: TimestampType => new FixedEnc("DateTime", 4,
      v => v.asInstanceOf[java.sql.Timestamp].getTime / 1000L)
    case StringType => new StrEnc(v => v.asInstanceOf[String])
    case _ => new StrEnc(Render.value) // decimals/arrays/structs: text form
  }

  private def runQuery(out: OutputStream, text: String): Unit = {
    try {
      val df = GraftSession.cached(spark).sql(text)
      if (df.schema.nonEmpty) {
        val fields = df.schema.fields
        val encs = fields.map(f => encoderFor(f.dataType))
        val rows = df.toLocalIterator()
        // header block (zero rows) announces the schema, as CH servers do
        writeBlock(out, fields, encs, Seq.empty)
        val buf = scala.collection.mutable.ArrayBuffer[Row]()
        while (rows.hasNext) {
          buf += rows.next()
          if (buf.length >= blockRows) {
            writeBlock(out, fields, encs, buf.toSeq); buf.clear()
          }
        }
        if (buf.nonEmpty) writeBlock(out, fields, encs, buf.toSeq)
      }
      writeVarint(out, SrvEndOfStream)
      out.flush()
    } catch {
      case e: Throwable =>
        sendException(out,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(480))
        out.flush()
    }
  }

  private def writeBlock(out: OutputStream, fields: Array[StructField],
      encs: Array[Enc], rows: Seq[Row]): Unit = {
    writeVarint(out, SrvData)
    writeString(out, "") // temporary table name
    // BlockInfo: field 1 is_overflows=0, field 2 bucket_num=-1, end
    writeVarint(out, 1L); out.write(0)
    writeVarint(out, 2L); writeFixedLE(out, 0xffffffffL, 4)
    writeVarint(out, 0L)
    writeVarint(out, fields.length.toLong)
    writeVarint(out, rows.length.toLong)
    fields.indices.foreach { c =>
      val f = fields(c); val enc = encs(c)
      writeString(out, f.name)
      writeString(out, if (f.nullable) s"Nullable(${enc.chType})" else enc.chType)
      if (f.nullable) // null-flag column precedes the values
        rows.foreach(r => out.write(if (r.isNullAt(c)) 1 else 0))
      rows.foreach { r =>
        if (r.isNullAt(c)) enc.default(out) else enc.write(out, r.get(c))
      }
    }
  }
}

package graft.server

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.{GraftSession, Render}

/** MySQL wire-protocol front door — the reference's primary entry point
  * (servers/mysql/mysql_handler.rs:1, mysql_interactive_worker.rs:80),
  * restated over the library's SQL session: a stock `mysql` client (or any
  * connector speaking Protocol::41) connects, authenticates trivially, and
  * issues statements that execute through [[graft.sql.GraftSession]] — the
  * same dialect surface the golden suites pin (numbers(), system tables,
  * ENGINE= DDL, combinators), now reachable over a socket.
  *
  * Scope mirrors the reference worker exactly:
  *   - `COM_QUERY` → parse + execute + text-protocol resultset
  *     (`do_query`, mysql_interactive_worker.rs:153);
  *   - `COM_INIT_DB` → `USE db` (`do_init`:193);
  *   - `COM_PING` → OK; `COM_QUIT` → close;
  *   - prepared statements are REFUSED with a descriptive error, as the
  *     reference refuses them (`do_prepare`/`do_execute`:124-149);
  *   - any credentials are accepted (the reference's default auth).
  *
  * Protocol notes (public MySQL Client/Server Protocol):
  *   - packets are 3-byte LE length + 1-byte sequence id + payload;
  *   - results use the TEXT protocol: every cell is a length-encoded
  *     string rendered by [[graft.sql.Render]] (the same rendering the
  *     reference's query_result_writer.rs emits), NULL = 0xfb, column
  *     type VAR_STRING — stock clients render from the text form;
  *   - rows stream through `toLocalIterator` — the server never
  *     materializes a full result (a wire client is a streaming sink; the
  *     16 MB single-packet limit bounds one ROW, not the result).
  *
  * Threading: one daemon accept loop, one daemon thread per connection —
  * connections share the SparkSession (Spark schedules concurrent jobs),
  * each getting the session's cached GraftSession exactly like concurrent
  * library callers. */
class MySqlServer(spark: SparkSession, port: Int = 0) {

  @volatile private var serverSocket: ServerSocket = _
  @volatile private var running = false

  /** Bind + start accepting; returns the bound port (ephemeral when 0). */
  def start(): Int = synchronized {
    require(serverSocket == null, "MySqlServer already started")
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
          case _: Throwable if !running => // closed during stop()
          case e: Throwable =>
            System.err.println(s"[mysql] accept failed: ${e.getMessage}")
        }
      }
    })
    acceptor.setDaemon(true)
    acceptor.setName("graft-mysql-acceptor")
    acceptor.start()
    serverSocket.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    if (serverSocket != null) { serverSocket.close(); serverSocket = null }
  }

  // ---- packet framing ------------------------------------------------------

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("client closed")
      off += r
    }
    buf
  }

  /** Returns (sequenceId, payload). */
  private def readPacket(in: InputStream): (Int, Array[Byte]) = {
    val head = readN(in, 4)
    val len = (head(0) & 0xff) | ((head(1) & 0xff) << 8) | ((head(2) & 0xff) << 16)
    ((head(3) & 0xff), readN(in, len))
  }

  private def writePacket(out: OutputStream, seq: Int, payload: Array[Byte]): Unit = {
    require(payload.length < 0xffffff, "single-packet limit (16 MB) exceeded")
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
  }

  private final class Pkt {
    private val b = new java.io.ByteArrayOutputStream()
    def i1(v: Int): Pkt = { b.write(v & 0xff); this }
    def i2(v: Int): Pkt = { i1(v); i1(v >> 8) }
    def i4(v: Long): Pkt = { i2(v.toInt); i2((v >> 16).toInt) }
    def raw(a: Array[Byte]): Pkt = { b.write(a); this }
    def z(s: String): Pkt = { raw(s.getBytes(UTF_8)); i1(0) }
    def lenencInt(v: Long): Pkt =
      if (v < 251) i1(v.toInt)
      else if (v < 0x10000L) { i1(0xfc); i2(v.toInt) }
      else if (v < 0x1000000L) { i1(0xfd); i1(v.toInt); i1((v >> 8).toInt); i1((v >> 16).toInt) }
      else { i1(0xfe); i4(v); i4(v >> 32) }
    def lenencStr(s: String): Pkt = {
      val a = s.getBytes(UTF_8); lenencInt(a.length.toLong); raw(a)
    }
    def bytes: Array[Byte] = b.toByteArray
  }

  // capability bits this server speaks (Protocol::41 text protocol)
  private val CapProtocol41 = 0x00000200L
  private val CapSecureConn = 0x00008000L
  private val CapPluginAuth = 0x00080000L
  private val ServerStatusAutocommit = 0x0002

  private def okPacket(affected: Long = 0L): Array[Byte] =
    new Pkt().i1(0x00).lenencInt(affected).lenencInt(0L)
      .i2(ServerStatusAutocommit).i2(0).bytes

  private def eofPacket(): Array[Byte] =
    new Pkt().i1(0xfe).i2(0).i2(ServerStatusAutocommit).bytes

  private def errPacket(code: Int, msg: String): Array[Byte] =
    new Pkt().i1(0xff).i2(code).raw("#".getBytes(UTF_8))
      .raw("HY000".getBytes(UTF_8)).raw(msg.getBytes(UTF_8)).bytes

  // ---- connection lifecycle ------------------------------------------------

  private val connIds = new java.util.concurrent.atomic.AtomicInteger(0)

  private def handleConnection(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    try {
      // Initial Handshake Packet, protocol version 10. The 21-byte
      // auth-plugin-data salt is fixed — auth is accept-all, the salt is
      // never verified (the reference's default auth posture).
      val caps = CapProtocol41 | CapSecureConn | CapPluginAuth
      val hs = new Pkt()
        .i1(0x0a).z("8.0.0-graft")
        .i4(connIds.incrementAndGet().toLong)
        .raw("graftsal".getBytes(UTF_8)).i1(0) // salt part 1 (8) + filler
        .i2((caps & 0xffff).toInt)
        .i1(33) // utf8_general_ci
        .i2(ServerStatusAutocommit)
        .i2(((caps >> 16) & 0xffff).toInt)
        .i1(21) // auth-plugin-data length
        .raw(new Array[Byte](10)) // reserved
        .raw("graftsaltpt2".getBytes(UTF_8)).i1(0) // salt part 2 (12) + NUL
        .z("mysql_native_password")
      writePacket(out, 0, hs.bytes)
      out.flush()
      val (seq, _) = readPacket(in) // HandshakeResponse41 — accept anyone
      writePacket(out, seq + 1, okPacket())
      out.flush()

      var open = true
      while (open) {
        val (_, cmd) = readPacket(in) // commands restart at sequence 0
        if (cmd.isEmpty) open = false
        else (cmd(0) & 0xff) match {
          case 0x01 => open = false // COM_QUIT
          case 0x0e => writePacket(out, 1, okPacket()); out.flush() // COM_PING
          case 0x02 => // COM_INIT_DB → USE <db> (do_init:193)
            val db = new String(cmd, 1, cmd.length - 1, UTF_8)
            runStatement(out, s"USE $db")
          case 0x03 => // COM_QUERY
            runStatement(out, new String(cmd, 1, cmd.length - 1, UTF_8))
          case 0x16 | 0x17 => // COM_STMT_PREPARE / COM_STMT_EXECUTE
            writePacket(out, 1,
              errPacket(1105, "Prepare is not support in Graft."))
            out.flush()
          case other =>
            writePacket(out, 1, errPacket(1047, s"Unknown command $other"))
            out.flush()
        }
      }
    } catch {
      case _: EOFException => // client went away
      case e: Throwable =>
        System.err.println(s"[mysql] connection error: ${e.getMessage}")
    } finally sock.close()
  }

  // stock clients open with `select @@version_comment limit 1` (and
  // connectors probe other @@ vars); answer them as one empty-string cell
  // instead of sending @@ syntax into the dialect
  private val SysVarRe = """(?is)^\s*select\s+@@[\w.]+(\s+limit\s+\d+)?\s*$""".r

  private def runStatement(out: OutputStream, text: String): Unit = {
    try {
      SysVarRe.findFirstIn(text) match {
        case Some(_) =>
          writeResultSet(out, Seq("@@"), Iterator(Seq("")))
        case None =>
          val df = GraftSession.cached(spark).sql(text)
          if (df.schema.isEmpty) { // DDL/SET/INSERT: no result set → OK
            writePacket(out, 1, okPacket())
            out.flush()
          } else {
            val names = df.schema.fieldNames.toSeq
            val rows = df.toLocalIterator()
            val it = new Iterator[Seq[String]] {
              def hasNext: Boolean = rows.hasNext
              def next(): Seq[String] = {
                val r = rows.next()
                (0 until r.length).map(i =>
                  if (r.isNullAt(i)) null else Render.value(r.get(i)))
              }
            }
            writeResultSet(out, names, it)
          }
      }
    } catch {
      case e: Throwable =>
        writePacket(out, 1, errPacket(1105,
          Option(e.getMessage).getOrElse(e.getClass.getName).take(480)))
        out.flush()
    }
  }

  /** Text-protocol resultset: column count, N ColumnDefinition41 packets,
    * EOF, row packets (lenenc cells, NULL = 0xfb), EOF. */
  private def writeResultSet(out: OutputStream, cols: Seq[String],
      rows: Iterator[Seq[String]]): Unit = {
    var seq = 1
    def send(p: Array[Byte]): Unit = { writePacket(out, seq, p); seq += 1 }
    send(new Pkt().lenencInt(cols.length.toLong).bytes)
    cols.foreach { name =>
      send(new Pkt()
        .lenencStr("def").lenencStr("").lenencStr("").lenencStr("")
        .lenencStr(name).lenencStr(name)
        .i1(0x0c) // fixed-length fields marker
        .i2(33) // utf8_general_ci
        .i4(1024L) // display length
        .i1(0xfd) // MYSQL_TYPE_VAR_STRING (text protocol carries strings)
        .i2(0).i1(0).i2(0)
        .bytes)
    }
    send(eofPacket())
    rows.foreach { r =>
      val p = new Pkt()
      r.foreach(v => if (v == null) p.i1(0xfb) else p.lenencStr(v))
      send(p.bytes)
    }
    send(eofPacket())
    out.flush()
  }
}

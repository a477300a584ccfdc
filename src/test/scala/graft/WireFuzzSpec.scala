package graft

import java.io.EOFException
import java.net.{Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{ClickHouseServer, MySqlServer}

/** Seeded wire-protocol byte fuzz against both servers.
  *
  * Round 8 fixed two desync classes found by inspection (stray Data packets,
  * unknown settings); this suite generalizes the hunt: a deterministic
  * mutator (fixed seed — every run replays the same ≥10k mutated sessions)
  * truncates, corrupts, extends and reorders bytes at every protocol stage.
  * The contract under fuzz, per the round-8 verdict:
  *
  *   - the server NEVER hangs: with the client's write half shut down it
  *     holds the complete input, so it must answer and/or close within the
  *     generous per-session deadline;
  *   - the server NEVER emits torn protocol bytes: everything it sends
  *     before closing must frame-parse cleanly (MySQL packet framing);
  *   - the server NEVER misparses garbage into a wrong answer: on long-lived
  *     connections, framing-preserving payload corruption is interleaved
  *     with sentinel queries whose exact results are asserted — any
  *     misrouted, duplicated or desynced response breaks the sentinel;
  *   - the SERVER stays healthy throughout: fresh well-formed connections
  *     keep working, and per-connection threads do not leak.
  */
class WireFuzzSpec extends AnyFunSuite {

  private lazy val session = TestSpark.spark.newSession()
  private lazy val mysql = new MySqlServer(session)
  private lazy val mysqlPort = mysql.start()
  private lazy val ch = new ClickHouseServer(session)
  private lazy val chPort = ch.start()

  // Fixed seed: the corpus is a deterministic function of this constant.
  private val seed = 0x9E3779B97F4A7C15L

  // ---- mutator -------------------------------------------------------------

  /** One mutation pass: 1–3 random structural edits. */
  private def mutate(rng: scala.util.Random, base: Array[Byte]): Array[Byte] = {
    var b = base.clone()
    val ops = 1 + rng.nextInt(3)
    (0 until ops).foreach { _ =>
      if (b.isEmpty) b = Array.fill(1 + rng.nextInt(16))(rng.nextInt().toByte)
      else rng.nextInt(6) match {
        case 0 => // truncate
          b = b.take(rng.nextInt(b.length))
        case 1 => // flip 1–8 bytes
          (0 until 1 + rng.nextInt(8)).foreach { _ =>
            val i = rng.nextInt(b.length)
            b(i) = (b(i) ^ (1 + rng.nextInt(255))).toByte
          }
        case 2 => // insert 1–8 random bytes
          val i = rng.nextInt(b.length + 1)
          b = b.take(i) ++ Array.fill(1 + rng.nextInt(8))(rng.nextInt().toByte) ++ b.drop(i)
        case 3 => // duplicate a slice (reorder/replay)
          val from = rng.nextInt(b.length)
          val len = 1 + rng.nextInt(math.min(32, b.length - from))
          val at = rng.nextInt(b.length + 1)
          b = b.take(at) ++ b.slice(from, from + len) ++ b.drop(at)
        case 4 => // zero or max a length-ish field (first 4 bytes region)
          val i = rng.nextInt(math.min(8, b.length))
          b(i) = if (rng.nextBoolean()) 0 else 0xff.toByte
        case _ => // overwrite tail with noise
          val i = rng.nextInt(b.length)
          (i until b.length).foreach(j => b(j) = rng.nextInt().toByte)
      }
    }
    b
  }

  /** Drain a socket until EOF; returns all bytes. The write half is already
    * shut down, so a server that neither answers-then-closes nor closes
    * directly within the deadline is HANGING — that's the failure mode this
    * guards. */
  private def drainToEof(sock: Socket, deadlineMs: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    sock.setSoTimeout(1000)
    val t0 = System.nanoTime()
    var open = true
    while (open) {
      try {
        val n = sock.getInputStream.read(buf)
        if (n < 0) open = false else out.write(buf, 0, n)
      } catch {
        case _: SocketTimeoutException =>
          if ((System.nanoTime() - t0) / 1000000 > deadlineMs)
            throw new EOFException(
              s"server neither answered nor closed within ${deadlineMs} ms " +
                s"(${out.size()} bytes so far)")
      }
    }
    out.toByteArray
  }

  /** MySQL framing check: a byte stream the server SENT must decompose into
    * whole packets (3-byte LE length + seq + payload). A torn tail means the
    * server wrote a partial frame before closing — a protocol bug even
    * under garbage input. */
  private def mysqlFramesClean(b: Array[Byte]): Boolean = {
    var i = 0
    while (i + 4 <= b.length) {
      val len = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
      i += 4 + len
    }
    i == b.length
  }

  // ---- one-shot sessions: any mutation, any protocol stage ----------------

  private def oneShot(port: Int, payload: Array[Byte],
      framingCheck: Array[Byte] => Boolean): Option[String] = {
    val sock = new Socket("127.0.0.1", port)
    try {
      sock.getOutputStream.write(payload)
      sock.getOutputStream.flush()
      sock.shutdownOutput() // server now holds the COMPLETE input
      val got = drainToEof(sock, deadlineMs = 20000)
      if (!framingCheck(got)) Some(s"torn server frames (${got.length} bytes)")
      else None
    } catch {
      case _: EOFException => Some("hang")
      case _: java.net.SocketException => None // server reset mid-write: clean close
    } finally sock.close()
  }

  test("MySQL one-shot fuzz: 3000 mutated sessions — no hangs, no torn frames") {
    val rng = new scala.util.Random(seed)
    // valid-session templates the mutator starts from
    def template(): Array[Byte] = {
      val hs = WireClients.MySql.framed(1, WireClients.MySql.handshakeResponse41)
      val q = WireClients.MySql.framed(0,
        Array(0x03.toByte) ++ s"SELECT ${rng.nextInt(1000)} AS v".getBytes(UTF_8))
      val ping = WireClients.MySql.framed(0, Array(0x0e.toByte))
      rng.nextInt(4) match {
        case 0 => hs
        case 1 => hs ++ q
        case 2 => hs ++ q ++ ping
        case _ => q // pre-handshake garbage at the greeting stage
      }
    }
    val failures = Seq.newBuilder[String]
    (1 to 3000).foreach { i =>
      val payload = mutate(rng, template())
      oneShot(mysqlPort, payload, mysqlFramesClean).foreach(e =>
        failures += s"session $i: $e")
    }
    val bad = failures.result()
    assert(bad.isEmpty, s"${bad.size} bad sessions; first: ${bad.take(3).mkString("; ")}")
    // the server survived: a fresh well-formed connection still answers
    val c = new WireClients.MySql(mysqlPort)
    try assert(c.query("SELECT 7 AS v").exists(_._2.head.head == "7"))
    finally c.close()
  }

  test("ClickHouse one-shot fuzz: 3000 mutated sessions — no hangs") {
    val rng = new scala.util.Random(seed ^ 0xC11C4053L)
    def template(): Array[Byte] = {
      val hello = WireClients.Ch.helloBytes
      val q = WireClients.Ch.queryBytes(s"SELECT ${rng.nextInt(1000)} AS v")
      val ping = Array(4.toByte)
      rng.nextInt(4) match {
        case 0 => hello
        case 1 => hello ++ q
        case 2 => hello ++ q ++ ping
        case _ => q // garbage before Hello
      }
    }
    val failures = Seq.newBuilder[String]
    (1 to 3000).foreach { i =>
      // no outer framing on the native protocol, so only the hang/health
      // contract applies to the response bytes
      oneShot(chPort, mutate(rng, template()), _ => true).foreach(e =>
        failures += s"session $i: $e")
    }
    val bad = failures.result()
    assert(bad.isEmpty, s"${bad.size} bad sessions; first: ${bad.take(3).mkString("; ")}")
    val c = new WireClients.Ch(chPort)
    try assert(c.query("SELECT 7 AS v").exists(_._3.head.head == "7"))
    finally c.close()
  }

  // ---- long-lived sessions: framing-preserving payload fuzz + sentinels ---

  test("MySQL payload fuzz on live connections: 4000 mutated statements, sentinel-checked") {
    // Framing stays valid (whole packets, correct lengths); the PAYLOAD is
    // mutated COM_QUERY text/binary garbage. The server must answer every
    // one (OK/ERR/resultset — never silence, never a torn frame) and the
    // interleaved sentinels must keep returning exact values: one byte of
    // desync and the sentinel decode breaks.
    val rng = new scala.util.Random(seed ^ 0x5EED5L)
    val bases = Seq(
      "SELECT sum(number) AS s FROM numbers(100)",
      "SELECT l_returnflag FROM lineitem LIMIT 3",
      "SET max_threads = 4",
      "SELECT sumIf(x, x > 1) FROM (SELECT 2 AS x)",
      "USE default", "SHOW TABLES", "DESCRIBE system.one")
    var c = new WireClients.MySql(mysqlPort)
    var reconnects = 0
    try {
      (1 to 4000).foreach { i =>
        val base = Array(0x03.toByte) ++ bases(rng.nextInt(bases.size)).getBytes(UTF_8)
        val fuzzed = mutate(rng, base.drop(1))
        // keep it a COM_QUERY (other command bytes are the one-shot suite's
        // job; here the point is parser/rewriter robustness + stream sync)
        val r =
          try c.query(new String(fuzzed, UTF_8))
          catch {
            case _: EOFException | _: java.net.SocketException =>
              // a mutated statement may legitimately contain COM_QUIT-like
              // bytes only via text — the server must NOT close on text; a
              // close here is a finding unless the payload decoded to KILL
              fail(s"statement $i: server closed a live connection on a text query")
          }
        // either outcome is fine; silence/desync is not — the NEXT sentinel
        // would catch it, run one every 8 statements
        if (i % 8 == 0) {
          val want = (i * 31 + 7).toString
          c.query(s"SELECT ${i * 31 + 7} AS sentinel") match {
            case Right((cols, rows))
              if cols == Seq("sentinel") && rows == Seq(Seq(want)) => ()
            case other => fail(s"sentinel after statement $i diverged: $other")
          }
        }
        r: Unit
      }
      assert(c.ping())
    } finally c.close()
    assert(reconnects == 0)
  }

  test("ClickHouse query-text fuzz on live connections: 4000 mutated statements, sentinel-checked") {
    // Valid Query packet encoding carrying mutated SQL text — the dialect
    // rewriter and parser face arbitrary bytes; the connection must stay in
    // sync (the client's own decoder validates every response packet).
    val rng = new scala.util.Random(seed ^ 0xFACADEL)
    val bases = Seq(
      "SELECT sum(number) AS s FROM numbers(100)",
      "SELECT count() FROM system.one",
      "SET max_threads = 4",
      "SELECT substring('abcdef' FOR 3)",
      "SELECT uniq(number) FROM numbers(10)")
    val c = new WireClients.Ch(chPort)
    try {
      (1 to 4000).foreach { i =>
        val sqlBytes = mutate(rng, bases(rng.nextInt(bases.size)).getBytes(UTF_8))
        val r = c.query(new String(sqlBytes, UTF_8))
        if (i % 8 == 0) {
          val want = (i * 17 + 3).toString
          c.query(s"SELECT ${i * 17 + 3} AS sentinel") match {
            case Right((names, _, rows))
              if names == Seq("sentinel") && rows == Seq(Seq(want)) => ()
            case other => fail(s"sentinel after statement $i diverged: $other")
          }
        }
        r: Unit
      }
      assert(c.ping())
    } finally c.close()
  }

  test("compressed-frame decoder fuzz: 4000 mutated frames — typed errors only, bounded allocation") {
    // Drive ChCompressed.FrameInputStream directly with corrupted frames.
    // Contract: every mutation either decodes to the original bytes (the
    // mutation missed all load-bearing bits — impossible past the checksum
    // unless it was the identity) or throws IOException/EOFException.
    // Anything else — OutOfMemoryError from a forged multi-GiB length,
    // NegativeArraySizeException, an infinite refill loop, or silently
    // WRONG bytes surviving a corrupted frame — fails the suite.
    import graft.server.ChCompressed
    val rng = new scala.util.Random(seed ^ 0xC0FFEEL)
    (1 to 4000).foreach { i =>
      val n = 1 + rng.nextInt(5000)
      val data = Array.fill(n)(rng.nextInt().toByte)
      val bos = new java.io.ByteArrayOutputStream()
      ChCompressed.writeFrames(bos, data,
        if (rng.nextBoolean()) ChCompressed.MethodLZ4 else ChCompressed.MethodZSTD)
      val frames = mutate(rng, bos.toByteArray)
      val in = new ChCompressed.FrameInputStream(
        new java.io.ByteArrayInputStream(frames))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var r = in.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        val got = out.toByteArray
        // a clean decode must be a FRAME-GRANULAR PREFIX of the original
        // payload: the identity mutation gives all of it, a truncation at
        // a frame boundary gives the frames before the cut (clean EOF is
        // legal between frames), and nothing else can survive the
        // CityHash128 check — non-prefix bytes surviving is a decoder bug
        assert(got.length <= data.length &&
          java.util.Arrays.equals(got, data.take(got.length)),
          s"frame $i: corrupted stream decoded cleanly to non-prefix bytes")
      } catch {
        case _: java.io.IOException => () // includes EOFException: typed rejection
      }
    }
  }

  test("fuzz aftermath: no connection-thread leak, servers still serve") {
    // All fuzz connections above are closed; give their server threads a
    // beat to unwind, then count what's left. A reader thread stuck on a
    // dead socket would accumulate by the thousand in the tests above.
    val deadline = System.nanoTime() + 30e9.toLong
    def liveConnThreads(): Int = {
      val all = new Array[Thread](Thread.activeCount() * 2 + 16)
      val n = Thread.enumerate(all)
      all.take(n).count(t => t != null && t.isAlive &&
        (t.getName.startsWith("graft-mysql-conn") ||
          t.getName.startsWith("graft-clickhouse-conn")))
    }
    while (liveConnThreads() > 8 && System.nanoTime() < deadline)
      Thread.sleep(200)
    assert(liveConnThreads() <= 8,
      s"leaked connection threads: ${liveConnThreads()}")
    val m = new WireClients.MySql(mysqlPort)
    try assert(m.query("SELECT 1 AS v").exists(_._2.head.head == "1"))
    finally m.close()
    val h = new WireClients.Ch(chPort)
    try assert(h.query("SELECT 1 AS v").exists(_._3.head.head == "1"))
    finally h.close()
  }
}

package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Wire-level helpers for the remote-table connector: the HTTP client the
  * scan planner and partition readers share, the schema-directed ndjson →
  * `InternalRow` decoder, and the `sources.Filter` → Spark-SQL-text
  * translator that carries predicate pushdown across the process boundary.
  *
  * The reference ships a serialized `ScanPlan` (projection + filters) to its
  * store service per partition read (`remote_table_do_read.rs:34-44`
  * builds a `ReadAction{part, push_down}`); here the push-down travels as
  * Spark SQL text because the remote side IS another Spark-backed graft
  * server — it re-parses with `expr(...)` and Catalyst pushes the predicate
  * into the remote parquet scan (footer stats + row-group skipping), so
  * wire bytes scale with the SELECTED data, not the table.
  *
  * Row encoding: one JSON object per line, produced by the server with
  * `to_json` under pinned UTC timestamp/date formats. JSON was chosen over
  * a binary block format deliberately: the codec is schema-directed on both
  * ends (lossless for every type the gate uses — see `decoder`), the stream
  * is gzip'd (the dominant cost at scale is the parquet scan, not ndjson
  * framing), and it keeps the wire debuggable with curl. `to_json` omits
  * null fields (ignoreNullFields) — a missing key decodes to null.
  */
object RemoteWire {

  /** Default double parsing on purpose: tree-level BigDecimal parsing
    * (USE_BIG_DECIMAL_FOR_FLOATS) would normalize `-0.0` away (BigDecimal
    * has no negative zero), while Double.parseDouble round-trips every
    * double exactly. Decimals would be rounded by the double detour, so the
    * wire carries DECIMAL columns as JSON STRINGS (the server casts them —
    * see HttpApiServer.remoteRead) and the decimal decoder parses the text
    * exactly. */
  private val mapper: ObjectMapper = new ObjectMapper()

  def parseLine(line: String): JsonNode = mapper.readTree(line)

  // ---- HTTP ---------------------------------------------------------------

  def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  /** GET `url` and return the whole body (planning-time calls: schema,
    * splits). Non-200 → IllegalStateException with the server's error body. */
  def getBody(url: String): String = {
    val conn = open(url)
    try {
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else decoded(conn)
      val body =
        if (is == null) "" else new String(is.readAllBytes(), UTF_8)
      if (code != 200)
        throw new IllegalStateException(s"remote table server: HTTP $code $body")
      body
    } finally conn.disconnect()
  }

  /** Open a streaming GET: returns the connection and a line reader over the
    * (possibly gzip'd) body. Caller owns both. */
  def openLines(url: String): (HttpURLConnection, BufferedReader) = {
    val conn = open(url)
    val code = conn.getResponseCode
    if (code != 200) {
      val err = Option(conn.getErrorStream)
        .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
      conn.disconnect()
      throw new IllegalStateException(s"remote table server: HTTP $code $err")
    }
    (conn, new BufferedReader(new InputStreamReader(decoded(conn), UTF_8), 1 << 16))
  }

  private def open(url: String): HttpURLConnection = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestProperty("Accept-Encoding", "gzip")
    // no keep-alive reuse: a pooled connection the server's idle reaper
    // already closed hangs a non-retryable request until the read timeout
    // (observed: a chunked append POST stuck 600 s on a stale socket);
    // one fresh connection per split/part is the protocol's natural grain
    conn.setRequestProperty("Connection", "close")
    conn.setConnectTimeout(30000)
    // generous read timeout: the server runs a real scan job per split
    conn.setReadTimeout(600000)
    conn
  }

  private def decoded(conn: HttpURLConnection): java.io.InputStream = {
    val raw = conn.getInputStream
    if ("gzip".equalsIgnoreCase(conn.getContentEncoding)) new GZIPInputStream(raw)
    else raw
  }

  // ---- schema support gate ------------------------------------------------

  /** Types the wire codec round-trips losslessly. Anything else is rejected
    * at table-definition time with a named error, never silently mangled. */
  def assertSupported(schema: StructType): Unit = {
    def chk(dt: DataType, path: String): Unit = dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | StringType | BinaryType | DateType |
          TimestampType | TimestampNTZType => ()
      // decimals ride the wire as strings, which the server can only cast
      // at top level — nested decimals are refused, not silently rounded
      case _: DecimalType if path.indexOf('.') < 0 && !path.endsWith("[]") => ()
      case ArrayType(et, _) => chk(et, s"$path[]")
      case st: StructType =>
        st.fields.foreach(f => chk(f.dataType, s"$path.${f.name}"))
      case other =>
        throw new UnsupportedOperationException(
          s"graft-remote: unsupported column type $other at '$path'")
    }
    schema.fields.foreach(f => chk(f.dataType, f.name))
  }

  // ---- ndjson → InternalRow ----------------------------------------------

  /** Build a reusable decoder for one pruned schema. Timestamp text is what
    * the server's pinned formats emit (see `HttpApiServer.remoteJsonOpts`):
    * LTZ as ISO-offset instants, NTZ as local date-times, dates as
    * `yyyy-MM-dd`. */
  def decoder(schema: StructType): JsonNode => InternalRow = {
    val fields = schema.fields.map(f => (f.name, valueDecoder(f.dataType)))
    node => {
      val row = new GenericInternalRow(fields.length)
      var i = 0
      while (i < fields.length) {
        val child = node.get(fields(i)._1)
        row.update(i, if (child == null || child.isNull) null else fields(i)._2(child))
        i += 1
      }
      row
    }
  }

  private def valueDecoder(dt: DataType): JsonNode => Any = dt match {
    case BooleanType => _.asBoolean()
    case ByteType => n => n.asInt().toByte
    case ShortType => n => n.asInt().toShort
    case IntegerType => _.asInt()
    case LongType => _.asLong()
    case FloatType => n => fpDouble(n).toFloat
    case DoubleType => n => fpDouble(n)
    case d: DecimalType =>
      n => Decimal(new java.math.BigDecimal(n.asText()), d.precision, d.scale)
    case StringType => n => UTF8String.fromString(n.asText())
    case BinaryType => n => java.util.Base64.getDecoder.decode(n.asText())
    case DateType =>
      n => java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
    case TimestampType =>
      n => {
        val inst = java.time.OffsetDateTime.parse(n.asText()).toInstant
        inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      }
    case TimestampNTZType =>
      n => {
        val ldt = java.time.LocalDateTime.parse(n.asText())
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      }
    case ArrayType(et, _) =>
      val elem = valueDecoder(et)
      n => {
        val out = new Array[Any](n.size())
        var i = 0
        while (i < out.length) {
          val c = n.get(i)
          out(i) = if (c == null || c.isNull) null else elem(c)
          i += 1
        }
        new GenericArrayData(out)
      }
    case st: StructType =>
      val dec = decoder(st)
      n => dec(n)
    case other =>
      throw new UnsupportedOperationException(s"graft-remote: cannot decode $other")
  }

  /** Jackson quotes non-numeric doubles by default ("NaN", "Infinity"). */
  private def fpDouble(n: JsonNode): Double =
    if (n.isTextual) java.lang.Double.parseDouble(n.asText()) else n.asDouble()

  // ---- InternalRow → ndjson (the append path's wire encoder) -------------

  /** Inverse of [[decoder]] under the same pinned formats: null fields are
    * omitted, decimals travel as strings, temporals as ISO text, binary as
    * base64 — one JSON object per row. */
  def encoder(schema: StructType): InternalRow => String = {
    val nf = mapper.getNodeFactory
    val enc = schema.fields.map(f => (f.name, f.dataType, valueEncoder(f.dataType)))
    row => {
      val obj = nf.objectNode()
      var i = 0
      while (i < enc.length) {
        if (!row.isNullAt(i)) obj.set[JsonNode](enc(i)._1, enc(i)._3(row, i)): Unit
        i += 1
      }
      mapper.writeValueAsString(obj)
    }
  }

  private type Getters = org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  private def valueEncoder(dt: DataType): (Getters, Int) => JsonNode = {
    val nf = mapper.getNodeFactory
    dt match {
      case BooleanType => (g, i) => nf.booleanNode(g.getBoolean(i))
      case ByteType => (g, i) => nf.numberNode(g.getByte(i).toInt)
      case ShortType => (g, i) => nf.numberNode(g.getShort(i).toInt)
      case IntegerType => (g, i) => nf.numberNode(g.getInt(i))
      case LongType => (g, i) => nf.numberNode(g.getLong(i))
      case FloatType => (g, i) => nf.numberNode(g.getFloat(i))
      case DoubleType => (g, i) => nf.numberNode(g.getDouble(i))
      case d: DecimalType =>
        (g, i) => nf.textNode(
          g.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
      case StringType => (g, i) => nf.textNode(g.getUTF8String(i).toString)
      case BinaryType =>
        (g, i) => nf.textNode(java.util.Base64.getEncoder.encodeToString(g.getBinary(i)))
      case DateType =>
        (g, i) => nf.textNode(java.time.LocalDate.ofEpochDay(g.getInt(i).toLong).toString)
      case TimestampType =>
        (g, i) => {
          val us = g.getLong(i)
          nf.textNode(java.time.OffsetDateTime.ofInstant(
            java.time.Instant.ofEpochSecond(
              Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L),
            java.time.ZoneOffset.UTC).toString)
        }
      case TimestampNTZType =>
        (g, i) => {
          val us = g.getLong(i)
          nf.textNode(java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC).toString)
        }
      case ArrayType(et, _) =>
        val elem = valueEncoder(et)
        (g, i) => {
          val arr = g.getArray(i)
          val node = nf.arrayNode(arr.numElements())
          var j = 0
          while (j < arr.numElements()) {
            node.add(if (arr.isNullAt(j)) nf.nullNode() else elem(arr, j)): Unit
            j += 1
          }
          node
        }
      case st: StructType =>
        val fields = st.fields.map(f => (f.name, valueEncoder(f.dataType)))
        (g, i) => {
          val nested = g.getStruct(i, fields.length)
          val node = nf.objectNode()
          var j = 0
          while (j < fields.length) {
            if (!nested.isNullAt(j)) node.set[JsonNode](fields(j)._1, fields(j)._2(nested, j)): Unit
            j += 1
          }
          node
        }
      case other =>
        throw new UnsupportedOperationException(s"graft-remote: cannot encode $other")
    }
  }

  // ---- POST helpers (append protocol) ------------------------------------

  /** Open a chunked-streaming POST whose body is a gzip stream the caller
    * writes ndjson lines into; finish with [[finishPost]]. */
  def openChunkedPost(url: String): (HttpURLConnection, java.io.OutputStream) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setChunkedStreamingMode(1 << 16)
    conn.setRequestProperty("Content-Encoding", "gzip")
    conn.setRequestProperty("Connection", "close") // see open(): no stale reuse
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(600000)
    (conn, new java.util.zip.GZIPOutputStream(
      new java.io.BufferedOutputStream(conn.getOutputStream, 1 << 16)))
  }

  /** Close the body stream and require a 200 from the server. */
  def finishPost(conn: HttpURLConnection, out: java.io.OutputStream): Unit =
    try {
      out.close()
      val code = conn.getResponseCode
      if (code != 200) {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
        throw new IllegalStateException(s"remote table server: HTTP $code $err")
      }
    } finally conn.disconnect()

  /** Bodyless POST (commit/abort), expect 200. */
  def post(url: String): Unit = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Connection", "close") // see open(): no stale reuse
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(600000)
    try {
      val code = conn.getResponseCode
      if (code != 200) {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
        throw new IllegalStateException(s"remote table server: HTTP $code $err")
      }
    } finally conn.disconnect()
  }

  // ---- Filter → Spark SQL text -------------------------------------------

  /** Translate one V1 filter to Spark SQL text, or None if it cannot be
    * carried exactly — untranslated filters stay on the client side as
    * post-scan residuals, so refusal costs bandwidth, never correctness.
    * The remote dialect is Spark SQL (the server filters with `expr`), so
    * Spark-only spellings like `<=>` are fair game. */
  def filterToSql(f: Filter): Option[String] = f match {
    case EqualTo(a, v) => bin(a, "=", v)
    case EqualNullSafe(a, v) => bin(a, "<=>", v)
    case GreaterThan(a, v) => bin(a, ">", v)
    case GreaterThanOrEqual(a, v) => bin(a, ">=", v)
    case LessThan(a, v) => bin(a, "<", v)
    case LessThanOrEqual(a, v) => bin(a, "<=", v)
    case IsNull(a) => attr(a).map(c => s"($c IS NULL)")
    case IsNotNull(a) => attr(a).map(c => s"($c IS NOT NULL)")
    case In(a, vs) if vs.isEmpty =>
      // Spark evaluates `x IN ()` as false (null for null x); either value
      // fails the filter, so a constant false is exact here
      attr(a).map(_ => "(1 = 0)")
    case In(a, vs) =>
      for {
        c <- attr(a)
        ls <- traverse(vs.toIndexedSeq.map(lit))
      } yield s"($c IN (${ls.mkString(", ")}))"
    case StringStartsWith(a, v) =>
      for { c <- attr(a); l <- lit(v) } yield s"startswith($c, $l)"
    case StringEndsWith(a, v) =>
      for { c <- attr(a); l <- lit(v) } yield s"endswith($c, $l)"
    case StringContains(a, v) =>
      for { c <- attr(a); l <- lit(v) } yield s"contains($c, $l)"
    case And(l, r) =>
      for { a <- filterToSql(l); b <- filterToSql(r) } yield s"($a AND $b)"
    case Or(l, r) =>
      for { a <- filterToSql(l); b <- filterToSql(r) } yield s"($a OR $b)"
    case Not(c) => filterToSql(c).map(s => s"(NOT $s)")
    case AlwaysTrue() => Some("true")
    case AlwaysFalse() => Some("false")
    case _ => None
  }

  private def bin(a: String, op: String, v: Any): Option[String] =
    for { c <- attr(a); l <- lit(v) } yield s"($c $op $l)"

  /** Nested-field references arrive dotted ("a.b") — refusing them keeps the
    * backtick quoting unambiguous. */
  private def attr(a: String): Option[String] =
    if (a.contains('.') || a.contains('`')) None else Some(s"`$a`")

  private def traverse(xs: Seq[Option[String]]): Option[Seq[String]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** SQL literal text under Spark's default (backslash-escaping) parser. */
  private def lit(v: Any): Option[String] = v match {
    case null => Some("NULL")
    case s: String =>
      Some("'" + s.flatMap {
        case '\\' => "\\\\"
        case '\'' => "\\'"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\u0000' => "\\0"
        case c => c.toString
      } + "'")
    case b: java.lang.Boolean => Some(b.toString)
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long) => Some(n.toString + "L")
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some(s"CAST('$d' AS DOUBLE)")
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None else Some(s"CAST('$f' AS FLOAT)")
    case bd: java.math.BigDecimal => Some(bd.toPlainString + "BD")
    case bd: scala.math.BigDecimal => Some(bd.underlying.toPlainString + "BD")
    case d: java.sql.Date => Some(s"DATE'$d'")
    case d: java.time.LocalDate => Some(s"DATE'$d'")
    case t: java.sql.Timestamp =>
      Some(s"TIMESTAMP'${t.toInstant}'")
    case i: java.time.Instant => Some(s"TIMESTAMP'$i'")
    case ldt: java.time.LocalDateTime => Some(s"TIMESTAMP_NTZ'$ldt'")
    case _ => None // arrays, binary, exotic temporals: leave as residual
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar hash expressions (SURVEY.md §2.8):
  *
  *   - `sipHash64` reproduces the reference's siphash function BIT-FOR-BIT
  *     (common/functions/src/scalars/hashes/siphash.rs): the hasher there is
  *     Rust's `DefaultHasher`, i.e. **SipHash-1-3** with a zero key, fed
  *     through Rust's `Hash` protocol (vec_hash.rs:37-91 — strings hash
  *     their UTF-8 bytes plus a 0xFF terminator, integers their little-endian
  *     native-width bytes, floats their IEEE bit patterns). Verified against
  *     the reference's golden outputs
  *     (tests/suites/0_stateless/02_0009_function_siphash64.result).
  *     A native Catalyst Expression with codegen — not a Scala UDF — so it
  *     stays inside whole-stage codegen like the reference's vectorized
  *     kernel.
  *   - `simHash64` is the 64-bit SimHash document sketch used for near-dup
  *     detection: per-token 64-bit hashes vote each bit up/down; the sign
  *     vector is the fingerprint. One pass over the string, no allocation of
  *     token arrays — far cheaper at 100 TB than a 64-way higher-order-
  *     function formulation.
  */
object HashExpressions {

  /** SipHash core, public-domain algorithm (Aumasson & Bernstein),
    * implemented from the paper's round description; compression/finalization
    * round counts are parameters so one core serves SipHash-2-4 (the paper
    * variant, used by our SimHash sketch) and SipHash-1-3 (Rust
    * `DefaultHasher`, used by the reference's siphash). */
  object SipHash {
    @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

    def hash(data: Array[Byte], k0: Long, k1: Long, c: Int, d: Int): Long = {
      var v0 = 0x736f6d6570736575L ^ k0
      var v1 = 0x646f72616e646f6dL ^ k1
      var v2 = 0x6c7967656e657261L ^ k0
      var v3 = 0x7465646279746573L ^ k1

      @inline def sipround(): Unit = {
        v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
        v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
        v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
        v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
      }
      @inline def rounds(n: Int): Unit = { var r = 0; while (r < n) { sipround(); r += 1 } }

      val n = data.length
      val end = n - (n % 8)
      var i = 0
      while (i < end) {
        var m = 0L
        var j = 7
        while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
        v3 ^= m; rounds(c); v0 ^= m
        i += 8
      }
      var b = (n & 0xffL) << 56
      var j = n - end - 1
      while (j >= 0) { b |= (data(end + j) & 0xffL) << (8 * j); j -= 1 }
      v3 ^= b; rounds(c); v0 ^= b
      v2 ^= 0xff
      rounds(d)
      v0 ^ v1 ^ v2 ^ v3
    }
  }

  /** SipHash-2-4, zero key by default (paper variant — our SimHash basis). */
  object SipHash24 {
    def hash(data: Array[Byte], k0: Long = 0L, k1: Long = 0L): Long =
      SipHash.hash(data, k0, k1, 2, 4)
  }

  /** Rust `DefaultHasher` semantics: SipHash-1-3, zero key, Rust `Hash`
    * protocol encodings. These are the reference's `siphash`/`siphash64`. */
  object SipHash13 {
    def hashBytes(data: Array[Byte]): Long = SipHash.hash(data, 0L, 0L, 1, 3)

    /** Rust `str::hash`: the UTF-8 bytes followed by a 0xFF terminator. */
    def hashStr(s: UTF8String): Long = {
      val b = s.getBytes
      val buf = java.util.Arrays.copyOf(b, b.length + 1)
      buf(b.length) = 0xff.toByte
      hashBytes(buf)
    }

    /** Rust integer/float-bits hash: `width` little-endian bytes of `v`. */
    def hashLongW(v: Long, width: Int): Long = {
      val buf = new Array[Byte](width)
      var i = 0
      while (i < width) { buf(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      hashBytes(buf)
    }
  }

  /** Reference `siphash(x)` — type-directed encoding like the reference's
    * per-array `vec_hash` impls. Integral LITERALS hash at their minimal
    * width, mirroring the reference planner typing SQL literals as the
    * smallest unsigned int (`SIPHASH(1)` hashes one byte there). */
  case class SipHash64(child: Expression) extends UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.Literal

    override def dataType: DataType = LongType
    override def prettyName: String = "siphash64"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType | BinaryType | BooleanType | ByteType | ShortType |
             IntegerType | LongType | FloatType | DoubleType | DateType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        // Spark types the literal 1.2 as decimal(2,1); the reference planner
        // types it Float64 — hash the double value for golden parity
        case _: DecimalType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"siphash does not support $t")
      }

    /** Byte width for fixed-width inputs; integral literals take the minimal
      * width that represents the value (plan_parser literal typing). */
    private lazy val width: Int = child match {
      case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
        val x = v.toString.toLong
        if (x >= -128 && x <= 255) 1
        else if (x >= -32768 && x <= 65535) 2
        else if (x >= Int.MinValue && x <= 4294967295L) 4
        else 8
      case _ => child.dataType match {
        case BooleanType | ByteType => 1
        case ShortType => 2
        case IntegerType | FloatType | DateType => 4
        case _ => 8
      }
    }

    override protected def nullSafeEval(input: Any): Any = child.dataType match {
      case StringType => SipHash13.hashStr(input.asInstanceOf[UTF8String])
      case BinaryType => SipHash13.hashBytes(input.asInstanceOf[Array[Byte]])
      case BooleanType => SipHash13.hashLongW(if (input.asInstanceOf[Boolean]) 1L else 0L, 1)
      case FloatType => SipHash13.hashLongW(
        java.lang.Float.floatToIntBits(input.asInstanceOf[Float]) & 0xffffffffL, 4)
      case DoubleType => SipHash13.hashLongW(
        java.lang.Double.doubleToLongBits(input.asInstanceOf[Double]), 8)
      case _: DecimalType => SipHash13.hashLongW(
        java.lang.Double.doubleToLongBits(
          input.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble), 8)
      case _ => SipHash13.hashLongW(input.asInstanceOf[Number].longValue(), width)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val o = "graft.functions.HashExpressions$SipHash13$.MODULE$"
      defineCodeGen(ctx, ev, c => child.dataType match {
        case StringType => s"$o.hashStr($c)"
        case BinaryType => s"$o.hashBytes($c)"
        case BooleanType => s"$o.hashLongW($c ? 1L : 0L, 1)"
        case FloatType => s"$o.hashLongW(Float.floatToIntBits($c) & 0xffffffffL, 4)"
        case DoubleType => s"$o.hashLongW(Double.doubleToLongBits($c), 8)"
        case _: DecimalType => s"$o.hashLongW(Double.doubleToLongBits($c.toDouble()), 8)"
        case _ => s"$o.hashLongW((long) $c, $width)"
      })
    }
    override protected def withNewChildInternal(newChild: Expression): SipHash64 = copy(newChild)
  }

  /** 64-bit SimHash over whitespace tokens: each token's SipHash votes every
    * bit +1/-1; fingerprint bit b is set iff the vote is positive. */
  object SimHash {
    def simhash(s: UTF8String): Long = {
      val str = s.toString
      val counts = new Array[Int](64)
      var start = 0
      val len = str.length
      var i = 0
      while (i <= len) {
        if (i == len || Character.isWhitespace(str.charAt(i))) {
          if (i > start) {
            val h = SipHash24.hash(str.substring(start, i).getBytes("UTF-8"))
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
              b += 1
            }
          }
          start = i + 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override protected def nullSafeEval(input: Any): Any =
      SimHash.simhash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions$$SimHash$$.MODULE$$.simhash($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
  }

  /** Oracle-expressible 60-bit SimHash (q102; see
    * [[graft.ext.Dedup.simhash60Md5]]): per-token hash = the first 15 hex
    * nibbles of md5(token) as one 60-bit integer, per-bit ±1 votes, sign
    * rule `votes > 0`. Tokenization mirrors `split(trim(text), "\\s+")`
    * EXACTLY (trim strips ASCII spaces only; Java regex split with
    * limit -1 keeps trailing empty tokens) — the Column-HOF spelling, the
    * DuckDB restatement and this kernel must stay three spellings of one
    * function. One compiled pass per row, md5 once per token via a
    * thread-local digest; the HOF spelling (interpreted, 33 single-char
    * strings per token) measured 16 s at sf0.1 — this kernel exists so the
    * oracle twin is also a production-shape operator. */
  object SimHash60Md5 {
    private val WS = java.util.regex.Pattern.compile("\\s+")
    private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** First 60 bits of md5(token): bytes 0..6 big-endian, then the high
      * nibble of byte 7 — identical to folding the first 15 lowercase-hex
      * chars base-16. */
    def tokenHash(md: java.security.MessageDigest, token: String): Long = {
      md.reset()
      val d = md.digest(token.getBytes("UTF-8"))
      var g = 0L
      var i = 0
      while (i < 7) { g = (g << 8) | (d(i) & 0xffL); i += 1 }
      (g << 4) | ((d(7) >> 4) & 0xfL)
    }

    def simhash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
      val str = s.toString
      // trim = ASCII space only (Spark/DuckDB `trim` semantics, NOT
      // Java String.trim which also strips control chars)
      var a = 0
      var b = str.length
      while (a < b && str.charAt(a) == ' ') a += 1
      while (b > a && str.charAt(b - 1) == ' ') b -= 1
      val toks = WS.split(str.substring(a, b), -1)
      val md = mdLocal.get()
      val counts = new Array[Int](60)
      var i = 0
      while (i < toks.length) {
        val g = tokenHash(md, toks(i))
        var bit = 0
        while (bit < 60) {
          if (((g >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
        i += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 60) { if (counts(bit) > 0) out |= 1L << bit; bit += 1 }
      out
    }
  }

  case class SimHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash60md5"
    override protected def nullSafeEval(input: Any): Any =
      SimHash60Md5.simhash60(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions$$SimHash60Md5$$.MODULE$$.simhash60($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60 = copy(newChild)
  }

  /** Hashing-trick linear text classifier margin (the fastText serving
    * shape): unigram + adjacent-bigram features hash into `buckets` slots
    * (no vocabulary table — constant memory at any corpus size, the scale
    * property that makes feature hashing standard), each slot carries an
    * integer weight from the public formula
    * `w(k) = (k · 2654435761) mod 8191 − 4095`, and the margin is the sum.
    * Token hash = the md5 60-bit fold ([[SimHash60Md5.tokenHash]]), so the
    * whole score is exact cross-engine integer arithmetic — q116's DuckDB
    * oracle restates it verbatim. In production the formula weights are
    * replaced by a trained weight array riding along as a literal; the
    * operator shape (one pass, no shuffle, scan-speed) is identical.
    */
  object LinearMargin {
    private val WS = java.util.regex.Pattern.compile("\\s+")
    private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    def weight(h: Long, buckets: Int): Long =
      ((h % buckets) * 2654435761L) % 8191L - 4095L

    def margin(s: UTF8String, buckets: Int): Long = {
      val str = s.toString
      var a = 0
      var b = str.length
      while (a < b && str.charAt(a) == ' ') a += 1
      while (b > a && str.charAt(b - 1) == ' ') b -= 1
      val toks = WS.split(str.substring(a, b), -1)
      val md = mdLocal.get()
      var m = 0L
      var i = 0
      while (i < toks.length) {
        m += weight(SimHash60Md5.tokenHash(md, toks(i)), buckets)
        if (i + 1 < toks.length)
          m += weight(SimHash60Md5.tokenHash(md, toks(i) + " " + toks(i + 1)), buckets)
        i += 1
      }
      m
    }
  }

  case class LinearMarginExpr(child: Expression, buckets: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hashed_margin"
    override protected def nullSafeEval(input: Any): Any =
      LinearMargin.margin(input.asInstanceOf[UTF8String], buckets)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions$$LinearMargin$$.MODULE$$.margin($c, $buckets)")
    override protected def withNewChildInternal(newChild: Expression): LinearMarginExpr =
      copy(child = newChild)
  }

  /** One-pass k=32 MinHash over an array of shingles.
    *
    * Semantics match the higher-order-function spelling in [[graft.ext.Dedup]]
    * (per shingle: `pmod(murmur3(s, seed=42), P)`, then slot i keeps
    * `min(pmod(a_i*h + b_i, P))`), but evaluated as ONE loop over the array
    * with per-element hash computed ONCE. The HOF version duplicates the
    * hash-array subtree into all 32 `array_min(transform(...))` branches
    * (HOFs are interpreted — no common-subexpression elimination), which is
    * 32× the hashing plus 33 intermediate arrays per row. At 100 TB the
    * signature pass must run at scan speed; this does.
    */
  object MinHash {
    val K = 32
    val P = 2147483647L // 2^31 - 1 (Mersenne)
    private val rnd = new scala.util.Random(42)
    val permA: Array[Long] = Array.fill(K)(1L + 2L * rnd.nextInt((P / 2 - 1).toInt))
    val permB: Array[Long] = Array.fill(K)(rnd.nextInt(P.toInt).toLong)

    /** null for an empty shingle set (no signature — the doc simply never
      * lands in a bucket), mirroring `array_min([]) = NULL` upstream. */
    def sig(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      if (n == 0) return null
      val mins = Array.fill(K)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        val raw = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        val h = ((raw.toLong % P) + P) % P
        var k = 0
        while (k < K) {
          val v = (permA(k) * h + permB(k)) % P // a*h+b < 2^61: no overflow
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    }
  }

  case class MinHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash32"
    override protected def nullSafeEval(input: Any): Any =
      MinHash.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = ctx.freshName("mhres")
      nullSafeCodeGen(ctx, ev, c => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $res =
        |  graft.functions.HashExpressions$$MinHash$$.MODULE$$.sig($c);
        |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHash32 = copy(newChild)
  }

  /** Deterministic, ORACLE-RESTATABLE k=32 MinHash over an array of
    * shingles — the md5 twin of [[MinHash]], the same relationship
    * [[SimHash60Md5]] has to [[SimHash64]] and the deterministic planes
    * have to the seeded hyperplanes: per shingle the hash is the 60-bit
    * md5-nibble fold ([[SimHash60Md5.tokenHash]] — cross-engine by md5
    * string equality) reduced mod P = 2³¹−1, and slot k keeps
    * `min((a_k·h + b_k) % P)` with PUBLIC-FORMULA permutation constants
    * `a_k = ((2k+1)·2654435761) % P`, `b_k = ((k+1)·2246822519) % P`
    * (Knuth / xxhash mixing primes — a DuckDB oracle computes the same
    * constants from the same literals). Every downstream step (banding,
    * candidate join, exact verify) is therefore restatable bit-for-bit at
    * ANY corpus — which is what removes the q46 gray-zone coin flip the
    * round-10 organic sf1 draw exposed (a J = 0.214 organic pair with 47%
    * all-bands miss odds under an exact-answer oracle). a_k·h < 2³¹·2³¹:
    * no overflow. NULL for an empty shingle set, like [[MinHash]]. */
  object MinHashMd5 {
    val K = 32
    val P = 2147483647L // 2^31 - 1 (Mersenne)
    val permA: Array[Long] = Array.tabulate(K)(k => ((2L * k + 1L) * 2654435761L) % P)
    val permB: Array[Long] = Array.tabulate(K)(k => ((k + 1L) * 2246822519L) % P)
    private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    def sig(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      if (n == 0) return null
      val md = mdLocal.get()
      val mins = Array.fill(K)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = SimHash60Md5.tokenHash(md, arr.getUTF8String(i).toString) % P
        var k = 0
        while (k < K) {
          val v = (permA(k) * h + permB(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    }
  }

  case class MinHash32Md5(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash32_md5"
    override protected def nullSafeEval(input: Any): Any =
      MinHashMd5.sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = ctx.freshName("mhdres")
      nullSafeCodeGen(ctx, ev, c => s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $res =
        |  graft.functions.HashExpressions$$MinHashMd5$$.MODULE$$.sig($c);
        |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHash32Md5 = copy(newChild)
  }

  /** `toTypeName(x)` (udfs/to_type_name.rs): the REFERENCE's name for the
    * argument's static type (SURVEY.md §1.2 mapping, reversed). Foldable —
    * the name is a plan-time constant. */
  case class TypeName(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def foldable: Boolean = true

    private def name(dt: DataType): String = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "Utf8"
      case BooleanType => "Boolean"
      case BinaryType => "Binary"
      case DateType => "Date32"
      case _: TimestampType => "Timestamp"
      case NullType => "Null"
      case _: DecimalType => "Float64" // reference literals: 1.2 is Float64
      case other => other.sql
    }

    // foldable → ConstantFolding replaces it with a string literal at plan
    // time (exactly the reference's constant-folding optimizer does for
    // totypename — optimizer_constant_folding.rs); codegen never sees it
    override def eval(input: InternalRow): Any = UTF8String.fromString(name(child.dataType))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, _ => s"""UTF8String.fromString("${name(child.dataType)}")""")
    override protected def withNewChildInternal(newChild: Expression): TypeName = copy(newChild)
  }

  // Column-level entry points (Spark 4's Column↔Expression bridge lives
  // behind private[sql]; see org.apache.spark.sql.graft.Bridge)
  import org.apache.spark.sql.graft.Bridge
  def siphash64(c: Column): Column = Bridge.column(SipHash64(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def simhash60md5(c: Column): Column = Bridge.column(SimHash60(Bridge.expression(c)))
  def minhash32(c: Column): Column = Bridge.column(MinHash32(Bridge.expression(c)))
  def minhash32md5(c: Column): Column = Bridge.column(MinHash32Md5(Bridge.expression(c)))
  def hashedMargin(c: Column, buckets: Int): Column =
    Bridge.column(LinearMarginExpr(Bridge.expression(c), buckets))
  def toTypeName(c: Column): Column = Bridge.column(TypeName(Bridge.expression(c)))
}

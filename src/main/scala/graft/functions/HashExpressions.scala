package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar hash expressions (SURVEY.md §2.8):
  *
  *   - `sipHash64` reproduces the reference's SipHash-2-4 function
  *     (common/functions/src/scalars/hashes/siphash.rs) bit-for-bit with the
  *     all-zero 128-bit key (the Rust `DefaultHasher`-free direct siphasher
  *     default). A native Catalyst Expression with codegen — not a Scala UDF —
  *     so it stays inside whole-stage codegen like the reference's vectorized
  *     kernel.
  *   - `simHash64` is the 64-bit SimHash document sketch used for near-dup
  *     detection: per-token 64-bit hashes vote each bit up/down; the sign
  *     vector is the fingerprint. One pass over the string, no allocation of
  *     token arrays — far cheaper at 100 TB than a 64-way higher-order-
  *     function formulation.
  */
object HashExpressions {

  /** SipHash-2-4 core, public-domain algorithm (Aumasson & Bernstein),
    * implemented from the paper's round description. Key = (0, 0). */
  object SipHash24 {
    @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

    def hash(data: Array[Byte], k0: Long = 0L, k1: Long = 0L): Long = {
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

      val n = data.length
      val end = n - (n % 8)
      var i = 0
      while (i < end) {
        var m = 0L
        var j = 7
        while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
        v3 ^= m; sipround(); sipround(); v0 ^= m
        i += 8
      }
      var b = (n & 0xffL) << 56
      var j = n - end - 1
      while (j >= 0) { b |= (data(end + j) & 0xffL) << (8 * j); j -= 1 }
      v3 ^= b; sipround(); sipround(); v0 ^= b
      v2 ^= 0xff
      sipround(); sipround(); sipround(); sipround()
      v0 ^ v1 ^ v2 ^ v3
    }
  }

  case class SipHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "siphash64"
    override protected def nullSafeEval(input: Any): Any =
      SipHash24.hash(input.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions$$SipHash24$$.MODULE$$.hash($c.getBytes(), 0L, 0L)")
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

  // Column-level entry points (Spark 4's Column↔Expression bridge lives
  // behind private[sql]; see org.apache.spark.sql.graft.Bridge)
  import org.apache.spark.sql.graft.Bridge
  def siphash64(c: Column): Column = Bridge.column(SipHash64(Bridge.expression(c)))
  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
  def minhash32(c: Column): Column = Bridge.column(MinHash32(Bridge.expression(c)))
}

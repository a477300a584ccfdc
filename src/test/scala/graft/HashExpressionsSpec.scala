package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExpressions
import graft.functions.HashExpressions.{SipHash24, SimHash}
import org.apache.spark.unsafe.types.UTF8String

/** SipHash-2-4 against the published test vectors from the SipHash paper
  * (Aumasson & Bernstein, appendix A): key = 000102...0f, messages 00,01,02...
  * of increasing length. Guards bit-parity with the reference's siphash
  * (common/functions/src/scalars/hashes/siphash.rs). */
class HashExpressionsSpec extends AnyFunSuite {
  private val k0 = 0x0706050403020100L
  private val k1 = 0x0f0e0d0c0b0a0908L
  private def msg(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)

  test("siphash24 paper vectors") {
    assert(SipHash24.hash(msg(0), k0, k1) === 0x726fdb47dd0e0e31L)
    assert(SipHash24.hash(msg(1), k0, k1) === 0x74f839c593dc67fdL)
    assert(SipHash24.hash(msg(8), k0, k1) === 0x93f5f5799a932462L)
    assert(SipHash24.hash(msg(15), k0, k1) === 0xa129ca6149be45e5L)
  }

  test("siphash64 matches the reference's golden outputs bit-for-bit") {
    // tests/suites/0_stateless/02_0009_function_siphash64.result: the
    // reference hasher is Rust DefaultHasher = SipHash-1-3, zero key, Rust
    // Hash protocol (str = bytes+0xFF; literal 1 types as UInt8 → one byte;
    // 1.2 = f64 bit pattern).
    val spark = TestSpark.spark
    val g = new graft.sql.GraftSession(spark)
    def one(sql: String): Long = g.sql(sql).head().getLong(0)
    assert(one("SELECT SIPHASH('1234567890')") === 9027491583908826579L)
    assert(one("SELECT SIPHASH(1)") === 4952851536318644461L)
    assert(one("SELECT SIPHASH(1.2)") === 2854037594257667269L)
    assert(one("SELECT SIPHASH64('1234567890')") === 9027491583908826579L)
  }

  test("siphash64 column expr: codegen and interpreted paths agree") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.HashExpressions.SipHash13
    val df = Seq("", "a", "hello world", "graft").toDF("s")
      .select(col("s"), HashExpressions.siphash64(col("s")).as("h"))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, h) <- rows)
      assert(h === SipHash13.hashStr(UTF8String.fromString(s)), s"mismatch for '$s'")
  }

  test("simhash: identical docs equal, similar docs near, disjoint docs far") {
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val d1 = "the quick brown fox jumps over the lazy dog and runs far away"
    val d2 = "the quick brown fox jumps over the lazy cat and runs far away"
    val d3 = "entirely unrelated content about database query optimization engines"
    val h1 = SimHash.simhash(UTF8String.fromString(d1))
    val h2 = SimHash.simhash(UTF8String.fromString(d2))
    val h3 = SimHash.simhash(UTF8String.fromString(d3))
    assert(h1 === SimHash.simhash(UTF8String.fromString(d1)))
    assert(hd(h1, h2) < hd(h1, h3))
    assert(hd(h1, h2) <= 16)
  }
}

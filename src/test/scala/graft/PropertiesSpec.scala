package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExpressions.{MinHash, SipHash13}

/** ScalaCheck property tests (SURVEY.md §5 plan): algebraic invariants the
  * distributed formulations depend on — if agg-state merge isn't associative
  * or a signature isn't element-order-stable, partial/final aggregation over
  * arbitrary partitionings silently corrupts at scale. */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("siphash13: integer hashing equals hashing the little-endian bytes") {
    check(Prop.forAll { (v: Long) =>
      val bytes = Array.tabulate(8)(i => ((v >>> (8 * i)) & 0xff).toByte)
      SipHash13.hashLongW(v, 8) == SipHash13.hashBytes(bytes)
    })
  }

  test("siphash13: string hash = bytes+0xFF protocol (never equals raw bytes)") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val u = UTF8String.fromString(s)
      val withFf = u.getBytes :+ 0xff.toByte
      SipHash13.hashStr(u) == SipHash13.hashBytes(withFf)
    })
  }

  private def mhSig(xs: Seq[String]): Option[Seq[Long]] =
    Option(MinHash.sig(new GenericArrayData(xs.map(UTF8String.fromString).toArray)))
      .map(_.toLongArray().toSeq)

  test("minhash32: values bounded by P; permutation-of-input invariant") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr)) { xs =>
      val s = mhSig(xs).get
      s.forall(v => v >= 0 && v < MinHash.P) && mhSig(scala.util.Random.shuffle(xs)) == Some(s)
    })
  }

  test("minhash32: sig(A ++ B) = elementwise min(sig(A), sig(B)) — the merge law") {
    // this is exactly what makes the signature computable per-partition and
    // mergeable in a shuffle (two-phase aggregation soundness)
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr),
        Gen.nonEmptyListOf(Gen.alphaNumStr)) { (a, b) =>
      val merged = mhSig(a ++ b).get
      val law = mhSig(a).get.zip(mhSig(b).get).map { case (x, y) => math.min(x, y) }
      merged == law
    })
  }

  test("simhash: deterministic, whitespace-normalization-invariant, order-sensitive") {
    import graft.functions.HashExpressions.SimHash
    def h(s: String): Long = SimHash.simhash(UTF8String.fromString(s))
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.identifier)) { toks =>
      val doc = toks.mkString(" ")
      h(doc) == h(doc) &&                       // deterministic
        h(doc) == h(toks.mkString("  ")) &&     // run-of-whitespace invariant
        h(doc) == h(" " + doc + "\t")           // leading/trailing ws invariant
    })
  }

  test("uniq_exact aggregator: merge is associative and commutative") {
    import graft.functions.UniqExactAggregator._
    check(Prop.forAll { (a: List[Long], b: List[Long], c: List[Long]) =>
      val (sa, sb, sc) = (a.foldLeft(zero)(reduce), b.foldLeft(zero)(reduce), c.foldLeft(zero)(reduce))
      merge(merge(sa, sb), sc) == merge(sa, merge(sb, sc)) &&
        merge(sa, sb) == merge(sb, sa) &&
        finish(merge(merge(sa, sb), sc)) == (a ++ b ++ c).distinct.size.toLong
    })
  }

  test("dot-product expression equals the higher-order-function spelling") {
    val spark = TestSpark.spark
    import spark.implicits._
    // one DataFrame of seeded random vector pairs; codegen'd DotProduct vs
    // aggregate(zip_with(...)) must agree bit-for-bit (same eval order)
    val r = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(17)(r.nextFloat() * 2 - 1), Array.fill(17)(r.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      graft.ext.Vectors.dot(col("a"), col("b")).as("expr"),
      aggregate(zip_with(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    assert(df.filter(col("expr") =!= col("hof")).count() == 0)
  }

  test("dot-product yields NULL on mismatched vector lengths, not a truncated value") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),      // mismatch -> null
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)))            // match -> 11.0
      .toDF("a", "b")
      .select(graft.ext.Vectors.dot(col("a"), col("b")).as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, Some(11.0)))
  }

  test("limitBy: at most n rows per key, and exactly the first n by order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(7)
    val data = Seq.fill(500)((r.nextInt(20).toLong, r.nextInt(1000).toLong))
    val df = data.toDF("k", "v")
    val got = graft.ops.Relational.limitBy(df, 3, Seq(col("k")), Seq(col("v").asc, col("k").asc))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = data.groupBy(_._1).toSeq.flatMap { case (_, rows) => rows.sorted.take(3) }.toSet
    assert(got == want)
  }
}

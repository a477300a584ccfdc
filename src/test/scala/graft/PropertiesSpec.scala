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

  test("nearest-cell kernel equals the literal struct-min spelling, ties to lowest cell") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(23)
    val dim = 8
    val k = 64 // past the literal-path threshold
    val cents: Array[Seq[Long]] =
      Array.fill(k)(Seq.fill(dim)(r.nextLong() % 1000000L))
    // plant exact-tie rows: vectors equal to a centroid that appears twice
    val dup = cents(17)
    val centsWithDup = cents.updated(40, dup)
    val vecs = Seq.fill(300)(Array.fill(dim)(r.nextLong() % 1000000L)) ++
      Seq(dup.toArray, centsWithDup(40).toArray)
    val df = vecs.toDF("qv")
    val literal = array_min(array(centsWithDup.indices.map(i =>
      struct(aggregate(zip_with(col("qv"), typedlit(centsWithDup(i)),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"),
        lit(i.toLong).as("c"))): _*))
    val both = df.select(
      graft.functions.VectorExpressions.nearestCell(col("qv"), centsWithDup).as("kern"),
      literal.as("lit"))
    assert(both.filter(col("kern.d") =!= col("lit.d") ||
      col("kern.c") =!= col("lit.c")).count() == 0)
    // the planted duplicate-centroid vector must take the LOWER cell id
    val tie = df.select(graft.functions.VectorExpressions
        .nearestCell(typedlit(dup), centsWithDup).getField("c")).head().getLong(0)
    assert(tie == 17L, s"tie must go to the lowest cell, got $tie")
    // wrong-length vector -> NULL, not a plausible cell
    val bad = Seq(Array(1L, 2L)).toDF("qv")
      .select(graft.functions.VectorExpressions.nearestCell(col("qv"), centsWithDup))
    assert(bad.head().isNullAt(0))
    // NULL ELEMENT -> NULL too: the literal spelling propagates element
    // nulls to a null distance, so the kernel must as well — the k
    // threshold stays a pure performance switch, never a semantics switch
    val withNullElem = spark.sql(
      "SELECT array(1L, 2L, NULL, 4L, 5L, 6L, 7L, 8L) AS qv")
      .select(graft.functions.VectorExpressions.nearestCell(col("qv"), centsWithDup))
    assert(withNullElem.head().isNullAt(0))
  }

  test("pruned nearest-cell equals the flat kernel at large k (random, ties, clustered)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(57)
    val dim = 16
    val k = 700 // past the pruned-path threshold (256)
    // clustered centroid geometry (what Lloyd produces): centers + jitter,
    // plus exact duplicates to force cross-GROUP ties at the same distance
    val centers = Array.fill(20)(Array.fill(dim)(r.nextLong() % 500000L))
    val cents: Array[Seq[Long]] = Array.tabulate(k) { i =>
      val base = centers(i % 20)
      base.map(x => x + r.nextLong() % 2000L).toSeq
    }
    val withDup = cents.updated(650, cents(37)) // duplicate far apart in index
    val vecs = Seq.fill(400)(Array.fill(dim)(r.nextLong() % 500000L)) ++
      Seq(withDup(37).toArray, withDup(650).toArray) ++ // exact tie probes
      centers.map(_.clone).toSeq                        // on-center probes
    val df = vecs.toDF("qv")
    val both = df.select(
      graft.functions.VectorExpressions.nearestCell(col("qv"), withDup).as("flat"),
      graft.functions.VectorExpressions.nearestCellPruned(col("qv"), withDup).as("pruned"))
    val diff = both.filter(col("flat.d") =!= col("pruned.d") ||
      col("flat.c") =!= col("pruned.c"))
    assert(diff.count() == 0, diff.collect().take(3).mkString("\n"))
    // the duplicate-centroid probe must resolve to the LOWER index (37)
    val tie = df.limit(0).sparkSession.range(1).select(
      graft.functions.VectorExpressions
        .nearestCellPruned(typedlit(withDup(37)), withDup).getField("c"))
      .head().getLong(0)
    assert(tie == 37L, s"cross-group tie must take the lowest cell, got $tie")
    // NULL semantics parity
    val bad = Seq(Array(1L, 2L)).toDF("qv").select(
      graft.functions.VectorExpressions.nearestCellPruned(col("qv"), withDup))
    assert(bad.head().isNullAt(0))
  }

  test("nearest-in-flat: column-resident candidates match the literal kernel; strict NULLs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(91)
    val dim = 8
    val k = 12
    val cents: Array[Seq[Long]] =
      Array.fill(k)(Seq.fill(dim)(r.nextLong() % 100000L))
    val withDup = cents.updated(9, cents(3)) // duplicate → tie probe
    val flat = withDup.flatten.toSeq
    val vecs = Seq.fill(120)(Array.fill(dim)(r.nextLong() % 100000L)) :+
      withDup(3).toArray
    val df = vecs.toDF("qv").withColumn("flat", typedlit(flat))
    val both = df.select(
      graft.functions.VectorExpressions.nearestCell(col("qv"), withDup).as("lit"),
      graft.functions.VectorExpressions.nearestInFlat(col("qv"), col("flat")).as("fc"))
    assert(both.filter(col("lit.d") =!= col("fc.d") ||
      col("lit.c") =!= col("fc.c")).count() == 0)
    // the duplicate-candidate probe takes the LOWEST local index
    val tie = Seq(withDup(3).toArray).toDF("qv").withColumn("flat", typedlit(flat))
      .select(graft.functions.VectorExpressions
        .nearestInFlat(col("qv"), col("flat")).getField("c")).head().getLong(0)
    assert(tie == 3L, s"tie must take the lowest index, got $tie")
    // flat length not a multiple of the vector length → NULL (torn pack)
    val bad = Seq((Array(1L, 2L, 3L), Array(1L, 2L, 3L, 4L))).toDF("qv", "flat")
      .select(graft.functions.VectorExpressions.nearestInFlat(col("qv"), col("flat")))
    assert(bad.head().isNullAt(0))
    // NULL element anywhere → NULL
    val ne = spark.sql("SELECT array(1L, 2L) AS qv, array(1L, NULL, 3L, 4L) AS fl")
      .select(graft.functions.VectorExpressions.nearestInFlat(col("qv"), col("fl")))
    assert(ne.head().isNullAt(0))
    // empty vector → NULL, never a 0-distance cell
    val ev = spark.sql(
      "SELECT CAST(array() AS ARRAY<BIGINT>) AS qv, array(1L, 2L) AS fl")
      .select(graft.functions.VectorExpressions.nearestInFlat(col("qv"), col("fl")))
    assert(ev.head().isNullAt(0))
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

  test("morton interleave is a bijection on bits×bits rank pairs") {
    val spark = TestSpark.spark
    import spark.implicits._
    // decode the interleave on the driver and demand exact round-trip
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var (a, b) = (0L, 0L)
      (0 until bits).foreach { i =>
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val bits = 6
    val pairs = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.tables.Layout.morton(col("a"), col("b"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).distinct.length == pairs.length, "collision in morton codes")
    got.foreach { case (a, b, z) => assert(deinterleave(z, bits) == ((a, b))) }
  }

  test("search_sorted equals upper_bound, codegen and interpreted agree (ties, extremes)") {
    val spark = TestSpark.spark
    import spark.implicits._
    def upperBound(bounds: Array[Double], v: Double): Long = bounds.count(_ <= v).toLong
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 100.0)),
      Gen.listOfN(20, Gen.chooseNum(-120.0, 120.0))) { (bs, vs) =>
      val bounds = bs.sorted.toArray
      // include the boundary values themselves (tie cases) and ±∞-ish probes
      val probes = (vs ++ bounds.take(3) ++ Seq(-1e18, 1e18)).toArray
      val got = probes.toSeq.toDF("v")
        .select(graft.functions.SearchSorted.searchSorted(col("v"), bounds).as("r"))
        .as[Long].collect()
      got.sameElements(probes.map(upperBound(bounds, _)))
    }, n = 30)
    // interpreted path (no codegen) must agree bit-for-bit
    val bounds = Array(1.0, 2.0, 2.0, 5.0)
    val expr = graft.functions.SearchSorted(
      org.apache.spark.sql.catalyst.expressions.Literal(2.0), bounds)
    assert(expr.eval(null) == 3L) // ties: ALL boundaries <= v count (1.0, 2.0, 2.0)
    assert(graft.functions.SearchSorted(
      org.apache.spark.sql.catalyst.expressions.Literal(0.5), bounds).eval(null) == 0L)
    assert(graft.functions.SearchSorted(
      org.apache.spark.sql.catalyst.expressions.Literal(9.9), bounds).eval(null) == 4L)
  }

  test("sampleKey: stays in [0, buckets), deterministic, well spread") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keys = (0L until 10000L).toDF("id")
      .select(graft.ext.Curation.sampleKey(col("id")).as("k"))
      .as[Long].collect()
    assert(keys.forall(k => k >= 0 && k < 1000))
    // spread: every decile of the key space is hit roughly uniformly
    val byDecile = keys.groupBy(_ / 100).view.mapValues(_.length).toMap
    assert(byDecile.size == 10)
    byDecile.values.foreach(n => assert(n > 700 && n < 1300, byDecile.toString))
  }

  test("sequencePack: every doc assigned exactly once; packs fill contiguously") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(11)
    val docs = (0L until 300L).map(i => (i, Seq.fill(1 + r.nextInt(9))("w").mkString(" ")))
      .toDF("doc_id", "text").withColumn("lang", (col("doc_id") % 3).cast("string"))
    val out = graft.ext.Curation.sequencePack(docs, col("doc_id"), col("text"),
        col("lang"), capTokens = 16, shardSize = 50)
      .select("stratum", "shard", "pack_id", "doc_id", "n_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._4).sorted.toSeq == (0L until 300L), "each doc exactly once")
    // within each (stratum, shard): pack ids start at 0, are contiguous, and
    // match the running-offset formula
    out.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._4)
      var cum = 0L
      ordered.foreach { case (_, _, pack, _, nTok) =>
        assert(pack == cum / 16, s"pack mismatch at offset $cum")
        cum += nTok
      }
      val packs = ordered.map(_._3).distinct.sorted.toSeq
      assert(packs.head == 0L && packs == (packs.head to packs.last).toSeq)
    }
  }

  test("vec_sum aggregator: merge is associative, commutative, empty-neutral") {
    import graft.functions.VecSumAggregator
    val vec = Gen.listOfN(4, Gen.choose(-1000000L, 1000000L)).map(_.toSeq)
    val vecs = Gen.listOf(vec)
    def fold(xs: List[Seq[Long]]): Seq[Long] =
      VecSumAggregator.finish(
        xs.foldLeft(VecSumAggregator.zero)(VecSumAggregator.reduce))
    check(Prop.forAll(vecs, vecs) { (a, b) =>
      // split-then-merge equals one-pass fold, in either merge order
      val ab = fold(a ++ b)
      val m1 = VecSumAggregator.finish(VecSumAggregator.merge(
        fold(a).toArray, fold(b).toArray))
      val m2 = VecSumAggregator.finish(VecSumAggregator.merge(
        fold(b).toArray, fold(a).toArray))
      ab == m1 && ab == m2
    })
    // dimension mismatch is a hard error, never silent truncation
    intercept[IllegalArgumentException] {
      VecSumAggregator.reduce(Array(1L, 2L), Seq(1L, 2L, 3L))
    }
  }

  test("range-join floor division matches Math.floorDiv on the full long domain") {
    import org.apache.spark.sql.{functions => F}
    val spark = TestSpark.spark
    import spark.implicits._
    check(Prop.forAll(Gen.choose(-1000000000000L, 1000000000000L),
        Gen.choose(1L, 1000000L)) { (v, d) =>
      val got = Seq(v).toDF("v")
        .select(((F.col("v") - F.pmod(F.col("v"), F.lit(d))) / F.lit(d)).cast("long"))
        .head().getLong(0)
      got == Math.floorDiv(v, d)
    }, n = 50)
  }

  test("search_sorted equals the scala library binary search bucket rank") {
    import graft.functions.SearchSorted
    val boundsGen = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
      .map(_.distinct.sorted.toArray)
    check(Prop.forAll(boundsGen, Gen.choose(-2e6, 2e6)) { (bounds, v) =>
      val expr = SearchSorted(
        org.apache.spark.sql.catalyst.expressions.Literal(v), bounds)
      expr.eval(null).asInstanceOf[Long] == bounds.count(_ <= v).toLong
    })
  }

  test("Misra-Gries: merged summary keeps the n/(k+1) heavy-hitter guarantee") {
    import graft.functions.MisraGriesAggregator
    val items = Gen.listOf(Gen.chooseNum(0, 30).map(i => s"w$i"))
    check(Prop.forAll(items, Gen.chooseNum(2, 12)) { (xs, k) =>
      val agg = new MisraGriesAggregator(k)
      // arbitrary 3-way split, reduce each, merge in a fixed order
      val parts = xs.grouped(math.max(1, xs.size / 3 + 1)).toList
      val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      val n = xs.size
      val exact = xs.groupBy(identity).view.mapValues(_.size).toMap
      exact.forall { case (w, c) =>
        c.toDouble <= n.toDouble / (k + 1) || merged.contains(w)
      }
    })
  }

  test("Misra-Gries: summary never exceeds k entries") {
    import graft.functions.MisraGriesAggregator
    val items = Gen.listOf(Gen.chooseNum(0, 50).map(i => s"w$i"))
    check(Prop.forAll(items, items, Gen.chooseNum(1, 8)) { (xs, ys, k) =>
      val agg = new MisraGriesAggregator(k)
      val m = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      m.size <= k
    })
  }

  test("portable row hash: multiset manifest is order- and split-invariant") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rowsGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 999L), Gen.alphaNumStr))
    check(Prop.forAll(rowsGen, Gen.chooseNum(1, 7)) { (rows, parts) =>
      val h = graft.ext.Curation.portableRowHash(Seq(col("id"), col("s")))
      def fp(data: Seq[(Long, String)], np: Int): (Long, Long) = {
        val r = data.toDF("id", "s").repartition(np)
          .agg(sum(h).as("a"), sum(h * h % 1000000007L).as("b")).head()
        (r.getLong(0), r.getLong(1))
      }
      rows.isEmpty || fp(rows, 1) == fp(scala.util.Random.shuffle(rows), parts)
    }, n = 20) // each trial runs 2 Spark jobs — keep the count sane
  }
}

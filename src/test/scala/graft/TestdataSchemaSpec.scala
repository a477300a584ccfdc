package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Loud alarm for testdata regeneration drift: the driver rebuilds
  * /root/testdata between rounds and physical schemas can change under us
  * (events.ts flipped TIMESTAMP(NANOS) → timestamp[us] once, which broke 35
  * queries at analysis time and silently skewed 6 streaming oracles by
  * 1000×). Pin the POST-NORMALIZATION Spark schema of every star table: if
  * a regeneration changes a column's logical type, this fails by name in
  * `sbt test` instead of surfacing as a mass correctness wipe a round later.
  *
  * `ts` timestamps here are what [[Tables.table]] yields after its adaptive
  * decode, not the raw footer type — the contract downstream queries see. */
class TestdataSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // (table, column -> simpleString); timestamp columns may legitimately be
  // ntz or ltz depending on generator annotation — both read identically
  // under the pinned UTC session — so they match either form.
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp*", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp*"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private def matches(got: String, want: String): Boolean =
    if (want.endsWith("*")) got.startsWith(want.dropRight(1)) else got == want

  test("sf0.01 embeddings stay in q158's baked-oracle cluster band") {
    // q158 runs SemDedup with auto nClusters = max(8, ceil(n/64)); its
    // DuckDB oracle bakes the k=8 Lloyd replay. The formula returns 8 for
    // any n <= 512, so the gate (Verify at sf0.01, historically 500
    // vectors) agrees — but a generator that grows sf0.01 embeddings past
    // 512 would silently diverge the two. Fail loudly here instead.
    val n = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    assert(n > 0 && n <= 512,
      s"sf0.01 embeddings = $n: q158's oracle bakes k=8 (valid for n <= 512); " +
        "re-derive the oracle's kmeansCtes k from semDedupClustersFor(n)")
  }

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table schema matches the pinned contract") {
      val schema = Tables.table(spark, TestSpark.sfDir, table).schema
      val got = schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      assert(got.map(_._1) === cols.map(_._1),
        s"column set/order drifted for $table")
      for (((name, want), (_, g)) <- cols.zip(got))
        assert(matches(g, want), s"$table.$name: got $g, pinned $want")
    }
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: phase breakdown of the dialect text path for one statement —
  * rewrite / plan (spark.sql) / execute / trace — to localize front-door
  * latency (round-8 verdict residual #2). */
object DialectTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tables.Tables.registerAll(spark, sfDir)
    val g = graft.sql.GraftSession.cached(spark)
    val variants = Seq(
      ("full", """SELECT l_returnflag, round(sumIf(l_quantity, l_discount > 0.05), 2) AS sq, countIf(l_discount > 0.05) AS cq, uniq(l_orderkey) AS u FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      ("nouniq", """SELECT l_returnflag, round(sumIf(l_quantity, l_discount > 0.05), 2) AS sq, countIf(l_discount > 0.05) AS cq FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      ("onlyuniq", """SELECT l_returnflag, uniq(l_orderkey) AS u FROM lineitem GROUP BY l_returnflag"""),
      ("scan", """SELECT count(*) AS c FROM lineitem WHERE l_discount > 0.05""")
    )
    val stmt =
      """SELECT l_returnflag,
        |  round(sumIf(l_quantity, l_discount > 0.05), 2) AS sq,
        |  countIf(l_discount > 0.05) AS cq,
        |  uniq(l_orderkey) AS u
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val rewritten = graft.sql.Dialect.rewrite(stmt)
      val t1 = System.nanoTime()
      val df = spark.sql(rewritten)
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      val df2 = g.sql(stmt) // full front door for comparison
      val t4 = System.nanoTime()
      df2.write.format("noop").mode("overwrite").save()
      val t5 = System.nanoTime()
      println(f"[dt] iter $i rewrite=${(t1 - t0) / 1e6}%.1fms plan=${(t2 - t1) / 1e6}%.1fms " +
        f"exec=${(t3 - t2) / 1e6}%.1fms gsql=${(t4 - t3) / 1e6}%.1fms gexec=${(t5 - t4) / 1e6}%.1fms")
    }
    (1 to 3).foreach { _ =>
      variants.foreach { case (label, v) =>
        val t0 = System.nanoTime()
        g.sql(v).write.format("noop").mode("overwrite").save()
        println(f"[dt] variant $label%-10s ${(System.nanoTime() - t0) / 1e6}%.1fms")
      }
    }
    spark.stop()
  }
}

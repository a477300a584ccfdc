package graft.dev

import org.apache.spark.sql.SparkSession

/** Measures GraftSession front-door construction + first-statement cost —
  * the q38 profiling harness (round 7). */
object SessionTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count() // warm the scheduler
    (1 to 3).foreach { i =>
      val s2 = spark.newSession()
      val t0 = System.nanoTime()
      val g = graft.sql.GraftSession(s2)
      val t1 = System.nanoTime()
      g.sql("SELECT 1").collect()
      val t2 = System.nanoTime()
      g.sql("SELECT * FROM system_one").collect()
      val t3 = System.nanoTime()
      // the pre-round-7 constructor did this eagerly (and per system query)
      graft.tables.SystemTables.registerAll(s2)
      val t4 = System.nanoTime()
      println(f"[st] run $i: construct ${(t1 - t0) / 1e9}%.3f s, " +
        f"first stmt ${(t2 - t1) / 1e9}%.3f s, system query ${(t3 - t2) / 1e9}%.3f s, " +
        f"full registerAll ${(t4 - t3) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

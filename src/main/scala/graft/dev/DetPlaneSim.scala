package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: driver-side simulation of deterministic-plane quality for the
  * q50 blocking — compares weight-mixing formulas (the round-7 lattice vs
  * nonlinear mixes) by recall of the asymmetric radius-1 candidate join
  * against exact cosine pairs. All candidates computed in plain Scala over
  * collected embeddings (corpora here are ≤2k vectors). */
object DetPlaneSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val rows = graft.tables.Tables.table(spark, dir, "embeddings")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
      val n = rows.length
      // exact pairs at cosine >= 0.45
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      val exact = (for {
        i <- rows.indices; j <- (i+1) until n
        if cos(rows(i)._2, rows(j)._2) >= 0.45
      } yield (rows(i)._1, rows(j)._1)).toSet
      val qv = rows.map(_._2.map(x => math.floor(x * 1e6).toLong))
      println(s"== $dir n=$n exact=${exact.size}")

      def lattice(i: Long): Long = (i * 2654435761L) % 131071L - 65535L
      def square(i: Long): Long = {
        val s = (i * 2654435761L) % 131071L
        (s * s) % 131071L - 65535L
      }
      def splitmix(i: Long): Long = {
        var z = i + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        (((z % 131071L) + 131071L) % 131071L) - 65535L
      }

      for ((name, w) <- Seq(("lattice", lattice _), ("square", square _),
          ("splitmix", splitmix _));
          planes <- Seq(6, 8); tables <- Seq(12, 16, 20)) {
        // per (vec, table): bucket
        val buckets = Array.ofDim[Long](n, tables)
        for (v <- 0 until n; t <- 0 until tables) {
          var b = 0L
          for (p <- 0 until planes) {
            var proj = 0L
            var d = 0
            while (d < 64) {
              proj += qv(v)(d) * w(((t * planes + p) * 64 + d).toLong)
              d += 1
            }
            if (proj > 0) b |= (1L << p)
          }
          buckets(v)(t) = (t.toLong << 20) | b
        }
        // base map: bucket -> vec ids
        val base = scala.collection.mutable.HashMap[Long, List[Int]]()
        for (v <- 0 until n; t <- 0 until tables)
          base(buckets(v)(t)) = v :: base.getOrElse(buckets(v)(t), Nil)
        // probe side: base + radius-1
        val cand = scala.collection.mutable.HashSet[(Long, Long)]()
        for (v <- 0 until n; t <- 0 until tables) {
          val keys = buckets(v)(t) :: (0 until planes)
            .map(p => buckets(v)(t) ^ (1L << p)).toList
          for (k <- keys; u <- base.getOrElse(k, Nil); if rows(v)._1 < rows(u)._1)
            cand += ((rows(v)._1, rows(u)._1))
        }
        val hit = cand.toSet & exact
        val rec = if (exact.isEmpty) 1.0 else hit.size.toDouble / exact.size
        println(f"$name%9s planes=$planes%2d tables=$tables%2d recall=$rec%.3f cand=${cand.size}%7d")
      }
    }
    spark.stop()
  }
}

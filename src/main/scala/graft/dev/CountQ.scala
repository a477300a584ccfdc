package graft.dev
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("rows-only: " + (q -- o).toSeq.sorted.mkString(", "))
    println("orphan oracles: " + (o -- q).toSeq.sorted.mkString(", "))
  }
}

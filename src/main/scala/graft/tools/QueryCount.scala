package graft.tools

object QueryCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("q-o: " + (q -- o).toList.sorted.mkString(","))
    println("o-q: " + (o -- q).toList.sorted.mkString(","))
  }
}

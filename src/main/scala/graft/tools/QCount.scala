package graft.tools
object QCount {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("queries=" + q.size + " oracles=" + o.size)
    println("no-oracle: " + (q -- o).toList.sorted.mkString(","))
    println("orphan-oracle: " + (o -- q).toList.sorted.mkString(","))
    println(q.toList.sorted.mkString(" "))
  }
}

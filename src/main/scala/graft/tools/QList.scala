package graft.tools
object QList {
  def main(args: Array[String]): Unit = {
    println("NQUERIES " + graft.SparkEntry.queries.size)
    println(graft.SparkEntry.queries.keys.toSeq.sorted.mkString(","))
    println("NORACLES " + graft.SparkEntry.oracleSql.size)
  }
}

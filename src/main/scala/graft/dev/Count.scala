package graft.dev
object Count {
  def main(args: Array[String]): Unit = {
    println(s"queries=${graft.SparkEntry.queries.size} oracle=${graft.SparkEntry.oracleSql.size}")
    graft.SparkEntry.queries.keySet.toSeq.sorted.foreach(println)
  }
}

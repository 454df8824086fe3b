package graft.tools
object Counts {
  def main(a: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println(s"QUERIES=${qs.size} ORACLED=${os.size}")
    println("NO_ORACLE=" + (qs -- os).toSeq.sorted.mkString(","))
  }
}

package graft
object CountQ {
  def main(args: Array[String]): Unit = {
    println(s"QUERIES=${SparkEntry.queries.size} ORACLES=${SparkEntry.oracleSql.size}")
  }
}

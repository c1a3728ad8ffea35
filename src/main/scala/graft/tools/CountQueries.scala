package graft.tools

/** Prints registry sizes (doc-count helper, no Spark session). */
object CountQueries {
  def main(args: Array[String]): Unit = {
    println("QUERIES=" + graft.SparkEntry.queries.size)
    println("ORACLES=" + graft.SparkEntry.oracleSql.size)
  }
}

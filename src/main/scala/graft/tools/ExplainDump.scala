package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, d)
        .queryExecution.executedPlan.toString
      println(s"=== $name ===")
      println(plan.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}

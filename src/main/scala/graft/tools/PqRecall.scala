package graft.tools
import org.apache.spark.sql.SparkSession
object PqRecall {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val exact = pairs(graft.similarity.Similarity.annTopK(spark, d))
    val t1 = System.nanoTime()
    val pq = pairs(graft.similarity.Similarity.annPq(spark, d))
    val t2 = System.nanoTime()
    println(f"PQ_RECALL=${exact.intersect(pq).size.toDouble / exact.size}%.3f exact=${(t1-t0)/1e9}%.1fs pq=${(t2-t1)/1e9}%.1fs")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.similarity.Similarity.annTopK(spark, d))
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"${name}_RECALL=${exact.intersect(pairs(df)).size.toDouble / exact.size}%.3f")
    recall("IVF", graft.similarity.Similarity.annIvf(spark, d))
    recall("PQ", graft.similarity.Similarity.annPq(spark, d))
    recall("HIER", graft.similarity.Similarity.annHier(spark, d))
    spark.stop()
  }
}

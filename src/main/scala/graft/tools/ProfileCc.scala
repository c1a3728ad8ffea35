package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-count check for clusterLabels on a synthetic path graph. */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .appName("graft-profile-cc").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val nodes = (0L until n.toLong).toDF("doc_id")
    val (df, rounds) = graft.dedup.Dedup.clusterLabelsWithRounds(nodes, pairs)
    val bad = df.filter(org.apache.spark.sql.functions.col("cluster_id") =!= 0L).count()
    println(s"[cc] path n=$n rounds=$rounds wrong_labels=$bad")
    spark.stop()
  }
}

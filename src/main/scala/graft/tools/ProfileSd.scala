package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for semantic_dedup: exact pair stage vs component loop.
  * Usage: `sbt "runMain graft.tools.ProfileSd /root/testdata/sf0.1"`. */
object ProfileSd {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-sd").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sd] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (rep <- 1 to 2) {
      val pairs = time(s"r$rep pairs") {
        val p = graft.similarity.Similarity.embedNearDup(spark, d)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
          .localCheckpoint()
        println(s"[sd]   pairs=${p.count()}")
        p
      }
      val nodes = graft.Tables.embeddings(spark, d)
        .select(col("vec_id").as("doc_id")).localCheckpoint()
      time(s"r$rep clusterLabels") {
        val (df, rounds) = graft.dedup.Dedup.clusterLabelsWithRounds(nodes, pairs)
        val n = df.count()
        println(s"[sd]   rounds=$rounds labels=$n")
      }
      time(s"r$rep clusterLabelsStar") {
        graft.dedup.Dedup.clusterLabelsStar(nodes, pairs).count()
      }
      time(s"r$rep full_query") {
        graft.similarity.Similarity.semanticDedup(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

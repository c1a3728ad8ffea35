package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the pagerank query (full query, 3 reps).
  * Usage: `sbt "runMain graft.tools.ProfilePr /root/testdata/sf0.1"`. */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-pr").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.queries.Extended.pagerank(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"[pr] r$rep full_query ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}

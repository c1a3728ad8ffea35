package graft.tools

import org.apache.spark.sql.SparkSession

/** Times just the multimodal family (the round-5 optimization target)
  * with the bench's noop-sink materialization. Not a driver contract.
  *
  * Usage: `sbt "runMain graft.tools.ProfileMm /root/testdata/sf0.1"`.
  */
object ProfileMm {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-mm").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mm = graft.SparkEntry.queries.filter(_._1.startsWith("mm_"))
    for (_ <- 1 to 2; (name, fn) <- mm.toSeq.sortBy(_._1)) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[mm] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the dedup/LSH hot path — not part of the driver
  * contract; run manually: `sbt "runMain graft.tools.ProfileDedup"`. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { round =>
      println(s"== round $round ==")
      val docs = graft.Tables.documents(spark, d)
      val sh = time("shingle+hash (cache+count)") {
        val s = graft.dedup.Dedup.hashedShingles(docs).cache(); s.count(); s
      }
      val sig = time("minhash signatures") {
        val s = graft.dedup.Dedup.minhashSignaturesFrom(sh); noop(s); s
      }
      time("full minhashLsh")(noop(graft.dedup.Dedup.minhashLshOf(docs)))
      time("full ngramJaccard")(noop(graft.dedup.Dedup.ngramJaccardOf(docs)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

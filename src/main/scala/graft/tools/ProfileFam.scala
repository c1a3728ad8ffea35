package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a comma-separated list of registered queries (bench-style noop
  * sink, 2 reps, per-rep print).
  * Usage: `sbt "runMain graft.tools.ProfileFam <sfDir> q1,q2,..."`. */
object ProfileFam {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("dedup_clusters", "dedup_corpus", "corpus_build", "semantic_dedup"))
    val spark = SparkSession.builder()
      .appName("graft-profile-fam").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries.filter(kv => names(kv._1)).toSeq.sortBy(_._1)
    for (rep <- 1 to 2; (name, fn) <- qs) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[fam] r$rep $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}

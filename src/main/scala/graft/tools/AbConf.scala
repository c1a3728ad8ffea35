package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B harness: times selected queries under two values of a
  * runtime SQL conf, alternating repeats inside one JVM so host noise
  * and JIT state hit both arms equally. Not part of the driver contract.
  * `sbt "runMain graft.tools.AbConf <confKey> <valA> <valB> <q1,q2,...>"` */
object AbConf {
  def main(args: Array[String]): Unit = {
    val Array(key, valA, valB, qlist) = args.take(4)
    val names = qlist.split(",").toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("AB_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      run(name) // warm this query's codegen/JIT once, unbilled
      val (as, bs) = (1 to reps).foldLeft((List.empty[Double], List.empty[Double])) {
        case ((a, b), _) =>
          spark.conf.set(key, valA); val ta = run(name)
          spark.conf.set(key, valB); val tb = run(name)
          (ta :: a, tb :: b)
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"  $name%-22s A[$valA]=${med(as)}%.2f s  B[$valB]=${med(bs)}%.2f s" +
        f"  (min ${as.min}%.2f / ${bs.min}%.2f)")
    }
    spark.stop()
  }
}

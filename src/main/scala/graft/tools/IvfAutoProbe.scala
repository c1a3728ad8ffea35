package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: per-vector survivor agreement of the
  * auto-geometry IVF semantic dedup vs the exact pipeline, across
  * (nlist, softAssign) at a given SF — the data behind
  * `semantic_dedup_ivf_auto`'s floor choice. */
object IvfAutoProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.Similarity
    val all = Similarity.vecs(spark, d)
    val n = all.count()
    val exact = Similarity.semanticDedup(spark, d)
      .select(col("vec_id"), col("is_survivor").as("ex_s")).cache()
    exact.count()
    for (nlist <- Seq(8, 16, 32, 64); sa <- Seq(2, 3, 4)) {
      val t0 = System.nanoTime()
      val ivf = Similarity.clusterized(all,
          Similarity.ivfNearDupPairsOf(spark, all, 0.4, nlist, sa))
        .select(col("vec_id"), col("is_survivor").as("iv_s"))
      val row = exact.join(ivf, "vec_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("ex_s") === col("iv_s"), 1L).otherwise(0L)).as("agree"),
          max(when(col("ex_s") && !col("iv_s"), 1L).otherwise(0L)).as("lost"))
        .collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"n=$n nlist=$nlist soft=$sa agree=${row.getAs[Long]("agree").toDouble / row.getAs[Long]("n")}%.4f subset=${row.getAs[Long]("lost") == 0} ${secs}%.1f s")
    }
    spark.stop()
  }
}

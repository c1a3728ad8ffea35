package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement behind `semantic_dedup_ivf_auto`'s two-level
  * knobs (r10): per-vector survivor agreement of the HIERARCHICAL
  * auto-geometry IVF dedup vs the exact pipeline, across
  * (s1 = probed super-cells, soft = assigned cells) at a given SF —
  * the r10 sibling of [[IvfAutoProbe]]'s flat sweep. */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.{HierQuantizer, Similarity}
    val all = Similarity.vecs(spark, d)
    val n = all.count()
    val nlist = Similarity.nlistForCorpus(n)
    val exact = Similarity.clusterized(all, Similarity.exactPairsAmong(all, 0.4))
      .select(col("vec_id"), col("is_survivor").as("ex_s")).cache()
    exact.count()
    val model = HierQuantizer.train(spark, all.select("vec_id", "v"), n, nlist)
    println(s"n=$n nlist=$nlist k1=${model.k1} k2=${model.k2}")
    for (s1 <- Seq(2, 3, 4, 6); soft <- Seq(4, 6, 8)) {
      val t0 = System.nanoTime()
      val assigned = HierQuantizer.assignCells(model,
          all.select("vec_id", "v"), soft = soft, s1 = s1, "cell")
        .select("vec_id", "cell")
      val cand = assigned.select(col("vec_id").as("vec_a"), col("cell"))
        .join(assigned.select(col("vec_id").as("vec_b"), col("cell")), Seq("cell"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val nCand = cand.count()
      val ivf = Similarity.clusterized(all, Similarity.verifyPairs(all, cand, 0.4))
        .select(col("vec_id"), col("is_survivor").as("iv_s"))
      val row = exact.join(ivf, "vec_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("ex_s") === col("iv_s"), 1L).otherwise(0L)).as("agree"),
          max(when(col("ex_s") && !col("iv_s"), 1L).otherwise(0L)).as("lost"))
        .collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"s1=$s1 soft=$soft cand=$nCand agree=${row.getAs[Long]("agree").toDouble / row.getAs[Long]("n")}%.4f subset=${row.getAs[Long]("lost") == 0} ${secs}%.1f s")
    }
    spark.stop()
  }
}

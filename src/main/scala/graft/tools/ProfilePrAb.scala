package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-JVM A/B of the pagerank iteration loop: AQE-coalesced adjacency
  * vs explicitly pinned partitioning. Alternates variants to cancel
  * host drift. */
object ProfilePrAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-pr-ab").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val half = li.groupBy("ok")
      .agg(sort_array(collect_set(col("pk"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"""
          .stripMargin)).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .distinct()
    val pairs = half
      .union(half.select(col("pb").as("pa"), col("pa").as("pb")))
      .localCheckpoint()

    def loop(adj: DataFrame, n: Long): Unit = {
      val base = 1000000000000L / n
      var rank = adj.select(col("pa").as("node"), lit(base).as("rank"))
      for (_ <- 1 to 5) {
        rank = adj.join(broadcast(rank), col("pa") === col("node"))
          .select(explode(col("nbrs")).as("pb"), expr("rank div d").as("c"))
          .groupBy("pb").agg(sum(col("c")).as("s"))
          .select(col("pb").as("node"),
            expr(s"(15 * ${base}L + 85 * s) div 100").as("rank"))
          .localCheckpoint()
      }
      rank.write.format("noop").mode("overwrite").save()
    }

    def adjOf(pin: Boolean): DataFrame = {
      val a = pairs.groupBy(col("pa"))
        .agg(collect_list(col("pb")).as("nbrs"))
        .select(col("pa"), col("nbrs"), size(col("nbrs")).cast("long").as("d"))
      (if (pin) a.repartition(32, col("pa")) else a).localCheckpoint()
    }

    for (rep <- 1 to 3; pin <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val adj = adjOf(pin)
      println(s"[ab]   parts=${adj.rdd.getNumPartitions}")
      loop(adj, adj.count())
      println(f"[ab] r$rep pin=$pin%-5s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      adj.unpersist()
    }
    spark.stop()
  }
}

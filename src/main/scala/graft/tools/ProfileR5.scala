package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 measurement harness (manual; not a driver gate) — one main,
  * mode-dispatched, consolidating the session's ad-hoc profilers:
  *
  *   sbt "runMain graft.tools.ProfileR5 <mode> [sfDir]"
  *
  *   fam q1,q2,..  bench-style (noop sink) timing of listed queries
  *   pr            pagerank full-query, 3 reps
  *   prab          pagerank loop A/B: AQE-coalesced vs pinned adjacency
  *   sd            semantic_dedup stages: pair build vs CC loop
  *   cc N          clusterLabels round count on an N-node path graph
  *   fz            fuzzy_join stages: variants / candidates / full
  *   vid           VideoCodec encode/decode cost, driver-local
  *   aud           AudioCodec 1-vs-32-thread round trip, driver-local
  *
  * These measurements back specific design decisions recorded in
  * SCALE.md round-5e (adjacency-form pagerank, pointer-doubling CC,
  * pinned codec-stage parallelism, the AudioSystem SPI bypass). */
object ProfileR5 {
  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-profile-r5").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[r5] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("fam")
    val d = args.lift(2).orElse(args.lift(1).filter(_.startsWith("/")))
      .getOrElse("/root/testdata/sf0.1")
    mode match {
      case "fam" =>
        val names = args.lift(1).filterNot(_.startsWith("/")).map(_.split(",").toSet)
          .getOrElse(Set("pagerank", "semantic_dedup", "ann_ivfpq", "fuzzy_join"))
        val spark = session()
        val qs = graft.SparkEntry.queries.filter(kv => names(kv._1)).toSeq.sortBy(_._1)
        for (rep <- 1 to 2; (name, fn) <- qs) {
          spark.catalog.clearCache()
          time(s"r$rep $name") {
            fn(spark, d).write.format("noop").mode("overwrite").save()
          }
        }
        spark.stop()

      case "pr" =>
        val spark = session()
        for (rep <- 1 to 3) time(s"r$rep pagerank") {
          graft.queries.Extended.pagerank(spark, d)
            .write.format("noop").mode("overwrite").save()
        }
        spark.stop()

      case "prab" =>
        val spark = session()
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
        for (rep <- 1 to 3; pin <- Seq(false, true)) {
          val a = pairs.groupBy(col("pa"))
            .agg(collect_list(col("pb")).as("nbrs"))
            .select(col("pa"), col("nbrs"), size(col("nbrs")).cast("long").as("d"))
          val adj = (if (pin) a.repartition(32, col("pa")) else a).localCheckpoint()
          println(s"[r5]   parts=${adj.rdd.getNumPartitions}")
          time(s"r$rep pin=$pin")(loop(adj, adj.count()))
          adj.unpersist()
        }
        spark.stop()

      case "sd" =>
        val spark = session()
        for (rep <- 1 to 2) {
          val pairs = time(s"r$rep pairs") {
            val p = graft.similarity.Similarity.embedNearDup(spark, d)
              .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
              .localCheckpoint()
            println(s"[r5]   pairs=${p.count()}")
            p
          }
          val nodes = graft.Tables.embeddings(spark, d)
            .select(col("vec_id").as("doc_id")).localCheckpoint()
          time(s"r$rep clusterLabels") {
            val (df, rounds) = graft.dedup.Dedup.clusterLabelsWithRounds(nodes, pairs)
            println(s"[r5]   rounds=$rounds labels=${df.count()}")
          }
          time(s"r$rep full_query") {
            graft.similarity.Similarity.semanticDedup(spark, d)
              .write.format("noop").mode("overwrite").save()
          }
        }
        spark.stop()

      case "cc" =>
        val n = args.lift(1).map(_.toInt).getOrElse(256)
        val spark = session()
        import spark.implicits._
        val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
        val nodes = (0L until n.toLong).toDF("doc_id")
        val (df, rounds) = graft.dedup.Dedup.clusterLabelsWithRounds(nodes, pairs)
        val bad = df.filter(col("cluster_id") =!= 0L).count()
        println(s"[r5] path n=$n rounds=$rounds wrong_labels=$bad")
        spark.stop()

      case "fz" =>
        val spark = session()
        for (rep <- 1 to 2) {
          val names = graft.Tables.customer(spark, d)
            .select(col("c_custkey").as("id"), col("c_name").as("name"))
          val variants = names.select(col("id"),
            explode(expr(
              "array_union(array(name), transform(sequence(1, length(name)), " +
              "i -> concat(substring(name, 1, i-1), substring(name, i+1, 1000))))"))
              .as("v"))
            .select(col("id"), xxhash64(col("v")).as("vh"))
          val nv = time(s"r$rep variants")(variants.count())
          val cand = variants.select(col("id").as("id_a"), col("vh"))
            .join(variants.select(col("id").as("id_b"), col("vh")), Seq("vh"))
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b").distinct().localCheckpoint()
          val nc = time(s"r$rep candidates")(cand.count())
          println(s"[r5]   variants=$nv candidates=$nc")
          time(s"r$rep full_query") {
            graft.queries.Extended.fuzzyJoin(spark, d)
              .write.format("noop").mode("overwrite").save()
          }
        }
        spark.stop()

      case "vid" =>
        val n = args.lift(1).map(_.toInt).getOrElse(1500)
        val ids = 0L until n.toLong
        for (rep <- 1 to 2) {
          time(s"r$rep frameImage") {
            ids.foreach(id =>
              (0 until graft.multimodal.Multimodal.VideoCodec.nFrames(id))
                .foreach(f => graft.multimodal.Multimodal.VideoCodec.frameImage(id, f)))
          }
          val payloads = time(s"r$rep encodeAll") {
            graft.multimodal.Multimodal.VideoCodec
              .encodeAll(ids.iterator).map(_._2).toArray
          }
          time(s"r$rep decodeSample") {
            val in = ids.iterator.zip(payloads.iterator).map { case (id, p) =>
              val step = (graft.multimodal.Multimodal.VideoCodec.nFrames(id) + 3) / 4
              ((), p, (f: Int) => f % step == 0)
            }
            graft.multimodal.Multimodal.VideoCodec
              .decodeSampledAll(in).map(_._3.size).sum
          }
        }

      case "aud" =>
        val n = args.lift(1).map(_.toInt).getOrElse(5000)
        val ids = (0L until n.toLong).toArray
        def work(chunk: Array[Long]): Long =
          graft.multimodal.Multimodal.AudioCodec
            .roundTripAll(chunk.iterator).map(_.abs_sum).sum
        for (rep <- 1 to 2) {
          time(s"r$rep single-thread")(work(ids))
          val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
          time(s"r$rep 32-thread") {
            ids.grouped(n / 32 + 1).map { chunk =>
              pool.submit(new java.util.concurrent.Callable[Long] {
                def call(): Long = work(chunk)
              })
            }.toList.map(_.get()).sum
          }
          pool.shutdown()
        }

      case other => sys.error(s"unknown mode '$other'")
    }
  }
}

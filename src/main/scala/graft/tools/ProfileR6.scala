package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 profiler, mode-dispatched (the r5 profiler idiom):
  *
  *   sbt "runMain graft.tools.ProfileR6 <mode> [sfDir]"
  *
  *   trio   — q1_agg / q20 / q21 SOLO, n=3 reps each (VERDICT r5 #4:
  *            these regressed 0.96→1.63 / 0.62→1.40 / 1.02→1.58 s in
  *            the r5 gate bench with no code change; a solo run in an
  *            idle JVM separates plan damage from suite contention).
  *   served — ann_ivfpq in-query vs ann_ivfpq_served build + probe
  *            reps, showing the amortized probe path the bench's
  *            min-of-reps reports.
  *   fuzzy  — fuzzy_join stage split (variant build / candidate join /
  *            full), reusing the query's own stage helpers.
  */
object ProfileR6 {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("trio")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-profile-r6").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String, reps: Int = 3)(f: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-24s min=${ts.min}%6.2fs  all=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    mode match {
      case "trio" =>
        // one warmup pass each (the bench warms at sf0.01 too)
        noop(graft.queries.Relational.queries("q1_agg")(spark, "/root/testdata/sf0.01"))
        Seq("q20_promo_supplier", "q21_waiting_supplier").foreach { q =>
          noop(graft.queries.TpcH.queries(q)(spark, "/root/testdata/sf0.01"))
        }
        time("q1_agg") { noop(graft.queries.Relational.queries("q1_agg")(spark, d)) }
        time("q20_promo_supplier") {
          noop(graft.queries.TpcH.queries("q20_promo_supplier")(spark, d)) }
        time("q21_waiting_supplier") {
          noop(graft.queries.TpcH.queries("q21_waiting_supplier")(spark, d)) }

      case "fuzzy" =>
        // the stages are the query's OWN private[graft] helpers, so a
        // change to the production expression is automatically what
        // gets profiled here
        import org.apache.spark.sql.functions.col
        val names = graft.Tables.customer(spark, d)
          .select(col("c_custkey").as("id"), col("c_name").as("name"))
        time("variants_build") {
          noop(graft.queries.Extended.fuzzyVariantsOf(names))
        }
        time("cand_join_distinct") {
          noop(graft.queries.Extended.fuzzyCandidatesOf(names))
        }
        time("fuzzy_full") {
          noop(graft.queries.Extended.fuzzyJoin(spark, d))
        }

      case "served" =>
        time("ann_ivfpq_inquery") {
          noop(graft.similarity.Similarity.annIvfPq(spark, d)) }
        // first rep builds the index tables, later reps probe only —
        // print each so build vs probe costs are both visible
        time("ann_ivfpq_served") {
          noop(graft.similarity.Similarity.annIvfPqServed(spark, d)) }

      case "new6" =>
        // the queries registered AFTER the round-6 gate bench — solo
        // reps so their first BENCH_r7 appearance has a contention-free
        // reference number
        val post = Seq("bpe_train", "bpe_encode", "graph_triangles",
          "graph_degree_stats", "lm_bigram_score", "entity_resolution",
          "graph_kcore")
        post.foreach { q =>
          noop(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01"))
        }
        post.foreach { q =>
          time(q) { noop(graft.SparkEntry.queries(q)(spark, d)) }
        }

      case "tri6" =>
        // 6 timed reps of graph_triangles alone, with GC + block-manager
        // telemetry between reps, to separate plan cost from JVM decay
        import scala.jdk.CollectionConverters._
        val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val dur = for {
                s <- si.submissionTime; c <- si.completionTime
              } yield c - s
              stages.add((si.stageId, dur.getOrElse(-1L),
                si.taskMetrics.executorRunTime))
            }
          })
        noop(graft.SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.01"))
        (1 to 6).foreach { i =>
          val gcBefore = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(b => b.getCollectionTime).sum
          val t0 = System.nanoTime()
          noop(graft.SparkEntry.queries("graph_triangles")(spark, d))
          val secs = (System.nanoTime() - t0) / 1e9
          val gcAfter = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(b => b.getCollectionTime).sum
          val mem = spark.sparkContext.getExecutorMemoryStatus.values.head
          println(f"[tri6] rep$i%d  ${secs}%6.2fs  gc=${(gcAfter - gcBefore) / 1000.0}%5.1fs  blockFree=${mem._2 / 1024 / 1024}%dMB")
          val slow = stages.asScala.toSeq.sortBy(-_._2).take(5)
          slow.foreach { case (id, wall, run) =>
            println(f"[tri6]   stage$id%5d wall=${wall / 1000.0}%6.2fs taskRun=${run / 1000.0}%7.2fs")
          }
          stages.clear()
        }

      case "tristats" =>
        // size the triangle pipeline's stages: is the wedge volume the
        // cost, and would an edge-local adjacency intersection beat it?
        import org.apache.spark.sql.functions._
        val half = graft.queries.Extended.coOccurHalf(spark, d).cache()
        println("[tristats] edges=" + half.count())
        val deg = half.select(col("pa").as("n"))
          .union(half.select(col("pb").as("n")))
          .groupBy("n").agg(count(lit(1)).as("dg")).cache()
        println("[tristats] nodes=" + deg.count())
        println("[tristats] deg max/avg=" + deg.agg(max("dg"), avg("dg")).collect()(0))
        val or = half
          .join(broadcast(deg.select(col("n").as("pa"), col("dg").as("da"))), "pa")
          .join(broadcast(deg.select(col("n").as("pb"), col("dg").as("db"))), "pb")
          .select(when(struct(col("da"), col("pa")) < struct(col("db"), col("pb")),
            col("pa")).otherwise(col("pb")).as("src"))
        val od = or.groupBy("src").agg(count(lit(1)).as("d"))
        println("[tristats] outdeg max/avg, wedges=" +
          od.agg(max("d"), avg("d"), sum(expr("d*(d-1)/2"))).collect()(0))
        println("[tristats] triangles=" + graft.queries.Extended
          .trianglesOf(half).agg(sum("triangles")).collect()(0))

      case "lpa" =>
        // solo reps for the LPA round-shuffle fix (pre-partitioned
        // checkpoint vs per-round vote exchanges)
        noop(graft.queries.Extended.queries("graph_communities")(
          spark, "/root/testdata/sf0.01"))
        time("graph_communities") {
          noop(graft.queries.Extended.queries("graph_communities")(spark, d))
        }

      case "lpa_plan" =>
        // one vote round's physical plan: exchanges visible?
        import org.apache.spark.sql.functions._
        val half = graft.queries.Extended.coOccurHalf(spark, d)
        val edges = half.select(col("pa").as("a"), col("pb").as("b"))
          .union(half.select(col("pb").as("a"), col("pa").as("b")))
          .repartition(col("a"))
          .persist()
        edges.count()
        val labels = edges.select(col("a").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
          .localCheckpoint()
        val round = edges
          .join(broadcast(labels.select(col("node").as("b"), col("label"))), "b")
          .groupBy(col("a"), col("label")).agg(count(lit(1)).as("c"))
          .groupBy(col("a").as("node"))
          .agg(min(struct((-col("c")).as("nv"), col("label").as("l"))).as("m"))
          .select(col("node"), col("m.l").as("label"))
        round.write.format("noop").mode("overwrite").save()
        println("[profile] plan:\n" + round.queryExecution.executedPlan)

      case other => sys.error(s"unknown mode '$other'")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Similarity
import graft.queries.Extended

/** Round-7 scale measurements (VERDICT r6 #3 and #4) — two curves the
  * scaladoc arguments promised but never measured:
  *
  *  1. **LSH occupancy** (the one open scale-killer): candidate-pair
  *     counts for the semantic-dedup nets across corpus sizes n and
  *     bucket geometries. Fixed 4 bits ⇒ candidates grow ~quadratically
  *     in n; bits ∝ log n ([[Similarity.bitsForCorpus]]) and IVF with
  *     nlist ∝ n hold them ~linear. Edge recall vs the exact pair set
  *     rides along so the occupancy cure is shown not to buy its
  *     linearity with recall collapse (random-hyperplane recall DOES
  *     decay with bits — the measured trade the scaladoc argues).
  *  2. **Graph/ER suite scaling**: wall time for triangles / k-core /
  *     LPA / degree-stats / entity-resolution at 1×, 4×, 16× the sf0.1
  *     graph, disjoint-copy amplification (shifted keys — same degree
  *     distribution per copy, so the frontier-bound and orientation
  *     arguments are exercised at growing |E| without manufacturing an
  *     adversarial hub that the orientation already caps by design).
  *
  * Results land in SCALE.md §round-7. Run:
  * `sbt "runMain graft.tools.ScaleR7 [lsh|graph]"`.
  */
object ScaleR7 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      // the 256× lesson (SCALE.md §r8): a fixed partition count at big
      // multipliers measures the un-turned knob, not the plan — size it
      // to the data like any real deployment would
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_R7_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("all")
    if (which == "lsh" || which == "all") lshOccupancy(spark, d)
    if (which == "graph" || which == "all") graphScaling(spark, d)
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Candidates + verified pairs + recall for each (n, method). */
  private def lshOccupancy(spark: SparkSession, d: String): Unit = {
    val all = Similarity.vecs(spark, d).cache()
    val total = all.count()
    println(s"[scale-r7] lsh-occupancy corpus=$total (dir=$d)")
    println(f"${"n"}%6s ${"method"}%-12s ${"candidates"}%12s ${"verified"}%9s ${"recall"}%7s ${"sec"}%7s")
    for (n <- Seq(500L, 1000L, 2000L).filter(_ <= total)) {
      val sub = all.filter(col("vec_id") < n).cache()
      sub.count()
      // exact pair set at the query threshold — the recall denominator
      val exact = sub.select(col("vec_id").as("vec_a"), col("v").as("va"))
        .join(sub.select(col("vec_id").as("vec_b"), col("v").as("vb")),
          col("vec_a") < col("vec_b"))
        .filter(expr("cosine_sim(va, vb)") >= 0.4)
        .select("vec_a", "vec_b").cache()
      val nExact = exact.count()
      def report(method: String, cand: DataFrame, pairs: DataFrame): Unit = {
        val (nCand, tc) = timed(cand.count())
        val found = pairs.select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
          .join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
        val recall = if (nExact == 0) 1.0 else found.toDouble / nExact
        println(f"$n%6d $method%-12s $nCand%12d $found%9d $recall%7.3f $tc%7.2f")
      }
      for (bits <- Seq(4, 6, 8)) {
        report(s"lsh b=$bits",
          Similarity.lshCandidatesOf(spark, sub, 8, bits),
          Similarity.lshNearDupPairsOf(spark, sub, 0.4, 8, bits))
      }
      val autoBits = Similarity.bitsForCorpus(n)
      println(f"$n%6d ${s"(auto bits=$autoBits)"}%-12s")
      val nlist = math.max(4, (n / 125).toInt)
      report(s"ivf nl=$nlist",
        Similarity.ivfCandidatesOf(spark, sub, nlist),
        Similarity.ivfNearDupPairsOf(spark, sub, 0.4, nlist))
      // edge recall is not the dedup decision metric — survivor
      // agreement at the CLUSTER level is (most missed edges connect
      // vectors already joined transitively, or change no survivor);
      // measure it on the same nlist ∝ n diagonal
      def survivors(pairs: DataFrame): Map[Long, Boolean] = {
        val nodes = sub.select(col("vec_id").as("doc_id"))
        graft.dedup.Dedup.clusterLabels(nodes, pairs)
          .select(col("doc_id"), (col("doc_id") === col("cluster_id")).as("s"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      }
      val exS = survivors(exact.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      val ivS = survivors(Similarity.ivfNearDupPairsOf(spark, sub, 0.4, nlist))
      val agree = exS.count { case (k, v) => ivS(k) == v }.toDouble / exS.size
      println(f"$n%6d ${"ivf survivor-agreement"}%-22s $agree%7.3f")
      println(f"$n%6d ${"exhaustive"}%-12s ${n * (n - 1) / 2}%12d $nExact%9d ${1.0}%7.3f")
      sub.unpersist(); exact.unpersist()
    }
    all.unpersist()
  }

  /** Wall time for the graph/ER suite at 1×, 4×, 16× disjoint copies
    * (override the multiplier list with SCALE_R7_MULTS=64 etc.). */
  private def graphScaling(spark: SparkSession, d: String): Unit = {
    println(s"[scale-r7] graph-scaling (dir=$d)")
    val mults = sys.env.get("SCALE_R7_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
    // ops filter (csv of graph,er) for re-running one half of the suite
    val ops = sys.env.get("SCALE_R7_OPS")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("graph", "er"))
    for (mult <- mults) {
      if (ops("graph")) {
      val li = (0 until mult).map { i =>
        Tables.lineitem(spark, d)
          .select((col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
            (col("l_partkey") + lit(i.toLong * 100000000L)).as("l_partkey"))
      }.reduce(_ unionByName _)
      val half = li
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy("ok")
        .agg(sort_array(collect_set(col("pk"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"""
            .stripMargin)).as("e"))
        .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .distinct().cache()
      // per-operator filter so already-measured operators (e.g. LPA's
      // 256× point from ScaleR8) need not re-run in a long sweep
      val gops = sys.env.get("SCALE_R7_GRAPH_OPS")
        .map(_.split(",").map(_.trim).toSet)
        .getOrElse(Set("triangles", "degstats", "kcore", "lpa"))
      // print PER OP as it completes: a crash mid-sweep (the r8 256×
      // kcore maxResultSize find) must not destroy the earlier numbers
      val (nEdges, tBuild) = timed(half.count())
      println(f"[scale-r7] mult=$mult%2d edges=$nEdges%9d build=$tBuild%6.2f")
      if (gops("triangles")) {
        val (_, t) = timed(Extended.trianglesOf(half)
          .agg(sum(col("triangles"))).collect())
        println(f"[scale-r7] mult=$mult%2d triangles=$t%6.2f")
      }
      if (gops("degstats")) {
        val (_, t) = timed(Extended.degreeStatsOf(half).collect())
        println(f"[scale-r7] mult=$mult%2d degstats=$t%6.2f")
      }
      if (gops("kcore")) {
        val (n, t) = timed(Extended.kcoreOf(half, 4, 8).count())
        println(f"[scale-r7] mult=$mult%2d kcore=$t%6.2f (rows=$n)")
      }
      if (gops("lpa")) {
        val (n, t) = timed(Extended.lpaOf(half).count())
        println(f"[scale-r7] mult=$mult%2d lpa=$t%6.2f (rows=$n)")
      }
      half.unpersist()
      }
      if (ops("er")) {
      // ER: copies carry perturbed names ≥2 edits apart (`v$i$i` — a
      // single-digit suffix like `v$i` keeps copies 1 edit apart, so
      // cross-copy pairs are GENUINE matches and the match graph
      // densifies quadratically with mult: the first 64× run measured
      // that artifact, ×10 at ×4 data, not the engine. With distinct
      // blocks the measurement is linear scaling, not an adversarial
      // everything-collides corpus)
      val recs = (0 until mult).map { i =>
        Tables.customer(spark, d).select(
          (col("c_custkey") + lit(i.toLong * 100000000L)).as("id"),
          concat(col("c_name"), lit(s" v$i$i")).as("name"),
          col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
      }.reduce(_ unionByName _)
      val (nEr, tEr) = timed(Extended.entityResolutionOf(recs).count())
      println(f"[scale-r7] mult=$mult%2d er_rows=$nEr%9d er=$tEr%6.2f")
      }
    }
  }
}

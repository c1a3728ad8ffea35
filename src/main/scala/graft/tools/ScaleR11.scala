package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 scale measurement: the HIGH-OCTAVE continuation of
  * [[ScaleR10]]'s quantizer sweep (VERDICT r10 #5) — does the
  * sub-level training-sample hard cap ([[graft.similarity
  * .HierQuantizer.SubTrainCap]], 2²⁰ rows) actually bend the training
  * cost curve once it binds?
  *
  * Under the dedup geometry nlist = n/64, the uncapped 16·nlist target
  * is n/4 — superlinear Θ(sample·k2) Lloyd FLOPs. The cap binds at
  * 16·nlist > 2²⁰ ⟺ n > 4.19 M vectors — multiplier ×2048 of the
  * sf0.1 corpus (2 000 vectors) — so this sweep runs ×256 → ×1024 →
  * ×4096: one octave below the bind point, one straddling it, one
  * past it, printing the TARGET vs the bind so the bend is attributed
  * to the cap and not to noise. The ANN geometry rides along
  * (nlistAnnForCorpus is √n-capped, so its 16·nlist target stays far
  * below the cap — expected to keep the r10 slope).
  *
  * Amplification: id-shifted copies like every Scale tool, but via a
  * single crossJoin against `range(mult)` instead of a mult-way
  * unionByName — at ×4096 a union plan carries 4096 scan branches and
  * the planner, not the data, becomes the cost. Same rows either way.
  *
  * `sbt "runMain graft.tools.ScaleR11 [dedup|ann|all|mrl]"` — `all`
  * covers the quantizer pair; the MRL rerank sweep (its own geometry
  * grid, SCALE.md §r11 "Matryoshka prefix rerank") runs only under the
  * explicit `mrl` mode. Unknown modes fail loud. Mults via
  * SCALE_R11_MULTS. Results land in SCALE.md §round-11.
  */
object ScaleR11 {

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("all")
    require(Set("dedup", "ann", "all", "mrl")(which),
      s"unknown mode '$which' — expected dedup|ann|all|mrl")
    val mults = sys.env.get("SCALE_R11_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(256, 1024, 4096))
    for (mult <- mults) {
      // bytes-proportional partitions (GraftSession policy): the
      // amplified corpus is n·dim·8 bytes through the shuffles
      val parts = graft.GraftSession.shufflePartitionsForBytes(
        mult.toLong * 2000L * 64 * 8)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      println(s"\n[scale-r11] mult=$mult shuffle.partitions=$parts")
      if (which == "dedup" || which == "all") dedupQuantizer(spark, d, mult)
      if (which == "ann" || which == "all") annQuantizer(spark, d, mult)
      if (which == "mrl") mrlRerank(spark, d, mult)
    }
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Disjoint id-shifted copies through ONE scan: crossJoin against
    * range(mult), ids shifted by copy·10⁷ exactly like ScaleR7-R10.
    * The base parquet is a single file → one input partition, and the
    * broadcast-range crossJoin inherits it — repartition by the bytes
    * policy or every downstream narrow stage runs on one core. */
  private def amplifiedVecs(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // shift must clear the base id range or copies collide (ADVICE r11)
    val maxId = Tables.embeddings(spark, d)
      .agg(max(col("vec_id"))).collect()(0).getLong(0)
    Amplify.assertClears(maxId, "vec_id")
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * lit(Amplify.IdShift)).as("vec_id"),
        col("v"))
      .repartition(parts, col("vec_id"))
  }

  private def subTarget(nlist: Int): Long =
    math.min(graft.similarity.HierQuantizer.SubTrainCap, 16L * nlist)

  private def dedupQuantizer(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.{HierQuantizer, Similarity}
    val all = amplifiedVecs(spark, d, mult).cache()
    val (n, _) = timed(all.count())
    val dim = 64
    val nlist = Similarity.nlistForCorpus(n)
    val tgt = subTarget(nlist)
    val capped = 16L * nlist > HierQuantizer.SubTrainCap
    val (model, tTrain) = timed {
      val m = HierQuantizer.train(spark, all.select("vec_id", "v"), n, nlist)
      m.subs.count()
      m
    }
    val probe = Similarity.probeFrame(all, Similarity.probeBuckets(n))
    val (nCand, tAssign) = timed {
      val assigned = HierQuantizer.assignCells(model,
          probe.select("vec_id", "v"), soft = 6, s1 = 4, "cell")
        .select("vec_id", "cell")
      assigned.select(col("vec_id").as("vec_a"), col("cell"))
        .join(assigned.select(col("vec_id").as("vec_b"), col("cell")), Seq("cell"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().count()
    }
    println(f"[scale-r11] dedup mult=$mult%4d n=$n%9d nlist=$nlist%7d " +
      f"k1=${model.k1}%4d k2=${model.k2}%4d sub_target=$tgt%8d capped=$capped%5s " +
      f"hier_train_s=$tTrain%8.2f probe_assign_s=$tAssign%6.2f cand=$nCand%9d " +
      f"driver_b=${model.k1.toLong * dim * 8}%8d")
    all.unpersist()
  }

  private def annQuantizer(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.{HierQuantizer, Similarity}
    val all = amplifiedVecs(spark, d, mult).cache()
    val (n, _) = timed(all.count())
    val dim = 64
    val nlist = Similarity.nlistAnnForCorpus(n)
    val tgt = subTarget(nlist)
    val (model, tTrain) = timed {
      val m = HierQuantizer.train(spark, all.select("vec_id", "v"), n, nlist)
      m.subs.count()
      m
    }
    val (nAssigned, tAssign) = timed {
      HierQuantizer.assignCells(model, all.select("vec_id", "v"),
        soft = 1, s1 = 2, "list_id").count()
    }
    println(f"[scale-r11] ann   mult=$mult%4d n=$n%9d nlist=$nlist%7d " +
      f"k1=${model.k1}%4d k2=${model.k2}%4d sub_target=$tgt%8d " +
      f"train_s=$tTrain%8.2f corpus_assign_s=$tAssign%8.2f assigned=$nAssigned%9d " +
      f"scored_per_vec=${model.k1 + 2 * model.k2}%5d vs_flat=$nlist%7d " +
      f"driver_b=${model.k1.toLong * dim * 8}%8d")
    all.unpersist()
  }

  /** Matryoshka prefix-rerank vs full-dim brute force at the same
    * mult: both sides score every corpus vector for the 10 standard
    * queries, but the MRL side scores the 16-dim PREFIX in stage 1 (4×
    * fewer multiply-adds and — stored as its own column — 4× fewer
    * scan bytes), then fetches only top-[[graft.similarity.Similarity
    * .MrlCandidates]] full vectors per query for the exact rerank. The
    * copies are deterministically perturbed (tie-free cosines) so the
    * reported recall@5 measures ranking, not id tie-breaks. */
  private def mrlRerank(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.Similarity
    val base = amplifiedVecs(spark, d, mult)
      .withColumn("v", expr("transform(v, x -> x + (vec_id % 9973) * 1e-6d)"))
    // dim 64 at the registered geometry, then dim 256 (v⊗4 — same
    // information, 4× the bytes/FLOPs) to locate the dimension
    // crossover: the prefix stage saves FLOPs/scan bytes but the
    // rerank fetch pays a second corpus pass, so MRL wins only once
    // per-row vector math dwarfs per-row iteration overhead
    mrlRerankAt(spark, base, mult, Similarity.MrlPrefixDims,
      Similarity.MrlCandidates, dimTag = 64)
    mrlRerankAt(spark, base.withColumn("v", expr("concat(v, v, v, v)")),
      mult, 64, Similarity.MrlCandidates, dimTag = 256)
  }

  private def mrlRerankAt(spark: SparkSession, vecsDf: DataFrame, mult: Int,
      pd: Int, cNum: Int, dimTag: Int): Unit = {
    val all = vecsDf.cache()
    val (n, _) = timed(all.count())
    val q = all.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        slice(col("v"), 1, pd).as("qp"))
    val corpus = all.filter(col("vec_id") >= 10)
    // the PREFIX is its own stored column in the production layout —
    // cache it materialized so stage 1's timing reads 16-dim rows,
    // not 64-dim rows plus an on-the-fly slice
    val cPre = corpus
      .select(col("vec_id").as("neighbor_id"), slice(col("v"), 1, pd).as("cp"))
      .cache()
    cPre.count()
    val (exact, tExact) = timed {
      graft.plans.TopKPerKey(
        corpus.select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
          .join(broadcast(q.select("query_id", "qv")))
          .withColumn("cos_sim", expr("cosine_sim(qv, cv)"))
          .select("query_id", "neighbor_id", "cos_sim"),
        Seq("query_id"), Seq(col("cos_sim").desc, col("neighbor_id").asc), k = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (got, tMrl) = timed {
      val cand = graft.plans.TopKPerKey(
        cPre.join(broadcast(q.select("query_id", "qp")))
          .withColumn("pre_sim", expr("cosine_sim(qp, cp)"))
          .select("query_id", "neighbor_id", "pre_sim"),
        Seq("query_id"), Seq(col("pre_sim").desc, col("neighbor_id").asc),
        k = cNum)
      graft.plans.TopKPerKey(
        cand
          .join(corpus.select(col("vec_id").as("neighbor_id"), col("v").as("cv")),
            "neighbor_id")
          .join(broadcast(q.select("query_id", "qv")), "query_id")
          .withColumn("cos_sim", expr("cosine_sim(qv, cv)"))
          .select("query_id", "neighbor_id", "cos_sim"),
        Seq("query_id"), Seq(col("cos_sim").desc, col("neighbor_id").asc), k = 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = (exact intersect got).size.toDouble / exact.size
    println(f"[scale-r11] mrl   mult=$mult%4d n=$n%9d dim=$dimTag%4d " +
      f"prefix_dims=$pd%3d cand=$cNum%3d exact_s=$tExact%7.2f mrl_s=$tMrl%7.2f " +
      f"speedup=${tExact / tMrl}%5.2f recall@5=$recall%5.3f")
    cPre.unpersist(); all.unpersist()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 scale measurement: the bounded coarse-quantizer program
  * (VERDICT r9 #1) under corpus amplification.
  *
  * Per multiplier, for BOTH auto-geometry paths:
  *
  *  - dedup geometry (occupancy-constant `nlistForCorpus`, model ∝
  *    corpus): two-level train time, the gate's probe-assign +
  *    candidate time, and the driver-held model bytes — k1·dim·8 for
  *    the hierarchical supers vs nlist·dim·8 that the flat path
  *    collected and broadcast per Lloyd round;
  *  - ANN geometry (`nlistAnnForCorpus` = min(occupancy, 4·√n)):
  *    train time and full-corpus single-cell assignment time, with
  *    per-vector scored-centroid counts (k1 + s1·k2 vs flat nlist).
  *
  * The flat trainCentroids path runs at small multipliers only, as the
  * contrast column (its per-round collect is the thing being retired).
  *
  * `sbt "runMain graft.tools.ScaleR10 [dedup|ann|all]"`, mults via
  * SCALE_R10_MULTS. Results land in SCALE.md §round-10.
  */
object ScaleR10 {

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
    val mults = sys.env.get("SCALE_R10_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16, 64))
    for (mult <- mults) {
      // the engine's bytes partition policy (GraftSession scaladoc):
      // ScaleR9 measured it against rows- and AQE-from-high
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(32, mult).toString)
      println(s"\n[scale-r10] mult=$mult shuffle.partitions=${math.max(32, mult)}")
      if (which == "dedup" || which == "all") dedupQuantizer(spark, d, mult)
      if (which == "ann" || which == "all") annQuantizer(spark, d, mult)
    }
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** ScaleR7/R8/R9 amplification recipe: disjoint id-shifted copies. */
  private def amplifiedVecs(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    (0 until mult).map { i =>
      Tables.embeddings(spark, d).select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    }.reduce(_ unionByName _)
  }

  private def dedupQuantizer(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.{HierQuantizer, Similarity}
    val all = amplifiedVecs(spark, d, mult).cache()
    val (n, _) = timed(all.count())
    val dim = 64
    val nlist = Similarity.nlistForCorpus(n)
    val (model, tTrain) = timed {
      val m = HierQuantizer.train(spark, all.select("vec_id", "v"), n, nlist)
      m.subs.count() // force both levels
      m
    }
    val driverBytes = model.k1.toLong * dim * 8
    val flatBytes = nlist.toLong * dim * 8
    // the gate's own assign path: bounded probe set through the
    // two-level cells (registered-query geometry: s1=4, soft=6)
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
    // flat contrast at small multipliers: per-round collect of the FULL
    // nlist model + n×nlist scoring — the retired scale-killer
    val flat = if (mult <= 4) {
      val (_, tFlat) = timed {
        val cents = Similarity.trainCentroids(spark, all, nlist, iters = 2)
        Similarity.nearestLists(cents, probe.select("vec_id", "v"), "v", 2, "list_id")
          .count()
      }
      f" flat_train_s=$tFlat%7.2f flat_driver_b=$flatBytes%10d"
    } else " flat=skipped"
    println(f"[scale-r10] dedup mult=$mult%3d n=$n%8d nlist=$nlist%6d " +
      f"k1=${model.k1}%4d k2=${model.k2}%4d hier_train_s=$tTrain%7.2f " +
      f"probe_assign_s=$tAssign%6.2f cand=$nCand%8d " +
      f"driver_b=$driverBytes%8d vs_flat_b=$flatBytes%10d$flat")
    all.unpersist()
  }

  private def annQuantizer(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.{HierQuantizer, Similarity}
    val all = amplifiedVecs(spark, d, mult).cache()
    val (n, _) = timed(all.count())
    val dim = 64
    val nlist = Similarity.nlistAnnForCorpus(n)
    val (model, tTrain) = timed {
      val m = HierQuantizer.train(spark, all.select("vec_id", "v"), n, nlist)
      m.subs.count()
      m
    }
    // full-corpus single-cell assignment — the index-build pass every
    // IVF variant pays; per-vector work k1 + 2·k2 (vs flat nlist)
    val (nAssigned, tAssign) = timed {
      HierQuantizer.assignCells(model, all.select("vec_id", "v"),
        soft = 1, s1 = 2, "list_id").count()
    }
    val perVec = model.k1 + 2 * model.k2
    println(f"[scale-r10] ann   mult=$mult%3d n=$n%8d nlist=$nlist%6d " +
      f"k1=${model.k1}%4d k2=${model.k2}%4d train_s=$tTrain%7.2f " +
      f"corpus_assign_s=$tAssign%7.2f assigned=$nAssigned%8d " +
      f"scored_per_vec=$perVec%5d vs_flat=$nlist%6d " +
      f"driver_b=${model.k1.toLong * dim * 8}%8d")
    all.unpersist()
  }
}

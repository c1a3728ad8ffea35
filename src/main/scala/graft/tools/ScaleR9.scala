package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 scale measurements (VERDICT r8 #1 and #3).
  *
  * 1. `gate` — the sampled semantic-dedup gate's cost curve: the r9
  *    registry replaces every full-corpus quadratic exact stage with
  *    the same law over a deterministic Lehmer-mix probe set
  *    ([[graft.similarity.Similarity.probeBuckets]]). The prediction
  *    under ×64 corpus growth: the probe set stays ~1–2k rows, the
  *    exact all-pairs stage and the whole gate stay FLAT, while the
  *    pre-r9 full-pairs law (measured here at small multipliers for
  *    contrast) grows quadratically.
  *
  * 2. `er` / `lpa` — the ScaleR8 phase-bracketed diagnoses re-run
  *    under the data-proportional partition POLICY instead of a
  *    pinned 32: SCALE.md §r8's "frozen shuffle partitions" lesson
  *    (ER 256× read ×8.1 pinned, ×4.5 with partitions ∝ data,
  *    hand-set) becomes the tool's default — initial shuffle
  *    partitions scale with the input multiplier and AQE's
  *    target-size coalescing merges what lands small, the same two
  *    decisions a real deployment (or a 1000-executor cluster with
  *    AQE) makes. Measurement code is ScaleR8's, unchanged — only
  *    the knob policy differs, so the numbers are comparable.
  *
  * Run: `SCALE_R9_MULTS=1,4,16,64,256
  * sbt "runMain graft.tools.ScaleR9 [gate|er|lpa|all]"`.
  * Results land in SCALE.md §round-9.
  */
object ScaleR9 {

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
    val mults = sys.env.get("SCALE_R9_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16, 64))
    // Partition POLICIES under measurement (SCALE_R9_POLICY):
    //  - rows32: partitions = 32·mult — per-partition ROWS constant
    //    from the 1× baseline. Measured to OVERSHOOT: 32 partitions
    //    at 1× is already latency-provisioned (2×cores), so scaling
    //    it linearly lands partitions at ~1 MB by 64× and scheduling
    //    overhead dominates.
    //  - bytes:  partitions = max(32, mult) — per-partition shuffle
    //    BYTES ≈ constant (the 16.5 GB 256× verify shuffle / 256
    //    ≈ 64 MB, AQE's advisory target). The formula a deployment
    //    derives from data volume, not a hand-set count.
    //  - aqe:    partitions = 4096 everywhere + parallelismFirst=false,
    //    so AQE's target-size coalescing picks the count at runtime
    //    from actual shuffle sizes — the zero-knob production answer.
    val policy = sys.env.getOrElse("SCALE_R9_POLICY", "bytes")
    for (mult <- mults) {
      val parts = policy match {
        case "rows32" => math.max(32, 32 * mult)
        case "bytes"  => math.max(32, mult)
        case "aqe"    => 4096
        case p => throw new IllegalArgumentException(s"unknown policy $p")
      }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        (policy != "aqe").toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      println(s"\n[scale-r9] mult=$mult policy=$policy shuffle.partitions=$parts")
      if (which == "gate" || which == "all") gateCost(spark, d, mult)
      if (which == "er" || which == "all") ScaleR8.erDiagnose(spark, d, mult)
      if (which == "lpa" || which == "all") ScaleR8.lpaDiagnose(spark, d, mult)
    }
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Amplified embeddings: disjoint id-shifted copies (the ScaleR7/R8
    * amplification recipe) — per-copy vector values unchanged, so the
    * cosine work per pair is the production kernel's. */
  private def amplifiedVecs(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    (0 until mult).map { i =>
      Tables.embeddings(spark, d).select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    }.reduce(_ unionByName _)
  }

  /** One gate-cost row per multiplier: probe-set size, the sampled
    * exact stage (pairs among the probe set), and the whole gate tail
    * (pairs → CC → survivors), plus the pre-r9 full-pairs law at small
    * multipliers for the quadratic contrast. */
  private def gateCost(spark: SparkSession, d: String, mult: Int): Unit = {
    import graft.similarity.Similarity
    val all = amplifiedVecs(spark, d, mult).cache()
    val (n, _) = timed(all.count())
    val b = Similarity.probeBuckets(n)
    // the production probe discipline: full-parallelism corpus scan,
    // then the bounded probe set compacts into a model-sized partition
    // count (Similarity.probeFrame) — without it the ~1k-row frame
    // inherits the corpus's partitioning and the CC rounds re-schedule
    // thousands of near-empty tasks per iteration
    val (probe, tProbe0) = timed(Similarity.probeFrame(all, b))
    val (np, tProbe1) = timed(probe.count())
    val tProbe = tProbe0 + tProbe1
    val (nPairs, tExact) = timed(Similarity.exactPairsAmong(probe, 0.4).count())
    val (nSurv, tGate) = timed {
      val pairs = Similarity.exactPairsAmong(probe, 0.4)
      graft.dedup.Dedup
        .clusterLabels(probe.select(col("vec_id").as("doc_id")), pairs)
        .filter(col("doc_id") === col("cluster_id")).count()
    }
    // the pre-r9 law (full-corpus all-pairs), small multipliers only —
    // the sampled gate exists so this never runs at scale
    val full = if (mult <= 4) {
      val (nF, tF) = timed(Similarity.exactPairsAmong(all, 0.4).count())
      f" full_pairs=$nF%9d full_s=$tF%7.2f"
    } else " full_pairs=skipped"
    println(f"[scale-r9] gate mult=$mult%3d n=$n%8d buckets=$b%4d " +
      f"probe=$np%5d probe_s=$tProbe%6.2f exact_pairs=$nPairs%7d " +
      f"exact_s=$tExact%6.2f survivors=$nSurv%5d gate_s=$tGate%6.2f$full")
    all.unpersist(); probe.unpersist()
  }
}

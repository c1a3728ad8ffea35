package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GroupRank
import graft.tools.Amplify.{amplifiedDocStats, bytesPolicy, mults, timed}

/** Round-14 (r13-authored) scale measurements — the two open
  * measurement items from VERDICT r12:
  *
  *  - `sketchparts` (#2): the SAMPLED boundary sketch at ≥10⁴ requested
  *    parts. GroupRank.boundarySketch's scaladoc claims the bytes-tuned
  *    10⁴–10⁵-parts regime; the r12 keyedparts octave stopped at 1024
  *    requested parts. One octave at ≥20M rows with requested = 10240
  *    (ε = 1/40960): sketch wall time, distinct boundary count, and a
  *    full keyed-vs-pinned rank compare (mismatches must be 0). The
  *    rank primary is a CONTINUOUS quality-score shape (n_chars plus a
  *    deterministic doc_id jitter, ~520k distinct values) so the probe
  *    resolution is genuinely exercised instead of value-limited the
  *    way raw n_chars (523 values) is; the n_chars sketch is printed
  *    alongside for the value-limited comparison point.
  *  - `packing2d` (#3): the MULTI-COLUMN stratum axis under octave
  *    growth. pack_by_length is the only registered 2-column-group
  *    keyed query and the r12 packing sweep measured only the
  *    single-axis family. Same table shape as §r12: window form
  *    (PARTITION BY source, quartile — 80 strata, so the collapse is
  *    4× milder than the 20-source axis, which is exactly why it needs
  *    its own row) vs the keyed contiguousFill, both reading ONE shared
  *    persisted quartile-binned input; mismatches must be 0.
  *  - `bestfit` (r13 addition): the new blocked best-fit-decreasing
  *    packer itself under octave growth — wall time (rank + chunk +
  *    fold), bins opened, and the capacity invariant (no multi-doc bin
  *    above PackBin) asserted at every octave; parallelism is #chunks,
  *    so the fold must scale like the scan, not like the strata.
  *
  * `sbt "runMain graft.tools.ScaleR14 <sketchparts|packing2d|bestfit>"`;
  * octaves via SCALE_R14_MULTS, sketch resolution via SCALE_R14_PARTS.
  * Unknown modes fail loud. Results land in SCALE.md §round-13.
  */
object ScaleR14 {

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
    val which = args.headOption.getOrElse("packing2d")
    require(Set("sketchparts", "packing2d", "bestfit")(which),
      s"unknown mode '$which' — expected sketchparts|packing2d|bestfit")
    which match {
      case "sketchparts" => sketchParts(spark, d)
      case "packing2d"   => packing2d(spark, d)
      case "bestfit"     => bestfit(spark, d)
    }
    spark.stop()
  }

  // --------------------------------------------------- sketchparts --

  private def sketchParts(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    val requested = sys.env.get("SCALE_R14_PARTS").map(_.toInt)
      .getOrElse(10240)
    for (mult <- mults("SCALE_R14_MULTS", Seq(4096))) {
      bytesPolicy(spark, mult * baseRows, 1200L)
      // the continuous-primary shape a quality-score rank has: length
      // plus a deterministic sub-integer jitter — ~523 × 997 distinct
      // values, far above the requested probe count, so the ε =
      // 1/(4·parts) resolution claim is actually on trial
      val docs = amplifiedDocStats(spark, d, mult)
        .withColumn("score",
          col("n_chars") + pmod(col("doc_id"), lit(997)) / lit(997.0))
        .select(col("doc_id"), col("source"), col("n_chars"), col("score"))
      docs.persist()
      val n = docs.count()
      val scoreDistinct = docs.select("score").distinct().count()
      // the sketch alone, both key shapes (the sampled path: requested
      // > SketchDirectParts ⇒ 2²¹-row cap applies at these octaves)
      val keyedScore = docs.withColumn("__k", col("score"))
      val (bsScore, tScore) = timed(
        GroupRank.boundarySketch(keyedScore, "__k", requested))
      val keyedChars = docs.withColumn("__k", col("n_chars").cast("double"))
      val (bsChars, tChars) = timed(
        GroupRank.boundarySketch(keyedChars, "__k", requested))
      // end-to-end rank equality at the 10⁴-part resolution: keyed
      // bucket form vs the pinned range-shuffle reference
      val (keyedRes, tKeyed) = timed(GroupRank.withGroupRankBy(
        docs, Seq("source"), col("score"), primaryDesc = false,
        col("doc_id"), "rk", partitions = requested, groupBound = 64))
      val (keyedAgg, tKeyedRun) = timed(
        keyedRes.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      val (pinned, tPinned) = timed(GroupRank.withGroupRank(
        docs, Seq("source"), Seq(col("score"), col("doc_id")), "rk",
        partitions = requested))
      val (pinnedAgg, tPinnedRun) = timed(
        pinned.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      require(keyedAgg.getLong(0) == pinnedAgg.getLong(0) &&
        keyedAgg.getLong(1) == pinnedAgg.getLong(1),
        s"keyed/pinned count or rank mass differ at mult=$mult")
      val mismatches = keyedRes.select(col("doc_id"), col("rk"))
        .join(pinned.select(col("doc_id"), col("rk").as("rk2")), "doc_id")
        .filter(col("rk") =!= col("rk2")).count()
      println(f"[scale-r14-sketchparts] mult=$mult%5d rows=$n%9d " +
        f"req_parts=$requested%5d score_distinct=$scoreDistinct%7d " +
        f"score_bounds=${bsScore.size}%5d score_sketch_s=$tScore%6.2f " +
        f"chars_bounds=${bsChars.size}%4d chars_sketch_s=$tChars%6.2f " +
        f"keyed_s=${tKeyed + tKeyedRun}%7.2f " +
        f"pinned_s=${tPinned + tPinnedRun}%7.2f mismatches=$mismatches")
      require(mismatches == 0L, "keyed and pinned ranks must agree")
      docs.unpersist()
    }
  }

  /** The shared per-octave input of the packing modes: narrow
    * amplified stats quartile-binned to the (source, quartile) strata —
    * ONE recipe, so the modes cannot silently measure different
    * inputs (the narrow-amplification discipline lives in one place). */
  private def binnedStats(spark: SparkSession, d: String,
      mult: Int): DataFrame =
    graft.queries.Extended.quartileBinsOf(
      amplifiedDocStats(spark, d, mult),
      4).select("doc_id", "source", "quartile", "n_tokens")

  // ----------------------------------------------------- packing2d --

  /** The window form of the (source, quartile) exclusive prefix — the
    * shape the plan-shape law forbids, kept ONLY as the measurement
    * reference (the 2-column twin of ScaleR13.packingWindow). */
  private def fillWindow(binned: DataFrame): DataFrame = {
    val B = graft.text.TextAnalysis.PackBin
    val w = Window.partitionBy(col("source"), col("quartile"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    binned
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tokens_before div $B"))
      .select("source", "quartile", "doc_id", "n_tokens",
        "tokens_before", "pack_id")
  }

  private def packing2d(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    // warmup (JIT + codegen) outside the measured octaves
    graft.text.TextAnalysis.packByLength(spark, d)
      .agg(sum(col("pack_id"))).collect()
    for (mult <- mults("SCALE_R14_MULTS", Seq(256, 4096, 16384))) {
      val parts = bytesPolicy(spark, mult * baseRows, 1200L)
      // ONE shared quartile-binned input (the stage common to both
      // forms), persisted so the A/B charges only the prefix stage;
      // narrow amplification: ranking only needs the length stats, so
      // the text payload never enters the copy fan-out's exchange
      // (the text-carrying form filled the disk at x65536)
      val binned = binnedStats(spark, d, mult)
      binned.persist()
      val n = binned.count()
      // construction timed apart from the run (the keyed form's eager
      // sketch/counts passes are part of its cost), and each frame is
      // built ONCE — the mismatch check below reuses it instead of
      // paying a second untimed construction
      val (winFrame, tWinBuild) = timed(fillWindow(binned))
      val (winSum, tWinRun) = timed(winFrame
        .agg(sum(col("tokens_before")), count(lit(1))).collect()(0))
      val (keyedFrame, tKeyedBuild) = timed(
        graft.text.TextAnalysis.contiguousFill(binned,
          Seq("source", "quartile"), col("doc_id"), col("doc_id"),
          col("n_tokens"), groupBound = 256))
      val (keyedSum, tKeyedRun) = timed(keyedFrame
        .agg(sum(col("tokens_before")), count(lit(1))).collect()(0))
      require(winSum.getLong(0) == keyedSum.getLong(0) &&
        winSum.getLong(1) == keyedSum.getLong(1),
        s"window and keyed 2-col packing disagree at mult=$mult")
      val mismatches = if (mult <= 256) {
        keyedFrame.select(col("doc_id"), col("tokens_before"))
          .join(winFrame
            .select(col("doc_id"), col("tokens_before").as("tb2")),
            "doc_id")
          .filter(col("tokens_before") =!= col("tb2")).count()
      } else -1L
      println(f"[scale-r14-packing2d] mult=$mult%5d rows=$n%9d " +
        f"parts=$parts%4d strata=80 window_s=${tWinBuild + tWinRun}%7.2f " +
        f"keyed_s=${tKeyedBuild + tKeyedRun}%7.2f mismatches=$mismatches%d")
      require(mismatches <= 0L, "row-level 2-col packing mismatch")
      binned.unpersist()
    }
  }

  // -------------------------------------------------------- bestfit --

  private def bestfit(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    val B = graft.text.TextAnalysis.PackBin
    val C = graft.text.TextAnalysis.BestFitChunk
    // warmup (JIT + codegen) outside the measured octaves
    graft.text.TextAnalysis.packBestFit(spark, d)
      .agg(sum(col("pack_id"))).collect()
    for (mult <- mults("SCALE_R14_MULTS", Seq(256, 4096, 16384))) {
      val parts = bytesPolicy(spark, mult * baseRows, 1200L)
      val binned = binnedStats(spark, d, mult)
      binned.persist()
      val n = binned.count()
      // NOTE: packBestFitOf wraps its input in a Staged scope whose
      // listener releases THIS persist after the first collect on bf —
      // fine here (nothing reads binned afterwards), but any
      // post-collect reuse of binned must re-persist or it replays the
      // amplification unstaged
      val (bf, tBuild) = timed(
        graft.text.TextAnalysis.packBestFitOf(binned, C))
      // one aggregate answers cost AND the capacity invariant: every
      // bin's load ≤ B unless it is a singleton oversize bin
      val (agg, tRun) = timed(bf
        .groupBy("source", "quartile", "pack_id")
        .agg(sum(col("n_tokens")).as("load"), count(lit(1)).as("docs"))
        .agg(count(lit(1)).as("bins"),
          sum(when(col("load") > B && col("docs") > 1, 1L)
            .otherwise(0L)).as("overfull_multi"),
          sum(col("docs")).as("docs_total"))
        .collect()(0))
      val bins = agg.getLong(0)
      val overfull = agg.getLong(1)
      val docsTotal = agg.getLong(2)
      println(f"[scale-r14-bestfit] mult=$mult%5d rows=$n%9d " +
        f"parts=$parts%4d chunk=$C%3d bestfit_s=${tBuild + tRun}%7.2f " +
        f"bins=$bins%9d overfull_multi=$overfull%d")
      require(overfull == 0L && docsTotal == n,
        s"capacity invariant violated at mult=$mult")
      binned.unpersist()
    }
  }
}

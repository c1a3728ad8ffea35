package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GroupRank
import graft.text.TextAnalysis
import graft.tools.Amplify.{amplifiedDocStats, bytesPolicy, mults, timed}

/** Round-14 scale measurements — the three open measurement items from
  * VERDICT r13:
  *
  *  - `bestfitab` (#3): the BFD fold's ~7× constant, bought down. The
  *    r13 fold was a Catalyst `aggregate` HOF (interpreted, rebuilds
  *    the immutable loads array per step); r14 replaces it with
  *    [[graft.functions.BestFitPackExpr]] (the identical O(C·bins)
  *    loop over primitive arrays). This mode A/Bs the HOF form (kept
  *    here as the measurement reference, the `fillWindow` precedent)
  *    against the shipped expression form at the ×4096 octave, plus a
  *    chunk-width sweep 128/256/512 on the expression form; row-level
  *    equality asserted at ×256, count+bin-mass at every octave.
  *  - `tradeoff` (#2): drive `pack_tradeoff`'s A/B to the regime where
  *    the trade is visible. At sf0.01 every stratum fits a handful of
  *    bins (bins_ratio_ppm ≡ 10⁶, oversize ≡ 0). Amplified octaves
  *    with ~1% of docs inflated past PackBin make strata span many
  *    bins AND contain oversize docs: the table records where
  *    `packs_bestfit > packs_contig` (fragmentation, ratio > 10⁶)
  *    while `straddles_contig > 0` (splits) — both sides of the
  *    frontier nonzero.
  *  - `sketchparts17` (#5): the ADAPTIVE sample cap past the 2¹⁶
  *    noise-floor edge. r13 measured 2¹⁶ parts landing exactly on the
  *    2⁵-samples-per-bucket floor with the fixed 2²¹ cap;
  *    `sketchSampleCap` now rises as parts·2⁵, and this mode runs 2¹⁷
  *    requested parts over 20.48M rows (cap 2²², still 2⁵ per bucket)
  *    — all boundaries must resolve and ranks must match the pinned
  *    reference. The pinned form runs at 1024 partitions: ranks are
  *    partition-count-invariant, and r13 already measured the pinned
  *    range shuffle's growth in parts (160 s at 2¹⁶) — re-paying it
  *    at 2¹⁷ would measure nothing new.
  *
  * `sbt "runMain graft.tools.ScaleR15 <bestfitab|tradeoff|sketchparts17>"`;
  * octaves via SCALE_R15_MULTS. Unknown modes fail loud. Results land
  * in SCALE.md §round-14.
  */
object ScaleR15 {

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
    val which = args.headOption.getOrElse("bestfitab")
    require(Set("bestfitab", "tradeoff", "sketchparts17", "kmv")(which),
      s"unknown mode '$which' — expected bestfitab|tradeoff|sketchparts17|kmv")
    which match {
      case "bestfitab"     => bestfitAb(spark, d)
      case "tradeoff"      => tradeoff(spark, d)
      case "sketchparts17" => sketchParts17(spark, d)
      case "kmv"           => kmv(spark, d)
    }
    spark.stop()
  }

  /** Shared per-octave input (ScaleR14's recipe): narrow amplified
    * stats quartile-binned to the (source, quartile) strata. */
  private def binnedStats(spark: SparkSession, d: String,
      mult: Int): DataFrame =
    graft.queries.Extended.quartileBinsOf(
      amplifiedDocStats(spark, d, mult),
      4).select("doc_id", "source", "quartile", "n_tokens")

  // ----------------------------------------------------- bestfitab --

  /** The r13 `aggregate`-HOF fold, verbatim — kept ONLY as the A/B
    * measurement reference for the expression form that replaced it
    * (TextAnalysis.packBestFitCore cites this mode). */
  private def bestfitHof(binned: DataFrame, chunkDocs: Int): DataFrame = {
    val B = TextAnalysis.PackBin
    val bestLoad = s"array_max(filter(acc.loads, l -> l + d.n_tokens <= $B))"
    GroupRank.withGroupRankBy(binned,
        Seq("source", "quartile"), col("n_tokens"), primaryDesc = true,
        col("doc_id"), "rk", groupBound = 256)
      .withColumn("chunk", expr(s"(rk - 1) div $chunkDocs"))
      .groupBy("source", "quartile", "chunk")
      .agg(array_sort(collect_list(struct(col("rk"), col("doc_id"),
        col("n_tokens")))).as("docs"))
      .withColumn("bins", expr(
        s"""aggregate(docs,
           |  named_struct(
           |    'loads', cast(array() as array<bigint>),
           |    'bins',  cast(array() as array<bigint>)),
           |  (acc, d) -> named_struct(
           |    'loads', case when $bestLoad is null
           |      then concat(acc.loads, array(d.n_tokens))
           |      else transform(acc.loads, (l, i) ->
           |        if(i = cast(array_position(acc.loads, $bestLoad) as int) - 1,
           |           l + d.n_tokens, l)) end,
           |    'bins', concat(acc.bins, array(case when $bestLoad is null
           |      then cast(size(acc.loads) as bigint)
           |      else array_position(acc.loads, $bestLoad) - 1 end))),
           |  acc -> acc.bins)""".stripMargin))
      .select(col("source"), col("quartile"), col("chunk"),
        explode(arrays_zip(col("docs"), col("bins"))).as("z"))
      .select(col("source"), col("quartile"),
        col("z.docs.doc_id").as("doc_id"),
        col("z.docs.n_tokens").as("n_tokens"),
        (col("chunk") * chunkDocs + col("z.bins")).as("pack_id"))
  }

  private def packAggregate(df: DataFrame): (Long, Long, Long) = {
    val r = df.groupBy("source", "quartile", "pack_id")
      .agg(sum(col("n_tokens")).as("load"), count(lit(1)).as("docs"))
      .agg(count(lit(1)).as("bins"),
        sum(when(col("load") > TextAnalysis.PackBin && col("docs") > 1, 1L)
          .otherwise(0L)).as("overfull_multi"),
        sum(col("docs")).as("docs_total"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def bestfitAb(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    // warmup (JIT + codegen) outside the measured octaves
    TextAnalysis.packBestFit(spark, d).agg(sum(col("pack_id"))).collect()
    for (mult <- mults("SCALE_R15_MULTS", Seq(256, 4096))) {
      val parts = bytesPolicy(spark, mult * baseRows, 1200L)
      val binned = binnedStats(spark, d, mult)
      // packBestFitOf's Staged scope RELEASES the shared persist after
      // each run's terminal action (the documented ScaleR14 gotcha) —
      // and the release fires ASYNC on the listener bus, so a naive
      // re-persist can be unpersisted from under the next run. Every
      // timed run therefore first AWAITS the pending release (when one
      // is pending — awaiting unconditionally would spin the full
      // deadline on the never-released first persist), then re-stages
      // and re-materializes; a deadline miss fails LOUD, because
      // proceeding would reintroduce the exact cache-state-vs-fold
      // confound the await exists to remove (r14 review).
      var releasePending = false
      def restage(): Long = {
        if (releasePending) {
          val deadline = System.currentTimeMillis() + 30000
          while (binned.storageLevel !=
              org.apache.spark.storage.StorageLevel.NONE &&
              System.currentTimeMillis() < deadline)
            Thread.sleep(50)
          require(binned.storageLevel ==
            org.apache.spark.storage.StorageLevel.NONE,
            "Staged release did not fire within 30 s — aborting the A/B " +
              "rather than timing against an undefined cache state")
        }
        binned.persist()
        binned.count()
      }
      val n = restage()
      // expression form at the shipped width, then the width sweep
      val runs = for (c <- Seq(128, 256, 512)) yield {
        restage()
        val (bf, tBuild) = timed(TextAnalysis.packBestFitOf(binned, c))
        val ((bins, overfull, docs), tRun) = timed(packAggregate(bf))
        releasePending = true // this run's scope will release binned
        require(overfull == 0L && docs == n,
          s"capacity invariant violated at mult=$mult chunk=$c")
        (c, tBuild + tRun, bins)
      }
      // the HOF reference at the shipped width (no Staged scope of its
      // own, so restage() keeps its cache state identical to the runs)
      restage()
      releasePending = false // bestfitHof arms no scope
      val (hof, tHofBuild) = timed(
        bestfitHof(binned, TextAnalysis.BestFitChunk))
      val ((hofBins, hofOverfull, hofDocs), tHofRun) = timed(
        packAggregate(hof))
      require(hofOverfull == 0L && hofDocs == n, "HOF capacity violated")
      require(hofBins == runs(1)._3,
        s"HOF and expression bin counts differ at mult=$mult")
      // row-level equality at the cheap octave; placement must be
      // IDENTICAL doc by doc, not just equinumerous
      val mismatches = if (mult <= 256) {
        TextAnalysis.packBestFitOf(binned, TextAnalysis.BestFitChunk)
          .select(col("doc_id"), col("pack_id"))
          .join(hof.select(col("doc_id"), col("pack_id").as("p2")),
            "doc_id")
          .filter(col("pack_id") =!= col("p2")).count()
      } else -1L
      val widths = runs.map { case (c, t, b) =>
        f"c$c%d=${t}%6.2fs/${b}%d bins" }.mkString("  ")
      println(f"[scale-r15-bestfitab] mult=$mult%5d rows=$n%9d " +
        f"parts=$parts%4d $widths  " +
        f"hof_c256=${tHofBuild + tHofRun}%6.2fs/${hofBins}%d bins " +
        f"mismatches=$mismatches%d")
      require(mismatches <= 0L, "expression and HOF folds must agree")
      binned.unpersist()
    }
  }

  // ------------------------------------------------------ tradeoff --

  private def tradeoff(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    val B = TextAnalysis.PackBin
    for (mult <- mults("SCALE_R15_MULTS", Seq(16, 256, 1024))) {
      bytesPolicy(spark, mult * baseRows, 1200L)
      // ~1% of docs inflated past PackBin: the oversize column gets
      // real mass, and strata span many bins at any octave
      val binned = binnedStats(spark, d, mult)
        .withColumn("n_tokens",
          when(pmod(col("doc_id"), lit(97)) === 0,
            col("n_tokens") + lit(600L)).otherwise(col("n_tokens")))
      val n = mult * baseRows
      val (rows, t) = timed(
        TextAnalysis.packTradeoffOf(binned, BigInt(n) * 40).collect())
      val packsContig = rows.map(_.getAs[Long]("packs_contig")).sum
      val straddles = rows.map(_.getAs[Long]("straddles_contig")).sum
      val packsBf = rows.map(_.getAs[Long]("packs_bestfit")).sum
      val oversize = rows.map(_.getAs[Long]("oversize_bestfit")).sum
      val ppm = rows.map(_.getAs[Long]("bins_ratio_ppm"))
      println(f"[scale-r15-tradeoff] mult=$mult%5d rows=$n%9d t=$t%7.2f " +
        f"packs_contig=$packsContig%9d straddles_contig=$straddles%8d " +
        f"packs_bestfit=$packsBf%9d oversize_bestfit=$oversize%7d " +
        f"ppm_min=${ppm.min}%d ppm_max=${ppm.max}%d")
      require(rows.length == 20, s"expected 20 source rows, got ${rows.length}")
    }
  }

  // -------------------------------------------------- sketchparts17 --

  private def sketchParts17(spark: SparkSession, d: String): Unit = {
    val baseRows = Tables.documents(spark, d).count()
    val requested = sys.env.get("SCALE_R15_PARTS").map(_.toInt)
      .getOrElse(1 << 17)
    for (mult <- mults("SCALE_R15_MULTS", Seq(4096))) {
      bytesPolicy(spark, mult * baseRows, 1200L)
      // finer jitter than ScaleR14's 997: 2¹⁷ boundaries need well
      // over 2¹⁷ distinct key values for "all boundaries resolved" to
      // be a statement about the SKETCH rather than the key's value
      // count (523 × 9973 ≈ 5.2M distinct values, ~40 per boundary)
      val docs = amplifiedDocStats(spark, d, mult)
        .withColumn("score",
          col("n_chars") + pmod(col("doc_id"), lit(9973)) / lit(9973.0))
        .select(col("doc_id"), col("source"), col("score"))
      docs.persist()
      val n = docs.count()
      val cap = GroupRank.sketchSampleCap(requested)
      val keyed = docs.withColumn("__k", col("score"))
      val (bs, tSketch) = timed(
        GroupRank.boundarySketch(keyed, "__k", requested))
      val (keyedRes, tKeyed) = timed(GroupRank.withGroupRankBy(
        docs, Seq("source"), col("score"), primaryDesc = false,
        col("doc_id"), "rk", partitions = requested, groupBound = 64))
      val (keyedAgg, tKeyedRun) = timed(
        keyedRes.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      // pinned reference at 1024 partitions: ranks are partition-
      // count-invariant, and the pinned shuffle's cost-in-parts was
      // already measured to 2¹⁶ in SCALE.md §r13
      val (pinned, tPinned) = timed(GroupRank.withGroupRank(
        docs, Seq("source"), Seq(col("score"), col("doc_id")), "rk",
        partitions = 1024))
      val (pinnedAgg, tPinnedRun) = timed(
        pinned.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      require(keyedAgg.getLong(0) == pinnedAgg.getLong(0) &&
        keyedAgg.getLong(1) == pinnedAgg.getLong(1),
        s"keyed/pinned count or rank mass differ at mult=$mult")
      val mismatches = keyedRes.select(col("doc_id"), col("rk"))
        .join(pinned.select(col("doc_id"), col("rk").as("rk2")), "doc_id")
        .filter(col("rk") =!= col("rk2")).count()
      println(f"[scale-r15-sketchparts17] mult=$mult%5d rows=$n%9d " +
        f"req_parts=$requested%6d cap=$cap%8d " +
        f"bounds=${bs.size}%6d/${requested - 1}%6d sketch_s=$tSketch%6.2f " +
        f"keyed_s=${tKeyed + tKeyedRun}%7.2f " +
        f"pinned1024_s=${tPinned + tPinnedRun}%7.2f mismatches=$mismatches")
      require(mismatches == 0L, "keyed and pinned ranks must agree")
      docs.unpersist()
    }
  }

  // ------------------------------------------------------------ kmv --

  /** KMV/Theta overlap vs the exact self-join, octaved (r14 session 2).
    * Synthetic (source, shingle-hash) streams with CLOSED-FORM ground
    * truth: 20 sources; of each source's draws, 1/4 hit a shared
    * common pool and 3/4 a per-source private pool, with the draw
    * index m < pool so coverage never wraps — per-source distinct is
    * exactly 2000·mult and every pair's intersection exactly
    * 1000·mult. The sketch side runs the REGISTERED estimator
    * ([[graft.dedup.Dedup.kmvOverlapOfHashes]], the seam
    * `source_overlap_kmv` itself uses); the exact side is
    * `sourceOverlap`'s distinct + inverted-index self-join shape over
    * the same stream. Asserts, per octave: the exact path reproduces
    * the closed form (sanity of the A/B itself), and every sketch
    * estimate lands inside the verified gate's published bounds
    * (6/√(k−2) relative per source; 6·√(I·(1/θ−1)) + 8 per pair). */
  private def kmv(spark: SparkSession, d: String): Unit = {
    import graft.dedup.Dedup
    val S = 20
    Dedup.sourceOverlapKmv(spark, d).collect() // warmup: JIT + codegen
    for (mult <- mults("SCALE_R15_MULTS", Seq(16, 256, 1024))) {
      val rows = 80000L * mult
      val pool = 12500L * mult
      val parts = bytesPolicy(spark, rows, 32L)
      // integer `div`, not `/` (Spark's / on longs is true division)
      val stream = spark.range(rows).select(
        concat(lit("src"), (col("id") % S)).as("source"),
        when(expr(s"(id div $S) % 4") === 0,
          expr(s"(id div ${S * 4}) % $pool"))
          .otherwise(lit(pool) + (col("id") % S + 1) * pool +
            expr(s"(id div ${S * 4}) % $pool"))
          .as("key"))
        .select(col("source"), xxhash64(col("key")).as("shingle"))
      val (est, tSketch) = timed(Dedup.kmvOverlapOfHashes(stream).collect())
      val ss = stream.distinct()
      val sz = ss.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = ss.select(col("source").as("source_a"), col("shingle"))
        .join(ss.select(col("source").as("source_b"), col("shingle")), "shingle")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("exact_shared"))
      val ((szRows, interRows), tExact) = timed((sz.collect(), inter.collect()))
      val perSource = 2000L * mult
      val perPair = 1000L * mult
      require(szRows.forall(_.getLong(1) == perSource) &&
        interRows.length == S * (S - 1) / 2 &&
        interRows.forall(_.getLong(2) == perPair),
        s"exact path disagrees with the closed form at mult=$mult")
      require(est.length == S * (S - 1) / 2,
        s"estimator dropped pair rows at mult=$mult: ${est.length}")
      val k = Dedup.KmvK
      val relBound = 6.0 / math.sqrt((k - 2).toDouble)
      var worstSize = 0.0; var worstShared = 0.0
      est.foreach { r =>
        val estA = r.getAs[Double]("est_a"); val estB = r.getAs[Double]("est_b")
        val theta = r.getAs[Double]("theta_pair")
        val estI = r.getAs[Double]("est_shared")
        val errA = math.abs(estA - perSource) / perSource
        val errB = math.abs(estB - perSource) / perSource
        worstSize = math.max(worstSize, math.max(errA, errB))
        val sharedBound = 6.0 * math.sqrt(perPair * math.max(1.0 / theta - 1.0, 0.0)) + 8.0
        worstShared = math.max(worstShared, math.abs(estI - perPair) / sharedBound)
        require(errA <= relBound && errB <= relBound,
          s"per-source estimate out of bound at mult=$mult: $estA/$estB vs $perSource")
        require(math.abs(estI - perPair) <= sharedBound,
          s"pair estimate out of bound at mult=$mult: $estI vs $perPair")
      }
      println(f"[scale-r15-kmv] mult=$mult%5d rows=$rows%10d parts=$parts%4d " +
        f"distinct_per_source=$perSource%9d pair_exact=$perPair%9d " +
        f"sketch_s=$tSketch%7.2f exact_s=$tExact%7.2f " +
        f"worst_size_relerr=$worstSize%6.4f worst_shared_bound_frac=$worstShared%5.3f")
    }
  }
}

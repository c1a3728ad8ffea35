package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.GroupRank

/** Round-13 (r12-authored) scale measurements — the four open items
  * from VERDICT r11:
  *
  *  - `packing` (#1): the rerouted packing family. A/B the per-source
  *    `Window.partitionBy(source)` running sum (the r11 weak shape —
  *    one task per source) against the keyed
  *    [[GroupRank.withRunningSumBy]] form the registered queries now
  *    ship, across amplification octaves. Expected: the window form's
  *    wall time is serialized by the ~5-source axis while the keyed
  *    form scales with partitions; mismatches must be 0 at every
  *    octave.
  *  - `topk` (#2): the fixed overhead of routing exact per-query top-k
  *    through the bounded-heap [[graft.plans.TopKPerKey]] instead of a
  *    10-partition window, at ×1 (= the sf0.1 bench regime where the
  *    +20–27% showed) and ×64. Decision input: document the constant,
  *    or size-gate if it exceeds ~0.5 s/query at ×1.
  *  - `keyedparts` (#5): one keyed-rank octave at ≥10³ requested
  *    buckets, proving the ε = 1/(4·parts) boundary sketch RESOLVES at
  *    the bytes-policy part counts a real corpus wants (the r11 sweep
  *    topped out at 98 parts). Prints the sketch time and the distinct
  *    boundary count; mismatches vs the pinned reference must be 0.
  *  - `shingle` (#3): the dedup shingle `localCheckpoint` staging
  *    under octave growth — wall time plus the executor storage the
  *    checkpointed shingle/candidate frames actually occupy
  *    (`getRDDStorageInfo`), the pool-pressure axis SCALE.md §r11
  *    measured the pinned rank path failing on at ×16384.
  *
  * `sbt "runMain graft.tools.ScaleR13 <packing|topk|keyedparts|shingle>"`;
  * octaves via SCALE_R13_MULTS. Unknown modes fail loud. Results land
  * in SCALE.md §round-12.
  */
object ScaleR13 {

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
    val which = args.headOption.getOrElse("packing")
    require(Set("packing", "topk", "keyedparts", "shingle")(which),
      s"unknown mode '$which' — expected packing|topk|keyedparts|shingle")
    which match {
      case "packing"    => packing(spark, d)
      case "topk"       => topk(spark, d)
      case "keyedparts" => keyedParts(spark, d)
      case "shingle"    => shingle(spark, d)
    }
    spark.stop()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def mults(default: Seq[Int]): Seq[Int] =
    sys.env.get("SCALE_R13_MULTS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(default)

  /** Disjoint id-shifted document copies through one scan (the
    * ScaleR11/R12 shape), shift asserted past the base id range. */
  private def amplifiedDocs(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    val maxId = Tables.documents(spark, d)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    Amplify.assertClears(maxId, "doc_id")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * lit(Amplify.IdShift)).as("doc_id"),
        col("source"), col("text"))
      .repartition(parts)
  }

  private def amplifiedVecs(spark: SparkSession, d: String,
      mult: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val maxId = Tables.embeddings(spark, d)
      .agg(max(col("vec_id"))).collect()(0).getLong(0)
    Amplify.assertClears(maxId, "vec_id")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(spark.range(mult).select(col("id").as("copy")))
      // perturb copies by a deterministic epsilon so cosines are
      // tie-free across copies (the ScaleR11 mrl trick)
      .select((col("vec_id") + col("copy") * lit(Amplify.IdShift)).as("vec_id"),
        transform(col("v"), x =>
          x + (col("copy") % 97).cast("double") / lit(1e7)).as("v"))
      .repartition(parts, col("vec_id"))
  }

  /** Base-table row count for the bytes policy — counted ONCE per
    * mode from the actual SPARK_GRAFT_SF_DIR instead of a hardcoded
    * sf0.1 constant, so the sweep's parts column states the real
    * policy at any scale factor (ADVICE r12). */
  private def baseDocRows(spark: SparkSession, d: String): Long =
    Tables.documents(spark, d).count()

  private def baseVecRows(spark: SparkSession, d: String): Long =
    Tables.embeddings(spark, d).count()

  private def bytesPolicy(spark: SparkSession, rows: Long,
      bytesPerRow: Long): Int = {
    val parts = graft.GraftSession.shufflePartitionsForBytes(
      rows * bytesPerRow)
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    parts
  }

  // ------------------------------------------------------- packing --

  /** The r11 weak form, kept ONLY as the measurement reference. */
  private def packingWindow(documents: DataFrame): DataFrame = {
    val B = graft.text.TextAnalysis.PackBin
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tokens_before div $B"))
      .select("source", "doc_id", "n_tokens", "tokens_before", "pack_id")
  }

  private def packing(spark: SparkSession, d: String): Unit = {
    // warmup (JIT + codegen) outside the measured octaves
    graft.text.TextAnalysis.docPackingOf(amplifiedDocs(spark, d, 1))
      .agg(sum(col("pack_id"))).collect()
    val baseRows = baseDocRows(spark, d)
    for (mult <- mults(Seq(64, 256, 1024, 4096, 16384))) {
      val parts = bytesPolicy(spark, mult * baseRows, 1200L)
      val docs = amplifiedDocs(spark, d, mult)
      docs.persist() // both sides read the same input; charge neither
      val n = docs.count()
      val (winSum, tWin) = timed(packingWindow(docs)
        .agg(sum(col("tokens_before")), count(lit(1))).collect()(0))
      val (keyedSum, tKeyed) = timed(
        graft.text.TextAnalysis.docPackingOf(docs)
          .agg(sum(col("tokens_before")), count(lit(1))).collect()(0))
      // exact agreement: same row count and same prefix-sum mass, plus
      // a full row-level join at the lowest octave (cheap there)
      require(winSum.getLong(0) == keyedSum.getLong(0) &&
        winSum.getLong(1) == keyedSum.getLong(1),
        s"window and keyed packing disagree at mult=$mult")
      val mismatches = if (mult <= 64) {
        graft.text.TextAnalysis.docPackingOf(docs)
          .select(col("doc_id"), col("tokens_before"))
          .join(packingWindow(docs)
            .select(col("doc_id"), col("tokens_before").as("tb2")), "doc_id")
          .filter(col("tokens_before") =!= col("tb2")).count()
      } else -1L
      println(f"[scale-r13-packing] mult=$mult%5d rows=$n%9d " +
        f"parts=$parts%4d window_s=$tWin%7.2f keyed_s=$tKeyed%7.2f " +
        f"mismatches=$mismatches%d")
      require(mismatches <= 0L, "row-level packing mismatch")
      docs.unpersist()
    }
  }

  // ---------------------------------------------------------- topk --

  private def topk(spark: SparkSession, d: String): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val baseRows = baseVecRows(spark, d)
    for (mult <- mults(Seq(1, 8, 64))) {
      val parts = bytesPolicy(spark, mult * baseRows, 64 * 8L)
      val all = amplifiedVecs(spark, d, mult).persist()
      val n = all.count()
      val q = all.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val c = all.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"))
      def scored = c.join(broadcast(q))
        .withColumn("cos_sim", expr("cosine_sim(qv, cv)"))
        .select("query_id", "neighbor_id", "cos_sim")
      def windowForm = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
      }
      def heapForm = graft.plans.TopKPerKey(scored, Seq("query_id"),
        Seq(col("cos_sim").desc, col("neighbor_id").asc), k = 5)
      // alternate the order across reps so JIT/page-cache drift cannot
      // systematically favor one side; report the min of two
      def run(f: => DataFrame): Double =
        Seq.fill(2)(timed(f.agg(sum(col("neighbor_id"))).collect()(0)
          .getLong(0))).map(_._2).min
      val tHeap1 = run(heapForm)
      val tWin1 = run(windowForm)
      val tWin2 = run(windowForm)
      val tHeap2 = run(heapForm)
      val (tWin, tHeap) = (math.min(tWin1, tWin2), math.min(tHeap1, tHeap2))
      // multiset equality without a second exceptAll shuffle: equal
      // cardinality + one-directional difference = 0 ⟹ H = W (the
      // under-filled-heap case the subset check alone would miss is
      // caught by the count compare)
      val hSide = heapForm.select("query_id", "neighbor_id")
      val wSide = windowForm.select("query_id", "neighbor_id")
      val diff = math.abs(hSide.count() - wSide.count()) +
        hSide.exceptAll(wSide).count()
      println(f"[scale-r13-topk] mult=$mult%4d rows=$n%9d parts=$parts%4d " +
        f"window_s=$tWin%6.2f heap_s=$tHeap%6.2f " +
        f"heap_minus_window_s=${tHeap - tWin}%6.2f mismatches=$diff")
      require(diff == 0L, "heap and window top-k must agree")
      all.unpersist()
    }
  }

  // ---------------------------------------------------- keyedparts --

  private def keyedParts(spark: SparkSession, d: String): Unit = {
    val baseRows = baseDocRows(spark, d)
    for (mult <- mults(Seq(1024, 4096))) {
      val requested = 1024
      bytesPolicy(spark, mult * baseRows, 1200L)
      val docs = amplifiedDocs(spark, d, mult)
        .withColumn("n_chars", length(col("text")))
        .select(col("doc_id"), col("source"), col("n_chars"))
      docs.persist()
      val n = docs.count()
      // the sketch alone, at the ≥10³ requested resolution: ε =
      // 1/(4·parts) must RESOLVE the 1/parts-spaced probes — distinct
      // boundary count far above the 98-part regime r11 measured
      val keyed = docs.withColumn("__k", col("n_chars").cast("double"))
      // the key's own cardinality bounds the distinct boundary count —
      // print it so "505 of 1023" reads as value-limited, not collapse
      val kDistinct = docs.select("n_chars").distinct().count()
      val (bs, tSketch) = timed(
        GroupRank.boundarySketch(keyed, "__k", requested))
      val (keyedRes, tKeyed) = timed(GroupRank.withGroupRankBy(
        docs, Seq("source"), col("n_chars"), primaryDesc = false,
        col("doc_id"), "rk", partitions = requested, groupBound = 64))
      val (keyedAgg, tKeyedRun) = timed(
        keyedRes.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      val (pinned, tPinned) = timed(GroupRank.withGroupRank(
        docs, Seq("source"), Seq(col("n_chars"), col("doc_id")), "rk",
        partitions = requested))
      val (pinnedAgg, tPinnedRun) = timed(
        pinned.agg(count(lit(1)), sum(col("rk"))).collect()(0))
      // an inner join alone is subset-blind (dropped rows would read as
      // 0 mismatches): assert cardinality + rank-mass equality too
      require(keyedAgg.getLong(0) == pinnedAgg.getLong(0) &&
        keyedAgg.getLong(1) == pinnedAgg.getLong(1),
        s"keyed/pinned count or rank mass differ at mult=$mult")
      val mismatches = keyedRes.select(col("doc_id"), col("rk"))
        .join(pinned.select(col("doc_id"), col("rk").as("rk2")), "doc_id")
        .filter(col("rk") =!= col("rk2")).count()
      println(f"[scale-r13-keyedparts] mult=$mult%5d rows=$n%9d " +
        f"req_parts=$requested%4d boundaries=${bs.size}%4d " +
        f"key_distinct=$kDistinct%5d " +
        f"sketch_s=$tSketch%6.2f keyed_s=${tKeyed + tKeyedRun}%7.2f " +
        f"pinned_s=${tPinned + tPinnedRun}%7.2f mismatches=$mismatches")
      require(mismatches == 0L, "keyed and pinned ranks must agree")
      docs.unpersist()
    }
  }

  // ------------------------------------------------------- shingle --

  private def shingle(spark: SparkSession, d: String): Unit = {
    val baseRows = baseDocRows(spark, d)
    for (mult <- mults(Seq(4, 16, 64))) {
      val parts = bytesPolicy(spark, mult * baseRows, 1200L)
      // copies must NOT be near-duplicates of each other (identical
      // text would make every copy pair a jaccard-1.0 candidate —
      // quadratic pairs, nothing like real corpus growth; the first
      // run of this sweep filled the disk that way). Suffix every
      // TOKEN with a separator + the copy index: all shingles differ
      // across copies, within-copy dup structure is preserved, pairs
      // grow linearly. The \u0001 separator makes the suffix
      // prefix-free — bare concat is not ("x1"+copy 0 = "x"+copy 10),
      // and digit-final tokens would fabricate cross-copy matches.
      val docs = amplifiedDocs(spark, d, mult)
        .withColumn("copy",
          expr(s"cast(doc_id div ${Amplify.IdShift} as string)"))
        .select(col("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("\u0001"), col("copy"))), " ").as("text"))
        .persist()
      val n = docs.count()
      val (pairs, tLsh) = timed(
        graft.dedup.Dedup.minhashLshOf(docs).count())
      // the checkpointed shingle/candidate frames' executor storage —
      // the pool the ×16384 pinned-rank octave saturated (SCALE.md
      // §r11); localCheckpoint blocks stay until the frames are GC'd
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / 1e9
      val disk = infos.map(_.diskSize).sum / 1e9
      println(f"[scale-r13-shingle] mult=$mult%4d rows=$n%9d " +
        f"parts=$parts%4d lsh_s=$tLsh%7.2f pairs=$pairs%6d " +
        f"ckpt_mem_gb=$mem%6.3f ckpt_disk_gb=$disk%6.3f")
      docs.unpersist()
      System.gc() // release checkpoint blocks between octaves
    }
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tools.Amplify.{bytesPolicy, mults, timed}

/** Round-15 scale measurements — the open measurement items from
  * VERDICT r14:
  *
  *  - `novelty` (#2): the Theta-algebra completion. Same synthetic
  *    shared+private-pool streams as ScaleR15 `kmv` (closed-form
  *    ground truth: per-source distinct 2000·mult, every pairwise
  *    intersection 1000·mult ⇒ novelty 1000·mult, union 3000·mult);
  *    drives the REGISTERED [[graft.dedup.Dedup.kmvNoveltyOfHashes]]
  *    seam and asserts every ordered-pair difference/union estimate
  *    inside the verified gate's published binomial-thinning bounds.
  *  - `bitext` (#1): exact-vs-IVF A/B for the margin miner with
  *    MEASURED recall per octave — the treatment the ANN floors got.
  *    Two-sided vector corpora amplified past the exact scorer's
  *    comfort; per octave: exact miner pairs + time, IVF-shortlist
  *    pairs + time, recall of the IVF form against the exact pair
  *    set. Feeds the tightened `BitextIvfFloor`.
  *  - `ppskeyed` (#4): `sample_pps` through the KEYED running-sum arm
  *    (the 100 TB plan shape) at amplified octaves — the gate routes
  *    the bench-scale query to the window arm, so the keyed path's
  *    pick-count exactness is asserted here: exactly PpsPerSource
  *    picks per source and fold-equality against an independent
  *    recompute at ≥ 20 M rows.
  *
  * `sbt "runMain graft.tools.ScaleR16 <novelty|bitext|ppskeyed>"`;
  * octaves via SCALE_R16_MULTS. Unknown modes fail loud. Results land
  * in SCALE.md §round-15.
  */
object ScaleR16 {

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
    val which = args.headOption.getOrElse("novelty")
    require(Set("novelty", "bitext", "ppskeyed")(which),
      s"unknown mode '$which' — expected novelty|bitext|ppskeyed")
    which match {
      case "novelty"  => novelty(spark, d)
      case "bitext"   => bitext(spark, d)
      case "ppskeyed" => ppsKeyed(spark, d)
    }
    spark.stop()
  }

  /** ScaleR15 `kmv`'s synthetic stream, shared verbatim: 20 sources,
    * 1/4 of draws from a common pool, 3/4 per-source private, draw
    * index never wrapping — per-source distinct exactly 2000·mult,
    * every pairwise intersection exactly 1000·mult. */
  private def kmvStream(spark: SparkSession, mult: Int,
      sources: Int): DataFrame = {
    val S = sources
    val rows = 80000L * mult
    val pool = 12500L * mult
    spark.range(rows).select(
      concat(lit("src"), (col("id") % S)).as("source"),
      when(expr(s"(id div $S) % 4") === 0,
        expr(s"(id div ${S * 4}) % $pool"))
        .otherwise(lit(pool) + (col("id") % S + 1) * pool +
          expr(s"(id div ${S * 4}) % $pool"))
        .as("key"))
      .select(col("source"), xxhash64(col("key")).as("shingle"))
  }

  // ------------------------------------------------------- novelty --

  private def novelty(spark: SparkSession, d: String): Unit = {
    import graft.dedup.Dedup
    val S = 20
    Dedup.sourceNoveltyKmv(spark, d).collect() // warmup: JIT + codegen
    for (mult <- mults("SCALE_R16_MULTS", Seq(16, 256, 1024))) {
      val rows = 80000L * mult
      val parts = bytesPolicy(spark, rows, 32L)
      val stream = kmvStream(spark, mult, S)
      val (est, tSketch) = timed(Dedup.kmvNoveltyOfHashes(stream).collect())
      require(est.length == S * (S - 1),
        s"estimator dropped ordered pairs at mult=$mult: ${est.length}")
      val exactNovel = 1000.0 * mult
      val exactUnion = 3000.0 * mult
      var worstNovel = 0.0; var worstUnion = 0.0
      est.foreach { r =>
        val theta = r.getAs[Double]("theta_pair")
        def bound(exact: Double) =
          6.0 * math.sqrt(exact * math.max(1.0 / theta - 1.0, 0.0)) + 8.0
        val novel = r.getAs[Double]("est_novel_a")
        val union = r.getAs[Double]("est_union")
        worstNovel = math.max(worstNovel,
          math.abs(novel - exactNovel) / bound(exactNovel))
        worstUnion = math.max(worstUnion,
          math.abs(union - exactUnion) / bound(exactUnion))
        require(math.abs(novel - exactNovel) <= bound(exactNovel),
          s"novelty estimate out of bound at mult=$mult: $novel vs $exactNovel")
        require(math.abs(union - exactUnion) <= bound(exactUnion),
          s"union estimate out of bound at mult=$mult: $union vs $exactUnion")
        val frac = r.getAs[Double]("novelty_frac")
        require(frac > 0.0 && frac < 1.0,
          s"novelty_frac must be interior for half-shared pools: $frac")
      }
      println(f"[scale-r16-novelty] mult=$mult%5d rows=$rows%10d " +
        f"parts=$parts%4d exact_novel=$exactNovel%11.0f " +
        f"exact_union=$exactUnion%11.0f sketch_s=$tSketch%7.2f " +
        f"worst_novel_bound_frac=$worstNovel%5.3f " +
        f"worst_union_bound_frac=$worstUnion%5.3f")
    }
  }

  // -------------------------------------------------------- bitext --

  /** PLANTED-PAIR vector corpus for the bitext A/B. Straight id-shifted
    * copy amplification is WRONG for a margin miner: every vector gains
    * near-identical copies, the kNN means saturate at ~the top cosine,
    * margins collapse toward 1 and the mined set goes EMPTY (measured:
    * 160 pairs at ×2, 0 at ×8 on copy-amplified sf0.01). A margin
    * sweep needs bitext STRUCTURE that survives scale: concept i gets
    * an even vector 2i and an odd vector 2i+1, both = the concept's
    * deterministic hash-derived base ± per-vector noise (signal rms
    * ~0.58/component vs noise 0.12), so the true pair's cosine ≈ 0.95
    * stands out of the ~N(0, 1/√dim) background at ANY corpus size and
    * the margin threshold keeps real work to do. Fully deterministic
    * (xxhash64-derived components), and the PLANTED truth is known, so
    * the table also reports how many mined pairs are the planted ones. */
  private def plantedVecs(spark: SparkSession, mult: Int): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val dim = 32
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def unit(c: org.apache.spark.sql.Column) = // signed hash → [-1, 1]
      (c % 1000003L).cast("double") / lit(1000003.0)
    spark.range(2000L * mult).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        unit(xxhash64(concat_ws("_", expr("id div 2"), j))) +
          lit(0.12) * unit(xxhash64(concat_ws("#", col("id"), j)))).as("v"))
      .repartition(parts, col("vec_id"))
  }

  /** Exact-vs-IVF A/B for the margin miner (VERDICT r14 #1): per
    * octave over the planted corpus, the exact scorer's all-pairs
    * cross (|A|·|B| cosines — the measured cliff) against the
    * IVF-shortlist form at occupancy-constant geometry
    * (nlist = 16·mult, softAssign = 3 — the registered sf-scale
    * query's occupancy held fixed as the corpus grows, FAISS's own
    * scaling), with MEASURED recall of the shortlist miner's pairs
    * against the exact pair set. The recall floor
    * [[graft.similarity.Similarity.BitextIvfFloor]] is calibrated from
    * this table: measured-minus-margin, the ANN-floor policy. */
  private def bitext(spark: SparkSession, d: String): Unit = {
    import graft.similarity.Similarity
    Similarity.mineBitext(spark, d).collect() // warmup: JIT + codegen
    for (mult <- mults("SCALE_R16_MULTS", Seq(2, 8, 32))) {
      val n = 2000L * mult
      val parts = bytesPolicy(spark, n * n / 2, 30L) // scored-pairs frame
      val all = plantedVecs(spark, mult)
      all.persist()
      all.count()
      val (exact, tExact) = timed(
        Similarity.mineBitextExactOf(all).collect())
      val exactPairs = exact.map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
      val planted = exactPairs.count { case (s, t) => t == s + 1 }
      val (ivf, tIvf) = timed(
        Similarity.mineBitextIvfOf(spark, all,
          nlist = 16 * mult, softAssign = 3).collect())
      val ivfPairs = ivf.map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
      val recall = (exactPairs & ivfPairs).size.toDouble / exactPairs.size
      println(f"[scale-r16-bitext] mult=$mult%4d vecs=$n%9d parts=$parts%5d " +
        f"exact_pairs=${exactPairs.size}%7d planted=$planted%7d " +
        f"exact_s=$tExact%8.2f ivf_pairs=${ivfPairs.size}%7d " +
        f"ivf_s=$tIvf%8.2f recall=$recall%6.4f " +
        f"floor=${Similarity.BitextIvfFloor}%4.2f")
      require(exactPairs.nonEmpty, s"exact miner empty at mult=$mult")
      require(recall >= Similarity.BitextIvfFloor,
        f"IVF recall $recall%.4f under the floor at mult=$mult")
      all.unpersist()
    }
  }

  // ------------------------------------------------------ ppskeyed --

  /** `sample_pps` through the KEYED running-sum arm (VERDICT r14 #4).
    * At bench scale the gate routes the registered query to the window
    * arm; the keyed path — the 100 TB shape: per-source W through the
    * bucketed running sum with `totalOut` — is driven here at an
    * amplified octave. The amplified frame's join lineage derives an
    * untrusted estimate, so the −1 default takes the keyed arm
    * (plan-asserted via `range_bucket`); the A/B reference is the SAME
    * operator with `inputBytes` forced under the envelope (the window
    * arm — a genuinely different physical plan with spec-proven equal
    * semantics). Asserts exactly PpsPerSource picks per source and
    * row-set equality between the arms at ≥ 20 M rows. */
  private def ppsKeyed(spark: SparkSession, d: String): Unit = {
    import graft.text.TextAnalysis
    val baseRows = graft.Tables.documents(spark, d).count()
    for (mult <- mults("SCALE_R16_MULTS", Seq(4096))) {
      val rows = baseRows * mult
      val parts = bytesPolicy(spark, rows, 40L)
      val docs = Amplify.amplifiedDocStats(spark, d, mult)
        .select(col("doc_id"), col("source"), col("n_tokens"))
      docs.persist()
      val n = docs.count()
      val keyedQ = TextAnalysis.samplePpsOf(docs)
      val keyedPlan = keyedQ.queryExecution.executedPlan.toString
      require(keyedPlan.contains("range_bucket"),
        s"amplified lineage must take the keyed arm:\n$keyedPlan")
      val (keyed, tKeyed) = timed(keyedQ.collect())
      val perSource = keyed.groupBy(_.getAs[String]("source"))
        .view.mapValues(_.length).toMap
      require(perSource.values.forall(_ == TextAnalysis.PpsPerSource),
        s"pick counts off at mult=$mult: $perSource")
      val (win, tWin) = timed(
        TextAnalysis.samplePpsOf(docs, inputBytes = BigInt(1)).collect())
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("cum"), r.getAs[Long]("w_total"),
          r.getAs[Long]("pick_idx"))
      val mismatches = (keyed.map(key).toSet diff win.map(key).toSet).size +
        (win.map(key).toSet diff keyed.map(key).toSet).size
      println(f"[scale-r16-ppskeyed] mult=$mult%5d rows=$n%9d " +
        f"parts=$parts%4d sources=${perSource.size}%3d " +
        f"picks=${keyed.length}%4d keyed_s=$tKeyed%7.2f " +
        f"window_s=$tWin%7.2f mismatches=$mismatches%d")
      require(mismatches == 0, "keyed and window arms must agree row-for-row")
      docs.unpersist()
    }
  }
}

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

  private def bitext(spark: SparkSession, d: String): Unit = {
    println("[scale-r16-bitext] not implemented yet")
  }

  // ------------------------------------------------------ ppskeyed --

  private def ppsKeyed(spark: SparkSession, d: String): Unit = {
    println("[scale-r16-ppskeyed] not implemented yet")
  }
}

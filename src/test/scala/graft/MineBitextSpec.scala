package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Laws of margin-based pair mining ([[Similarity.mineBitext]]). */
class MineBitextSpec extends SparkSpec {
  import spark.implicits._

  test("structure at sf0.001: one best target per source, all above threshold") {
    val rows = Similarity.mineBitext(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val srcs = rows.map(_.getAs[Long]("src_id"))
    assert(srcs.distinct.length == srcs.length, "a source mined twice")
    assert(rows.forall(_.getAs[Long]("src_id") % 2 == 0))
    assert(rows.forall(_.getAs[Long]("tgt_id") % 2 == 1))
    assert(rows.forall(_.getAs[Double]("margin") > Similarity.BitextMargin))
  }

  test("ivf shortlist miner: gate true, recall printed against its floor") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val exact = Similarity.mineBitext(spark, d)
        .select("src_id", "tgt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.mineBitextIvf(spark, d)
        .select("src_id", "tgt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & ivf).size.toDouble / exact.size
      info(s"$d: exact=${exact.size} ivf=${ivf.size} recall=$recall")
      assert(recall >= Similarity.BitextIvfFloor,
        s"recall $recall under floor at $d")
      val gate = Similarity.mineBitextIvfVerified(spark, d).collect()(0)
      assert(gate.getAs[Boolean]("meets_floor"))
      assert(gate.getAs[Long]("n_exact") == exact.size.toLong)
    }
  }

  test("mutual ivf shortlist miner: subset/matching laws hold, gate " +
    "true, recall printed against its floor") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val exact = Similarity.mineBitextMutual(spark, d)
        .select("src_id", "tgt_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.mineBitextMutualIvf(spark, d).collect()
        .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
          r.getAs[Double]("margin")))
      // the shortlist form still obeys the mutual laws: a partial
      // matching, margins above threshold
      assert(ivf.map(_._1).distinct.length == ivf.length)
      assert(ivf.map(_._2).distinct.length == ivf.length)
      assert(ivf.forall(_._3 > Similarity.BitextMargin))
      val pairs = ivf.map(t => (t._1, t._2)).toSet
      val recall = (exact & pairs).size.toDouble / exact.size
      info(s"$d: exact_mutual=${exact.size} ivf_mutual=${pairs.size} recall=$recall")
      assert(recall >= Similarity.BitextMutualIvfFloor,
        s"mutual recall $recall under floor at $d")
      val gate = Similarity.mineBitextMutualIvfVerified(spark, d).collect()(0)
      assert(gate.getAs[Boolean]("meets_floor"))
      assert(gate.getAs[Long]("n_exact") == exact.size.toLong)
    }
  }

  test("mutual auto gate: below the cutover the exact arm runs (row-" +
    "identical to mine_bitext_mutual, hash-checkable), at/above it " +
    "the IVF shortlist arm (row-identical to the explicit-geometry " +
    "form)") {
    val all = Similarity.vecs(spark, sf0001) // 20 vectors
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).toList
    // default cutover (20000) on a 20-vector corpus → exact arm
    val auto = rows(Similarity.mineBitextMutualAutoOf(spark, all))
    assert(auto == rows(Similarity.mineBitextMutual(spark, sf0001)))
    // forced-tiny cutover → IVF arm with nlist = max(16, n/125) = 16
    val autoIvf = rows(Similarity.mineBitextMutualAutoOf(spark, all,
      cutover = 10L))
    assert(autoIvf == rows(
      Similarity.mineBitextMutualIvfOf(spark, all, nlist = 16, softAssign = 3)))
    assert(autoIvf.nonEmpty)
    // forced-tiny hier cutover → the two-level front through the
    // mutual tail, row-identical to composing the pieces directly
    val autoHier = rows(Similarity.mineBitextMutualAutoOf(spark, all,
      cutover = 10L, hierCutover = 10L))
    assert(autoHier == rows(Similarity.bitextMutualTail(
      Similarity.bitextHierScoredOf(spark, all, n = 20L, nlist = 16,
        softAssign = Similarity.BitextHierSoft, s1 = Similarity.BitextHierS1))))
  }

  test("per-source auto gate (VERDICT r16 #2): below the cutover the " +
    "exact arm runs (row-identical to mine_bitext, hash-checkable), " +
    "at/above it the IVF shortlist arm (row-identical to the " +
    "explicit-geometry form)") {
    val all = Similarity.vecs(spark, sf0001) // 20 vectors
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).toList
    // default cutover (24000) on a 20-vector corpus → exact arm
    val auto = rows(Similarity.mineBitextAutoOf(spark, all))
    assert(auto == rows(Similarity.mineBitext(spark, sf0001)))
    // forced-tiny cutover → IVF arm with nlist = max(16, n/125) = 16;
    // nKnown = 20 sits under IvfTrainCap, so the capped trainer is the
    // verbatim full-corpus trainer and the rows match the explicit form
    val autoIvf = rows(Similarity.mineBitextAutoOf(spark, all,
      cutover = 10L))
    assert(autoIvf == rows(
      Similarity.mineBitextIvfOf(spark, all, nlist = 16, softAssign = 3)))
    assert(autoIvf.nonEmpty)
    // forced-tiny hier cutover → the two-level quantizer front,
    // row-identical to the explicit hier form
    val autoHier = rows(Similarity.mineBitextAutoOf(spark, all,
      cutover = 10L, hierCutover = 10L))
    assert(autoHier == rows(
      Similarity.mineBitextHierOf(spark, all, n = 20L, nlist = 16)))
  }

  test("capped k-means training (VERDICT r16 #4): over the cap the " +
    "trainer samples ~cap vectors deterministically and still yields " +
    "nlist usable centroids; at or under the cap it is the verbatim " +
    "full-corpus trainer") {
    val all = Similarity.vecs(spark, "/root/testdata/sf0.01")
    val n = all.count()
    // under the cap: bit-identical centroid frames
    val full = Similarity.trainCentroids(spark, all, 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toList
    val capped = Similarity.trainCentroidsCapped(spark, all, n, 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toList
    assert(capped == full)
    // over the cap (forced tiny): a real sample trains, the model still
    // has centroids and assignment still covers every vector
    val small = Similarity.trainCentroidsCapped(spark, all, n, 8,
      iters = 2, cap = math.max(8L, n / 4))
    val cents = small.collect()
    assert(cents.nonEmpty && cents.length <= 8)
    info(s"capped trainer at n=$n cap=${math.max(8L, n / 4)}: " +
      s"${cents.length} centroids")
  }

  test("mutual (bidirectional) rule: the mined set is exactly " +
    "best-per-source ∩ best-per-target, a partial matching, and a " +
    "subset of the per-source rule's output") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val perSrc = Similarity.mineBitext(spark, d).collect()
        .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
      val mutual = Similarity.mineBitextMutual(spark, d).collect()
        .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
          r.getAs[Double]("margin")))
      val pairs = mutual.map(t => (t._1, t._2)).toSet
      assert(pairs.subsetOf(perSrc),
        s"mutual must be a subset of the per-source rule at $d")
      assert(pairs.nonEmpty, s"mutual mined nothing at $d")
      // a partial matching: every src and every tgt at most once
      assert(mutual.map(_._1).distinct.length == mutual.length)
      assert(mutual.map(_._2).distinct.length == mutual.length)
      assert(mutual.forall(_._3 > Similarity.BitextMargin))
      info(s"$d: per_source=${perSrc.size} mutual=${pairs.size}")
    }
  }

  test("starved-shortlist determinism (VERDICT r14 #6): an endpoint " +
    "with fewer than BitextKnn candidates has a null kNN mean, its " +
    "margins are null, and it drops at the cut — property vs an " +
    "independent fold across the starvation boundary") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val k = Similarity.BitextKnn
    def fold(cands: Seq[(Long, Long, Double)]): List[(Long, Long, Double)] = {
      def mean(xs: Seq[Double]): Option[Double] =
        if (xs.size < k) None
        else Some(xs.take(k).reduceLeft(_ + _) * (1.0 / k))
      val fwd = cands.groupBy(_._1).map { case (s, cs) =>
        s -> mean(cs.sortBy(t => (-t._3, t._2)).map(_._3)) }
      val bwd = cands.groupBy(_._2).map { case (t, cs) =>
        t -> mean(cs.sortBy(c => (-c._3, c._1)).map(_._3)) }
      cands.groupBy(_._1).toList.flatMap { case (s, cs) =>
        val margins = cs.flatMap { case (_, t, c) =>
          for (f <- fwd(s); b <- bwd(t)) yield (t, c / ((f + b) * 0.5))
        }
        margins.sortBy(m => (-m._2, m._1)).headOption
          .filter(_._2 > Similarity.BitextMargin)
          .map(best => (s, best._1, best._2))
      }.sortBy(_._1)
    }
    // one pinned case first: src 0 fully-connected (4 targets), src 2
    // starved at width 2, src 4 starved at width 3, src 6 exactly at
    // the k = 4 boundary; tgt 9 starved in the bwd direction
    val pinned = Seq[(Long, Long, Double)](
      (0L, 1L, 0.9), (0L, 3L, 0.5), (0L, 5L, 0.4), (0L, 7L, 0.3),
      (2L, 1L, 0.8), (2L, 3L, 0.7),
      (4L, 1L, 0.9), (4L, 3L, 0.2), (4L, 5L, 0.1),
      (6L, 1L, 0.95), (6L, 3L, 0.6), (6L, 5L, 0.5), (6L, 7L, 0.2),
      (0L, 9L, 0.85), (6L, 9L, 0.7))
    val gotPinned = Similarity.bitextMarginTail(
        pinned.toDF("src_id", "tgt_id", "cos_sim")).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).toList.sortBy(_._1)
    assert(gotPinned == fold(pinned))
    assert(!gotPinned.exists(r => r._1 == 2L || r._1 == 4L),
      "starved sources (width < k) must drop entirely")

    val gen = for {
      nSrc <- Gen.choose(2, 6)
      nTgt <- Gen.choose(2, 7)
      seed <- Gen.choose(0L, Long.MaxValue)
      density <- Gen.choose(25, 90)
    } yield (nSrc, nTgt, seed, density)
    var starvedSeen = 0
    val prop = Prop.forAll(gen) { case (nSrc, nTgt, seed, density) =>
      val rng = new scala.util.Random(seed)
      // coarse score grid FORCES ties, so tie-order determinism is
      // exercised, not dodged; widths 0..7 straddle the k = 4 boundary
      val cands = for {
        s <- 0 until nSrc; t <- 0 until nTgt
        if rng.nextInt(100) < density
      } yield (s.toLong * 2, t.toLong * 2 + 1,
        (rng.nextInt(1500) - 400) / 1000.0)
      if (cands.isEmpty) true
      else {
        if (cands.groupBy(_._1).exists(_._2.size < k) ||
            cands.groupBy(_._2).exists(_._2.size < k)) starvedSeen += 1
        val got = Similarity.bitextMarginTail(
            cands.toDF("src_id", "tgt_id", "cos_sim")).collect()
          .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
            r.getAs[Double]("margin"))).toList.sortBy(_._1)
        got == fold(cands)
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
    assert(starvedSeen >= 5,
      s"generator must actually cross the starvation boundary ($starvedSeen)")
  }

  test("margin math matches an independent Scala fold on a synthetic corpus") {
    // 6 sources, 8 targets, deterministic integer-grid vectors
    val dim = 8
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)((r.nextInt(9) - 4) * 0.25f)
    }
    val n = 14
    val vecs = (0 until n).map(i => (i.toLong, vec(i), i % 10))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val tmp = tmpDir("bitext")
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // the query reads only the embeddings table from the dir
    val mined = Similarity.mineBitext(spark, tmp).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).toList

    // independent reference: plain Scala, same fixed fold order
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dim) { d += ad(i) * bd(i); na += ad(i) * ad(i); nb += bd(i) * bd(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val a = vecs.filter(_._1 % 2 == 0)
    val b = vecs.filter(_._1 % 2 == 1)
    val sims = for (x <- a; y <- b) yield (x._1, y._1, cos(x._2, y._2))
    def mean4(xs: Seq[Double]): Double = {
      val s = xs.take(4)
      (((s(0) + s(1)) + s(2)) + s(3)) * 0.25
    }
    val fwd = a.map(x => x._1 -> mean4(
      sims.filter(_._1 == x._1).sortBy(t => (-t._3, t._2)).map(_._3))).toMap
    val bwd = b.map(y => y._1 -> mean4(
      sims.filter(_._2 == y._1).sortBy(t => (-t._3, t._1)).map(_._3))).toMap
    val expected = a.flatMap { x =>
      val best = sims.filter(_._1 == x._1)
        .map(t => (t._2, t._3 / ((fwd(x._1) + bwd(t._2)) * 0.5)))
        .sortBy(t => (-t._2, t._1)).head
      if (best._2 > Similarity.BitextMargin) Some((x._1, best._1, best._2)) else None
    }.toList
    assert(mined == expected)

    // the bidirectional rule on the same corpus: argmax BOTH ways
    val minedMutual = Similarity.mineBitextMutual(spark, tmp).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("margin"))).toList
    val margin = sims.map(t =>
      (t._1, t._2, t._3 / ((fwd(t._1) + bwd(t._2)) * 0.5)))
    val bestBySrc = margin.groupBy(_._1).view.mapValues(
      _.sortBy(t => (-t._3, t._2)).head).toMap
    val bestByTgt = margin.groupBy(_._2).view.mapValues(
      _.sortBy(t => (-t._3, t._1)).head).toMap
    val expectedMutual = bestBySrc.values.toList
      .filter(t => bestByTgt(t._2) == t)
      .filter(_._3 > Similarity.BitextMargin)
      .sortBy(_._1)
    assert(minedMutual == expectedMutual)
  }
}

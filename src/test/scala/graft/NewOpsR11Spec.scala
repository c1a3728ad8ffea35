package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Round-11 additions: the exact-proportion stratified split, MOSS
  * winnowing dedup, and hard-negative mining. */
class NewOpsR11Spec extends SparkSpec {
  import spark.implicits._

  test("dedup_winnow matches a local winnowing mirror at sf0.001") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def fingerprints(text: String): Set[Long] = {
      val t = text.split(" ", -1)
      if (t.length < Dedup.WinnowK) return Set.empty
      val hs = t.sliding(Dedup.WinnowK).map(g =>
        graft.functions.RollingHashExpr.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(g.mkString(" "))))
        .toArray
      hs.indices.map { j =>
        hs.slice(j, math.min(j + Dedup.WinnowW, hs.length)).min
      }.toSet
    }
    val fps0 = docs.map { case (id, text) => id -> fingerprints(text) }
    // MOSS common-fingerprint elimination, mirrored: df > WinnowMaxDf
    // fingerprints never reach the pair join
    val df = fps0.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val fps = fps0.map { case (id, f) =>
      id -> f.filter(df(_) <= Dedup.WinnowMaxDf) }
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      shared = (fa intersect fb).size.toLong if shared >= Dedup.WinnowShared
    } yield (a, b, shared)).toSet
    val got = Dedup.winnowPairs(spark, sf0001)
      .select($"doc_a", $"doc_b", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "planted near-dups must share winnowed fingerprints")
    // selection density: winnowing keeps at most one fp per window start
    fps.foreach { case (id, f) =>
      val nGrams = docs.find(_._1 == id).get._2.split(" ", -1).length - Dedup.WinnowK + 1
      if (nGrams > 0) assert(f.size <= nGrams)
    }
  }

  test("winnow boilerplate elimination: an over-common fingerprint " +
    "produces no pairs") {
    import graft.dedup.Dedup
    // identical template docs: every window min is shared by ALL of
    // them, so once the corpus holds more copies than WinnowMaxDf,
    // every fingerprint is boilerplate by the df law and must be
    // eliminated BEFORE the pair join — no quadratic bucket, no pairs
    // from template-only content
    val tmpl = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val n = (Dedup.WinnowMaxDf + 10).toInt
    val docs = (0 until n).map(i => (i.toLong, tmpl)).toDF("doc_id", "text")
    assert(Dedup.winnowPairsOf(docs).count() === 0L,
      "template-only overlap must not produce pairs")
    // control: below the cap the same content DOES pair (identical
    // docs share every fingerprint, and a 12-token run selects >= 2)
    val few = docs.filter($"doc_id" < 4)
    assert(Dedup.winnowPairsOf(few).count() === 4L * 3 / 2)
  }

  test("mine_hard_negatives: top-5 cross-label neighbors, exact mirror") {
    import graft.similarity.Similarity
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = vecs.filter(_._1 < 10)
    val corpus = vecs.filter(_._1 >= 10)
    val want = queries.flatMap { case (qid, ql, qv) =>
      corpus.filter(_._2 != ql)
        .map { case (nid, nl, nv) => (qid, ql, nid, nl, cos(qv, nv)) }
        .sortBy { case (_, _, nid, _, s) => (-s, nid) }
        .take(5).zipWithIndex
        .map { case ((a, b, c, d, e), i) => (a, b, c, d, i + 1L) }
    }.toSet
    val got = Similarity.mineHardNegatives(spark, sf0001)
      .select($"query_id", $"q_label", $"neighbor_id", $"n_label", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // every mined negative really disagrees on the label
    assert(got.forall { case (_, ql, _, nl, _) => ql != nl })
  }

  test("split_stratified: exact 80/10/10 per language, deterministic, disjoint") {
    val out = TextAnalysis.splitStratified(spark, sf0001)
      .select($"lang", $"doc_id", $"split")
      .as[(String, Long, String)].collect()
    val counts = Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // every document appears exactly once
    assert(out.length === counts.values.sum.toInt)
    assert(out.map(_._2).distinct.length === out.length)
    // exact integer proportions per stratum: floor(0.8n) train,
    // floor(0.9n)-floor(0.8n) val, rest test
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val n = counts(lang)
      val got = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      assert(got.getOrElse("train", 0L) === n * 8 / 10, s"$lang train")
      assert(got.getOrElse("val", 0L) === n * 9 / 10 - n * 8 / 10, s"$lang val")
      assert(got.getOrElse("test", 0L) === n - n * 9 / 10, s"$lang test")
    }
    // reproducible: a second run assigns identically
    val again = TextAnalysis.splitStratified(spark, sf0001)
      .select($"lang", $"doc_id", $"split")
      .as[(String, Long, String)].collect()
    assert(again.sortBy(_._2).toSeq === out.sortBy(_._2).toSeq)
    // and matches a plain per-language window over the same key — the
    // GroupRank formulation is an implementation, not a semantics
    val mix = graft.functions.DetMix.lehmerMix(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(mix, $"doc_id")
    val want = Tables.documents(spark, sf0001)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy($"lang")))
      .select($"lang", $"doc_id",
        when($"rk" * 10 <= $"n_lang" * 8, "train")
          .when($"rk" * 10 <= $"n_lang" * 9, "val")
          .otherwise("test").as("split"))
      .as[(String, Long, String)].collect()
    assert(want.sortBy(_._2).toSeq === out.sortBy(_._2).toSeq)
  }

  test("ann_mrl: prefix-filtered rerank, exact mirror at sf0.001") {
    import graft.similarity.Similarity
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = vecs.filter(_._1 < 10)
    val corpus = vecs.filter(_._1 >= 10)
    val want = queries.flatMap { case (qid, qv) =>
      val qp = qv.take(Similarity.MrlPrefixDims)
      val cand = corpus
        .map { case (nid, nv) =>
          (nid, nv, cos(qp, nv.take(Similarity.MrlPrefixDims))) }
        .sortBy { case (nid, _, s) => (-s, nid) }
        .take(Similarity.MrlCandidates)
      cand.map { case (nid, nv, _) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid, i + 1L) }
    }.toSet
    val got = Similarity.annMrl(spark, sf0001)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    // shape: exactly 5 ranked rows per query, ranks 1..5
    assert(got.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).toSeq.sorted == Seq(1L, 2L, 3L, 4L, 5L) })
  }

  test("mix_temperature: integer-exact sqrt shares, T=2 semantics") {
    val got = TextAnalysis.mixTemperature(spark, sf0001)
      .select($"source", $"n_tokens", $"w_fix", $"weight", $"weight_ppm")
      .as[(String, Long, Long, Double, Long)].collect()
    val toks = Tables.documents(spark, sf0001)
      .select($"source", size(split($"text", " ")).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got.map(_._1).toSet === toks.keySet)
    def isqrt(n: Long): Long = {
      val s0 = math.sqrt(n.toDouble).toLong
      val s = if (s0 * s0 > n) s0 - 1 else s0
      if ((s + 1) * (s + 1) <= n) s + 1 else s
    }
    val wf = got.map(r => r._1 -> r._3).toMap
    toks.foreach { case (src, t) => assert(wf(src) === isqrt(t * 10000L)) }
    val d = got.map(_._3).sum
    got.foreach { case (_, _, f, w, ppm) =>
      assert(w === f.toDouble / d.toDouble)
      assert(ppm === f * 1000000L / d)
    }
    // T=2 flattens: every source's weight share sits between its raw
    // token share and the uniform share (the defining property of
    // temperature upsampling)
    val tot = toks.values.sum.toDouble
    val uniform = 1.0 / toks.size
    got.foreach { case (src, t, _, w, _) =>
      val raw = t / tot
      val (lo, hi) = if (raw < uniform) (raw, uniform) else (uniform, raw)
      assert(w >= lo - 1e-4 && w <= hi + 1e-4, s"$src w=$w raw=$raw")
    }
  }

  test("pack_efficiency: straddle count and bin count match a local " +
    "contiguous-fill replay at sf0.001") {
    val B = 512
    val docs = Tables.documents(spark, sf0001)
      .select($"source", $"doc_id", $"text")
      .as[(String, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.split(" ", -1).length.toLong))
    val got = TextAnalysis.packEfficiency(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    docs.foreach { case (src, toks) =>
      val cum = toks.scanLeft(0L)(_ + _)
      val straddles = toks.indices.count(i =>
        cum(i) / B != (cum(i) + toks(i) - 1) / B)
      val total = toks.sum
      val (_, nDocs, tokens, nPacks, gs, ppm) = got(src)
      assert(nDocs === toks.length.toLong)
      assert(tokens === total)
      assert(nPacks === (total + B - 1) / B)
      assert(gs === straddles.toLong, s"$src straddles")
      assert(ppm === straddles.toLong * 1000000L / toks.length)
    }
  }
}

package graft

import graft.text.TextAnalysis

/** Laws of Madow systematic PPS sampling ([[TextAnalysis.samplePps]]). */
class SamplePpsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 2147483647L
  private def mix(x: Long): Long = x % M * 48271 % M * 48271 % M
  // the 62-bit phase mix (ADVICE r14), the independent twin of
  // DetMix.lehmerMix62: low/high 31-bit halves through decorrelated
  // Lehmer streams, concatenated base-M — every product ≤ (M−1)·M
  private def mix62(x: Long): Long = mix(x & M) * M + mix((x >> 31) + 1)

  test("exactly PpsPerSource picks per source at sf0.001 and sf0.01") {
    val n = TextAnalysis.PpsPerSource
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val picks = TextAnalysis.samplePps(spark, d)
        .groupBy("source").count().collect()
      assert(picks.length == 20, s"missing sources at $d")
      assert(picks.forall(_.getLong(1) == n),
        s"per-source pick counts off at $d: ${picks.map(_.getLong(1)).toSeq}")
    }
  }

  test("selection matches an independent Scala fold on a synthetic corpus") {
    val n = TextAnalysis.PpsPerSource
    // two sources, token counts chosen to include a doc heavier than
    // one W/n step (swallows two boundaries -> single pick)
    val docs = Seq(
      (0L, "sA", 3), (1L, "sA", 50), (2L, "sA", 1), (3L, "sA", 7),
      (4L, "sA", 2), (5L, "sA", 9), (6L, "sA", 4), (7L, "sA", 1),
      (10L, "sB", 5), (11L, "sB", 5), (12L, "sB", 5), (13L, "sB", 5),
      (14L, "sB", 100), (15L, "sB", 5), (16L, "sB", 5), (17L, "sB", 5))
    val tmp = tmpDir("pps")
    docs.map { case (id, src, toks) => (id, Seq.fill(toks)("w").mkString(" "), src) }
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = TextAnalysis.samplePps(spark, tmp).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("pick_idx"))).toList

    // independent reference: same integer math, plain Scala
    val expected = docs.groupBy(_._2).toList.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (mix(d._1), d._1))
      val w = ordered.map(_._3.toLong).sum
      val off = mix62(w) % w
      def nb(c: Long): Long =
        if (c * n <= off) 0L else math.min(n, (c * n - off - 1) / w + 1)
      ordered.scanLeft((0L, 0L, "")) { case ((cum, _, _), d) =>
        (cum + d._3, d._1, src)
      }.tail.collect {
        case (cum, id, s) if nb(cum) > nb(cum - ds.find(_._1 == id).get._3) =>
          (s, id, nb(cum))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)) == expected)
    // the heavy doc swallows >= 1 boundary but appears exactly once
    assert(got.count(_._2 == 14L) <= 1)
    // per-source picks = n minus swallowed boundaries, never more
    assert(got.count(_._1 == "sA") <= n && got.count(_._1 == "sB") <= n)
  }

  test("wide-W phase (ADVICE r14): a source whose token mass passes " +
    "2^31 gets a full-width phase — beyond the 31-bit mix's ceiling — " +
    "and picks still match the independent fold exactly") {
    val n = TextAnalysis.PpsPerSource
    // sW's mass sums to 4 320 522 690 > 2^31; base chosen so the
    // 62-bit phase lands ABOVE 2^31 — a value the r14 31-bit mix could
    // never produce (its range capped at 2^31 − 2, collapsing boundary
    // placement toward the phase-0 grid for any W >> 2^31). sN rides
    // along under 2^31 to pin that the formula degrades to nothing
    // strange for ordinary masses.
    val wide = (0L until 12L).map(i => (i, "sW", 360000003L + i * 7919L))
    val slim = (100L until 108L).map(i => (i, "sN", 13L + i))
    val docs = wide ++ slim
    val w = wide.map(_._3).sum
    assert(w > Int.MaxValue.toLong && mix62(w) % w > Int.MaxValue.toLong,
      s"fixture must exercise a > 2^31 phase, got ${mix62(w) % w}")

    val got = TextAnalysis.samplePpsOf(
        docs.toDF("doc_id", "source", "n_tokens")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("pick_idx"))).toList

    val expected = docs.groupBy(_._2).toList.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (mix(d._1), d._1))
      val wt = ordered.map(_._3).sum
      val off = mix62(wt) % wt
      def nb(c: Long): Long =
        if (c * n <= off) 0L else math.min(n, (c * n - off - 1) / wt + 1)
      ordered.scanLeft((0L, 0L)) { case ((cum, _), d) => (cum + d._3, d._1) }
        .tail.collect {
          case (cum, id) if nb(cum) >
              nb(cum - ds.find(_._1 == id).get._3) =>
            (src, id, nb(cum))
        }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)) == expected)
    assert(got.count(_._1 == "sW") == n,
      "near-equal wide masses must yield exactly n picks")
  }

  test("pps favors heavy docs: picked mean token count above corpus mean") {
    val picked = TextAnalysis.samplePps(spark, "/root/testdata/sf0.01")
      .agg(org.apache.spark.sql.functions.avg("n_tokens")).head().getDouble(0)
    val all = Tables.documents(spark, "/root/testdata/sf0.01")
      .selectExpr("avg(size(split(text, ' ')))").head().getDouble(0)
    assert(picked > all, s"picked mean $picked not above corpus mean $all")
  }
}

package graft

/** The incremental BPE trainer ([[graft.text.TextAnalysis.bpeTrainIncOf]])
  * vs the scan-per-round loop: identical merge tables wherever both run,
  * and realistic merge counts (the thing the scan loop's own scaladoc
  * capped at 5) completing in bounded time.
  */
class BpeIncSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextAnalysis.{bpeTrainOf, bpeTrainIncOf}

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, String, Long)].collect().toList

  test("incremental == scan-per-round on the sf0.001 corpus (5 merges)") {
    val docs = Tables.documents(spark, sf0001)
    assert(table(bpeTrainIncOf(spark, docs, 5)) ===
      table(bpeTrainOf(spark, docs, 5)))
  }

  test("incremental matches the hand-traced goldens incl. greedy overlap and dry-out") {
    // the three corpora NewQueryGoldensSpec traces for the scan loop:
    // multi-doc tie-break, back-to-back overlap, self-pair-only dry-out
    for (corpus <- Seq(
        Seq((1L, "a b a b c"), (2L, "a b x")),
        Seq((1L, "a b a b a")),
        Seq((1L, "a a a")))) {
      val docs = corpus.toDF("doc_id", "text")
      assert(table(bpeTrainIncOf(spark, docs, 3)) ===
        table(bpeTrainOf(spark, docs, 3)), s"corpus $corpus")
    }
  }

  test("incremental == scan-per-round on seeded random corpora (edge-case sweep)") {
    // tiny alphabet on purpose: dense self-pair runs (excluded from
    // selection but present in every rewrite), immediate re-collisions
    // of freshly fused tokens, single-token docs, early dry-outs — the
    // cases where a ± delta on the count table could silently drift
    // from a full recount. Seeded, so failures reproduce.
    val rnd = new scala.util.Random(7)
    val alpha = Vector("a", "b", "c", "d")
    for (rep <- 1 to 5) {
      val docs = (0 until (3 + rnd.nextInt(5))).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Vector.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString(" "))
      }.toDF("doc_id", "text")
      assert(table(bpeTrainIncOf(spark, docs, 4)) ===
        table(bpeTrainOf(spark, docs, 4)), s"rep $rep diverged")
    }
  }

  test("bpe_apply: merges learned on the even half replay over the odd half") {
    // train docs 0,2: round 1 fuses (a,b) n=3; round 2 top non-self
    // pair of the rewritten train corpus is (a@@b, c) (tie with
    // (a@@b, x), b asc). Held-out doc 1 contains "a b" twice → fuses
    // twice, then "a@@b c" → fuses once more; "b a" never fuses.
    // Held-out doc 3 has only pairs the table never saw → untouched.
    val docs = Seq(
      (0L, "a b a b c"), (2L, "a b x"),            // train half
      (1L, "a b c a b b a"), (3L, "q r s")         // held-out half
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.bpeApplyOf(spark, docs, merges = 2)
      .as[(Long, Long, Long, String)].collect().toList
    assert(got === List(
      (1L, 4L, 2L, "a@@b@@c a@@b b a"),
      (3L, 3L, 0L, "q r s")))
  }

  test("120 merges complete with a consistent prefix and non-increasing counts") {
    val docs = Tables.documents(spark, sf0001)
    val t0 = System.nanoTime()
    val t = table(bpeTrainIncOf(spark, docs, 120))
    info(f"120 merges in ${(System.nanoTime() - t0) / 1e9}%.1f s (${t.size} learned)")
    // the 28k-token corpus must not run dry double-digit rounds in
    assert(t.size === 120)
    // merging only consumes occurrences of other pairs, and a new
    // (x, fused) pair inherits at most the merged pair's count — so the
    // argmax sequence is non-increasing; a delta-maintenance bug that
    // overcounts shows up here as a rising count mid-sequence
    assert(t.map(_._4).sliding(2).forall(w => w.head >= w.last))
    // rounds 1..5 are exactly the 5-merge table (same argmax chain)
    assert(t.take(5) === table(bpeTrainOf(spark, docs, 5)))
  }
}

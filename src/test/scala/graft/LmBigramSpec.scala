package graft

import graft.text.TextAnalysis

/** Hand-computed goldens for the bigram-LM fluency score. */
class LmBigramSpec extends SparkSpec {
  import spark.implicits._

  test("lm_bigram_score: hand-computed masses, rare tail, fluency") {
    // corpus bigram counts: (a,b)->3, (b,a)->1, (b,c)->1
    // left counts:          a->3, b->2
    val docs = Seq(
      (0L, "a b a b", "en", "s"), // (a,b) (b,a) (a,b)
      (1L, "a b c", "en", "s"),   // (a,b) (b,c)
      (2L, "z", "en", "s")        // no bigrams -> absent
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.lmBigramScoreOf(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      // doc0: bi_mass 3+1+3, left 3+2+3, rare {(b,a)}
      (0L, 3L, 7L, 8L, 1L, 7.0 / 8.0),
      // doc1: bi_mass 3+1, left 3+2, rare {(b,c)}
      (1L, 2L, 4L, 5L, 1L, 4.0 / 5.0)))
  }

  test("lm_bigram_score: a repeated doc makes its twin's bigrams non-rare") {
    val docs = Seq(
      (0L, "p q", "en", "s"),
      (1L, "p q", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.lmBigramScoreOf(docs)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // c12(p,q)=2, c1(p)=2: both docs fully "fluent", zero rare bigrams
    assert(out.toSeq === Seq(
      (0L, 1L, 2L, 2L, 0L, 1.0), (1L, 1L, 2L, 2L, 0L, 1.0)))
  }

  test("lm_bigram_score: invariant to input partitioning") {
    val docs = (0L until 40L).map(i =>
      (i, s"w${i % 5} w${(i + 1) % 7} w${i % 3} w${i % 2}", "en", "s"))
    def run(parts: Int) = TextAnalysis.lmBigramScoreOf(
      docs.toDF("doc_id", "text", "lang", "source").repartition(parts))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(run(1) === run(7))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Hand-computed goldens for the corpus-trained classifier and the
  * DSIR-style importance selection. */
class ClassifierDsirSpec extends SparkSpec {
  import spark.implicits._

  test("nb_classify: class-specific vocabulary classifies perfectly") {
    // two classes with disjoint vocab → model mass is all within-class
    val docs = Seq(
      (0L, "aa bb aa", "en", "s"),
      (1L, "bb aa aa aa", "en", "s"),
      (2L, "xx yy xx", "de", "s"),
      (3L, "yy xx", "de", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.nbClassifyOf(docs)
      .select("lang", "predicted", "n").as[(String, String, Long)].collect().toSet
    assert(out === Set(("en", "en", 2L), ("de", "de", 2L)))
  }

  test("nb_classify: argmax tie breaks on class name ascending") {
    // both docs identical text, one per class → every class has equal
    // mass/total → tie → predicted must be the lexicographically first
    val docs = Seq(
      (0L, "aa bb", "en", "s"),
      (1L, "aa bb", "de", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.nbClassifyOf(docs)
      .select("lang", "predicted", "n").as[(String, String, Long)].collect().toSet
    assert(out === Set(("en", "de", 1L), ("de", "de", 1L)))
  }

  test("dsir_select: hand-computed importance ratio and the boundary at 1") {
    // target = src0: doc 0 only. Corpus tokens: aa aa bb | bb cc
    // ct: aa->2, bb->1 ; t_total=3. cb: aa->2, bb->2, cc->1 ; b_total=5.
    // doc0: t_mass = 2+2+1 = 5, b_mass = 2+2+2 = 6 → imp = 25/18 ≈ 1.39
    // doc1: t_mass = 1+0 = 1,  b_mass = 2+1 = 3   → imp = 5/9   ≈ 0.56
    val docs = Seq(
      (0L, "aa aa bb", "en", "src0"),
      (1L, "bb cc", "en", "src1")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.dsirSelectOf(docs)
      .select("doc_id", "t_mass", "b_mass", "importance", "selected")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out(0) === ((0L, 5L, 6L, 25.0 / 18.0, true)))
    assert(out(1) === ((1L, 1L, 3L, 5.0 / 9.0, false)))
  }

  test("dsir_resample: kept set is exactly the docs whose mix clears the bound") {
    def mix(id: Long) = id % 2147483647L * 48271L % 2147483647L * 48271L % 2147483647L
    val docs = Tables.documents(spark, sf0001)
    val scored = TextAnalysis.dsirSelectOf(docs)
      .select("doc_id", "importance").as[(Long, Double)].collect().toMap
    val kept = TextAnalysis.dsirResampleOf(docs)
      .select("doc_id", "keep_p").as[(Long, Double)].collect().toMap
    assert(kept.nonEmpty && kept.size < scored.size)
    kept.foreach { case (id, p) =>
      assert(p <= 1.0 && p === math.min(1.0, scored(id) * 0.5))
      assert(mix(id).toDouble < p * 2147483647.0)
    }
    (scored.keySet -- kept.keySet).foreach { id =>
      val p = math.min(1.0, scored(id) * 0.5)
      assert(mix(id).toDouble >= p * 2147483647.0, s"doc $id wrongly dropped")
    }
  }

  test("dsir_select: identical result for any input partitioning") {
    def res(parts: Int) =
      TextAnalysis.dsirSelectOf(Tables.documents(spark, sf0001).repartition(parts))
        .select("doc_id", "importance").as[(Long, Double)].collect().toSet
    val a = res(1)
    assert(a.nonEmpty)
    assert(res(13) === a)
  }
}

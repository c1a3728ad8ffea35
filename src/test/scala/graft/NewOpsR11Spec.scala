package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Round-11 additions: the exact-proportion stratified split. */
class NewOpsR11Spec extends SparkSpec {
  import spark.implicits._

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
}

package graft

/** The native repetition_stats kernel equals the built-in HOF
  * formulation — on the real corpus and on the tokenization edges
  * (empty string, space runs producing empty tokens, exactly-n-gram
  * lengths, all-identical tokens). */
class TextGopherSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("native gopher gates equal the HOF formulation on the corpus") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(graft.text.TextAnalysis.gopherGatesOf(docs)) ===
      rows(graft.text.TextAnalysis.gopherGatesHofOf(docs)))
  }

  test("native gopher gates equal the HOF formulation on edge docs") {
    val edge = Seq(
      (0L, ""),                     // split('') = one empty token
      (1L, "q"),                    // no n-grams at all
      (2L, "a b"),                  // bigram only, no trigram
      (3L, "a b c"),                // exactly one trigram
      (4L, "x  y"),                 // space run: empty middle token
      (5L, "a a a a a a"),          // all-identical tokens: max runs
      (6L, " leading and trailing "))
      .toDF("doc_id", "text")
    assert(rows(graft.text.TextAnalysis.gopherGatesOf(edge)) ===
      rows(graft.text.TextAnalysis.gopherGatesHofOf(edge)))
  }
}

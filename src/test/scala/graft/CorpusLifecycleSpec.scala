package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingAnalytics
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The stages composed as one pipeline on REAL tables — each stage's
  * input is the previous stage's persisted output, not a fixture:
  * streaming curation (quality gate + cross-batch dedup with the
  * Bloom-guarded pass table), the drift monitor scoring an arriving
  * batch against a model frozen from the curated corpus, publication
  * with metadata re-attached, and finally a GDPR takedown folded in by
  * changelog + crash-safe compaction. Every individual stage has its
  * own spec; this pins that they COMPOSE. */
class CorpusLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("life of a corpus: curate -> monitor -> publish -> takedown") {
    val in = tmpDir("lc-in"); val pass = tmpDir("lc-pass")
    val quar = tmpDir("lc-quar"); val ck = tmpDir("lc-ck")
    val docA = "the quick brown fox jumps over the lazy dog before noon today"
    val docB = "distant libraries catalog ancient scrolls describing forgotten kingdoms across seven continents"
    val docC = "ancient scrolls describing forgotten kingdoms rest inside distant libraries across continents worldwide"
    val spamDoc = "zorp blee krag munt flax vorn quil drex pind solt wemb jick"

    val batch1 = Seq((1L, "web", docA), (2L, "web", docA + " x"),
      (3L, "books", docB), (4L, "web", "too short"))
    val batch2 = Seq((10L, "web", docA + " y"), (11L, "books", docC),
      (12L, "spam", spamDoc))

    batch1.toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING").parquet(in)
    val q = StreamingAnalytics.curateStream(stream, pass, quar, ck,
      bloomHistoryGuard = true)
    try {
      q.processAllAvailable()
      // the drift model freezes on the CURATED corpus as of batch 1
      val model = TextAnalysis.unigramModelOf(spark.read.parquet(pass))
        .localCheckpoint()
      batch2.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()

      // curation: 1 and 3 pass batch 1; 2 dup-in-batch, 4 gate-rejected;
      // 10 is a near-dup of HISTORY doc 1; 11 and 12 pass
      val passed = spark.read.parquet(pass)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(passed === Seq(1L, 3L, 11L, 12L))
      val quarantined = spark.read.parquet(quar)
        .select($"doc_id", $"reason").as[(Long, String)].collect().toSeq.sorted
      assert(quarantined === Seq((2L, "dup_in_batch"), (4L, "quality_gate"),
        (10L, "dup_of_history")))

      // monitoring: batch 2 scored against the frozen batch-1 model —
      // the all-OOV source reads exactly 1.0, in-vocabulary sources far less
      val drift = TextAnalysis.driftAgainstModelOf(
          batch2.toDF("doc_id", "source", "text"), model)
        .select($"source", $"tv_drift").as[(String, Double)].collect().toMap
      assert(drift("spam") === 1.0)
      assert(drift("books") < 0.9 && drift("web") < 0.9)

      // publication: re-attach metadata the slim pass table drops
      val published = tmpDir("lc-pub")
      spark.read.parquet(pass)
        .join((batch1 ++ batch2).toDF("doc_id", "source", "t")
          .select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "text")
        .write.mode("overwrite").parquet(published)

      // takedown: doc 1 erased, doc 3 revised — changelog + compaction
      val changes = tmpDir("lc-ch")
      Seq((1L, 1L, "delete", null, null),
          (3L, 1L, "upsert", "books", docB + " [redacted]"))
        .toDF("doc_id", "seq", "op", "source", "text")
        .write.mode("overwrite").parquet(changes)
      Dedup.compactChanges(spark, published, changes)
      val finalState = spark.read.parquet(published)
        .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      assert(finalState === Seq(
        (3L, "books", docB + " [redacted]"),
        (11L, "books", docC),
        (12L, "spam", spamDoc)))
    } finally q.stop()
  }
}

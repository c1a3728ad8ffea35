package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Hand-computed goldens for the round-5 additions: the ExactSubstr-style
  * duplicated-span scrub and SemDeDup-style semantic dedup. The DuckDB
  * oracle proves both at sf0.01; these pin the semantics on inputs small
  * enough to check by eye, plus the partitioning-invariance property the
  * oracle can't see. */
class SpanScrubSemanticSpec extends SparkSpec {
  import spark.implicits._

  // Two docs sharing the exact 5-gram "v w x y z"; doc 2 is untouched.
  private val scrubDocs = Seq(
    (0L, "a b v w x y z c d"),
    (1L, "p q v w x y z r"),
    (2L, "one two three four five six")
  ).toDF("doc_id", "text")

  test("span_scrub removes exactly the cross-doc duplicated 5-gram span") {
    val out = Dedup.spanScrubOf(scrubDocs)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_scrubbed", "scrubbed_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((0L, 9L, 5L, "a b c d")))
    assert(out(1) === ((1L, 8L, 5L, "p q r")))
    assert(out(2) === ((2L, 6L, 0L, "one two three four five six")))
  }

  test("span_scrub: overlapping duplicated grams merge into one covered span") {
    // "v w x y z q" appears in both docs → two overlapping bad 5-grams
    // covering 6 positions, removed once (not double-counted)
    val docs = Seq(
      (0L, "a v w x y z q b"),
      (1L, "v w x y z q")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrubOf(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_scrubbed", "scrubbed_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) === ((0L, 6L, "a b")))
    assert(out(1) === ((1L, 6L, "")))
  }

  test("span_scrub: within-doc repetition alone does not scrub (minDocs=2)") {
    val docs = Seq(
      (0L, "v w x y z m v w x y z"),
      (1L, "totally different words here five")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrubOf(docs).orderBy("doc_id")
      .select("n_scrubbed").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0L))
  }

  test("span_scrub: identical result for any input partitioning") {
    def res(parts: Int) =
      Dedup.spanScrubOf(Tables.documents(spark, sf0001).repartition(parts))
        .select("doc_id", "n_scrubbed", "scrubbed_text")
        .as[(Long, Long, String)].collect().toSet
    val a = res(1)
    assert(a.nonEmpty)
    assert(res(13) === a)
  }

  test("span_scrub equals an independent reimplementation on a random corpus") {
    // small vocabulary → dense cross-doc 5-gram duplication
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val corpus = (0L until 60L).map { id =>
      id -> (1 to (6 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // reference: string grams, positions, >= 2 distinct docs
    val grams = corpus.flatMap { case (id, text) =>
      val ts = text.split(" ")
      (0 to ts.length - 5).map(i => (id, i, ts.slice(i, i + 5).mkString(" ")))
    }
    val bad = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = corpus.map { case (id, text) =>
      val ts = text.split(" ")
      val covered = grams.collect {
        case (d, i, g) if d == id && bad(g) => i until (i + 5)
      }.flatten.toSet
      val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      (id, ts.length.toLong, (ts.length - kept.length).toLong, kept.mkString(" "))
    }.toSet
    val got = graft.dedup.Dedup.spanScrubOf(corpus.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "n_scrubbed", "scrubbed_text")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === expected)
    assert(expected.exists(_._3 > 0), "the random corpus must actually scrub")
  }

  test("semantic_dedup: survivors are component minima and sizes add up") {
    val out = Similarity.semanticDedup(spark, sf0001)
    val rows = out.select("vec_id", "cluster_id", "n_members", "is_survivor")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    // every cluster's survivor is exactly its minimum member
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val min = members.map(_._1).min
      assert(cid === min, s"cluster id must be the min member, got $cid vs $min")
      members.foreach { case (vid, _, n, surv) =>
        assert(n === members.size.toLong)
        assert(surv === (vid === min))
      }
    }
    // partition property: every vector appears exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    // and the near-dup pairs are intra-cluster by construction
    val pairs = Similarity.embedNearDup(spark, sf0001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val label = rows.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) === label(b), s"near-dup pair ($a,$b) split across clusters")
    }
  }
}

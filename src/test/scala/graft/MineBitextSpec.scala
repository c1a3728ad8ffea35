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
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.similarity.{HierQuantizer, ProductQuantizer, Similarity}

/** r18 optimization round: the driver-local Lloyd paths
  * ([[graft.similarity.LocalTrain]]) must produce BIT-identical models
  * to the distributed trainers they replace — same cids, same centroid
  * doubles to the last bit — on the real corpus and at more than one
  * geometry. The registered queries' hashes ride on this equality. */
class LocalTrainSpec extends SparkSpec {

  private lazy val all = Similarity.vecs(spark, sf0001).select("vec_id", "v")

  /** Exact (bitwise) comparison of two collected model frames after
    * sorting by the key columns. */
  private def assertSameModel(local: DataFrame, dist: DataFrame,
      keys: Int, tag: String): Unit = {
    val l = local.collect()
    val d = dist.collect()
    assert(l.length == d.length, s"$tag: ${l.length} vs ${d.length} rows")
    def key(r: org.apache.spark.sql.Row): Seq[Long] =
      (0 until keys).map(i => r.get(i) match {
        case x: Long => x
        case x: Int => x.toLong
      })
    val ls = l.sortBy(key)(math.Ordering.Implicits.seqOrdering)
    val ds = d.sortBy(key)(math.Ordering.Implicits.seqOrdering)
    ls.zip(ds).foreach { case (a, b) =>
      assert(key(a) == key(b), s"$tag: key ${key(a)} vs ${key(b)}")
      val va = a.getSeq[Double](keys)
      val vb = b.getSeq[Double](keys)
      assert(va.length == vb.length, s"$tag ${key(a)}: dim ${va.length} vs ${vb.length}")
      va.zip(vb).zipWithIndex.foreach { case ((x, y), i) =>
        assert(java.lang.Double.doubleToRawLongBits(x) ==
               java.lang.Double.doubleToRawLongBits(y),
          s"$tag ${key(a)} dim $i: $x vs $y")
      }
    }
  }

  test("flat coarse quantizer: local Lloyd == distributed, bit-for-bit") {
    for ((nlist, iters) <- Seq((16, 2), (8, 2), (16, 1), (5, 3))) {
      val local = Similarity.trainCentroids(spark, all, nlist, iters)
      val dist = Similarity.trainCentroidsDistributed(spark, all, nlist, iters)
      assertSameModel(local, dist, 1, s"flat nlist=$nlist iters=$iters")
    }
  }

  test("product quantizer: local Lloyd == distributed, bit-for-bit") {
    // exercise through the public train (unit-normalize + slice inside)
    for ((m, subDim, k, iters) <- Seq((8, 8, 16, 1), (4, 16, 8, 2))) {
      val local = ProductQuantizer.train(spark, all, m, subDim, k, iters)
      // distributed twin: rebuild the same sub-vector frame shape the
      // public train uses, via the package-private distributed seam
      val dist = ProductQuantizer.trainDistributedForTest(spark, all, m, subDim, k, iters)
      assertSameModel(local, dist, 2, s"pq m=$m k=$k iters=$iters")
    }
  }

  test("hier sub level: local rounds == distributed rounds, bit-for-bit") {
    val n = all.count()
    for (nlist <- Seq(8, 16)) {
      val local = HierQuantizer.train(spark, all, n, nlist)
      val dist = HierQuantizer.trainDistributedForTest(spark, all, n, nlist)
      assert(local.k1 == dist.k1 && local.k2 == dist.k2)
      assertSameModel(local.supers, dist.supers, 1, s"hier supers nlist=$nlist")
      assertSameModel(local.subs, dist.subs, 2, s"hier subs nlist=$nlist")
    }
  }

  test("oversize frame falls back to the distributed path (probe early-terminates)") {
    // a frame wider than RowCap: synthesize > cap rows cheaply
    val s = spark
    import s.implicits._
    val big = spark.range(0L, graft.similarity.LocalTrain.RowCap + 10L)
      .select(col("id").as("vec_id"),
        array(lit(1.0), col("id").cast("double")).as("v"))
    // must not throw and must produce the same frame the distributed
    // trainer produces (which IS the path taken)
    val m = Similarity.trainCentroids(spark, big, 4, 1)
    assert(m.count() <= 4)
  }
}

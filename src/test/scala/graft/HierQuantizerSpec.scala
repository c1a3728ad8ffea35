package graft

import org.apache.spark.sql.functions._
import graft.similarity.{HierQuantizer, Similarity}

/** The two-level coarse quantizer (VERDICT r9 #1): geometry, model
  * boundedness, determinism, and assignment contracts. */
class HierQuantizerSpec extends SparkSpec {

  private lazy val all = Similarity.vecs(spark, sf0001).select("vec_id", "v")
  private lazy val n = all.count()

  test("ceilIsqrt: smallest s with s*s >= k") {
    for (k <- Seq(1, 2, 3, 4, 5, 8, 9, 15, 16, 17, 32, 63, 64, 100)) {
      val s = HierQuantizer.ceilIsqrt(k)
      assert(s.toLong * s >= k && (s - 1).toLong * (s - 1) < k, s"k=$k s=$s")
    }
  }

  test("model geometry: k1*k2 covers nlist; super level is the only collected frame") {
    val nlist = 8
    val m = HierQuantizer.train(spark, all, n, nlist)
    assert(m.k1 === 3 && m.k2 === 3)
    assert(m.k1.toLong * m.k2 >= nlist)
    // super level: k1 rows, collectable by construction
    assert(m.supers.count() <= m.k1.toLong)
    // sub level: at most k1*k2 cells, each with a dim-64 centroid
    val subs = m.subs.collect()
    assert(subs.length <= m.k1 * m.k2)
    assert(subs.forall(_.getSeq[Double](2).length === 64))
    // scid stays inside [0, k2): the cell id sup*k2+scid is injective
    assert(subs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < m.k2))
  }

  test("training is deterministic: two trains produce identical centroids") {
    val a = HierQuantizer.train(spark, all, n, 8)
    val b = HierQuantizer.train(spark, all, n, 8)
    assert(a.supers.orderBy("sup").collect().toSeq ===
      b.supers.orderBy("sup").collect().toSeq)
    assert(a.subs.orderBy("sup", "scid").collect().toSeq ===
      b.subs.orderBy("sup", "scid").collect().toSeq)
  }

  test("assignCells: soft=1 assigns every row exactly once; soft=k caps per row; " +
    "cells come from the probed supers") {
    val m = HierQuantizer.train(spark, all, n, 8)
    val one = HierQuantizer.assignCells(m, all, soft = 1, s1 = 2, "cell")
    assert(one.count() === n)
    assert(one.select("vec_id").distinct().count() === n)
    val cellRange = m.k1.toLong * m.k2
    assert(one.agg(min("cell"), max("cell")).collect().head match {
      case r => r.getLong(0) >= 0 && r.getLong(1) < cellRange
    })
    val softN = HierQuantizer.assignCells(m, all, soft = 4, s1 = 2, "cell")
    val per = softN.groupBy("vec_id").count()
    assert(per.agg(max("count")).collect().head.getLong(0) <= 4L)
    // soft expansion only ADDS cells: the single assignment is a
    // member of each row's soft set
    val joined = one.withColumnRenamed("cell", "c1")
      .join(softN.select(col("vec_id"), col("cell")), "vec_id")
      .filter(col("c1") === col("cell"))
    assert(joined.select("vec_id").distinct().count() === n)
  }

  test("queryCells: nprobe cells per query, all within the cell space") {
    val m = HierQuantizer.train(spark, all, n, 8)
    val q = HierQuantizer.queryCells(m,
      all.filter(col("vec_id") < 5), nprobe = 3, "cell")
    val per = q.groupBy("vec_id").count().collect()
    assert(per.length === 5)
    assert(per.forall(_.getLong(1) === 3L))
    assert(q.filter(col("cell") < 0 ||
      col("cell") >= m.k1.toLong * m.k2).count() === 0L)
  }

  test("sampled training engages only past the floor and stays deterministic") {
    // tiny corpus: buckets = 1, training sample IS the corpus — the
    // registered geometry at driver scales
    val m1 = HierQuantizer.train(spark, all, n, 4)
    val m2 = HierQuantizer.train(spark, all, n, 4)
    assert(m1.subs.orderBy("sup", "scid").collect().toSeq ===
      m2.subs.orderBy("sup", "scid").collect().toSeq)
  }

  test("dead supers are patched (ADVICE r10): every super carries >= 1 sub-cell, " +
    "so no assignment can silently drop a vector") {
    import spark.implicits._
    // unit: a super with no trained subs gets its own centroid as scid 0
    val supers = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(0.5, 0.5)))
      .toDF("sup", "sv")
    val trained = Seq((0L, 0L, Seq(0.9, 0.1)), (0L, 1L, Seq(0.8, 0.2)),
      (1L, 0L, Seq(0.1, 0.9))).toDF("sup", "scid", "cv")
    val patched = HierQuantizer.patchDeadSupers(supers, trained)
      .orderBy("sup", "scid").collect()
    assert(patched.length === 4)
    val added = patched.last
    assert(added.getLong(0) === 2L && added.getLong(1) === 0L &&
      added.getSeq[Double](2) === Seq(0.5, 0.5))
    // end-to-end invariant on a real train: no super without subs, and
    // single-super probing (s1 = 1, the tightest path) still assigns
    // every input row exactly once
    val m = HierQuantizer.train(spark, all, n, 16)
    assert(m.supers.join(m.subs.select("sup").distinct(), Seq("sup"), "left_anti")
      .count() === 0L)
    val assigned = HierQuantizer.assignCells(m, all, soft = 1, s1 = 1, "cell")
    assert(assigned.count() === n)
    assert(assigned.select("vec_id").distinct().count() === n)
  }

  test("sub-level training sample is hard-capped (VERDICT r10 #5)") {
    // the cap constant itself: 2^20, >= the 16/cell target up to
    // nlist = 65 536 — past that the sample stops growing with nlist
    assert(HierQuantizer.SubTrainCap === (1L << 20))
    assert(16L * 65536L === HierQuantizer.SubTrainCap)
  }
}

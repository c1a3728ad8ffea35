package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Laws of the KMV/Theta distinct sketch ([[graft.functions.KmvSketchAgg]])
  * and the overlap estimators built on it. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(hashes: Seq[Long], k: Int, parts: Int) = {
    graft.functions.KmvSketchAgg.register(spark, k)
    hashes.toDF("h").repartition(parts)
      .agg(expr("kmv_sketch(h)").as("sk"))
      .head().getSeq[Long](0)
  }

  test("exact mode: fewer than k distinct values -> the sorted distinct set") {
    val vals = Seq(42L, -7L, 42L, 0L, Long.MinValue, Long.MaxValue, -7L)
    val sk = sketchOf(vals, k = 64, parts = 3)
    // unsigned ascending: 0, 42, MaxValue (=2^63-1), MinValue (=2^63), -7 (=2^64-7)
    assert(sk == Seq(0L, 42L, Long.MaxValue, Long.MinValue, -7L))
  }

  test("saturated: k smallest distinct unsigned hashes, any partitioning") {
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rng.nextLong())
    val expected = vals.distinct.sortBy(h => h ^ Long.MinValue).take(128)
    for (parts <- Seq(1, 4, 13)) {
      assert(sketchOf(vals, k = 128, parts = parts) == expected,
        s"partitioning $parts changed the sketch")
    }
  }

  test("duplicate-heavy stream: eviction + membership survive churn") {
    // small pool => constant duplicate hits and threshold evictions,
    // the hot paths of the heap + open-addressing internals
    val rng = new scala.util.Random(23)
    val pool = Seq.fill(300)(rng.nextLong()) :+ 0L // include the sentinel hash
    val vals = Seq.fill(5000)(pool(rng.nextInt(pool.length)))
    val expected = vals.distinct.sortBy(h => h ^ Long.MinValue).take(128)
    for (parts <- Seq(1, 7)) {
      assert(sketchOf(vals, k = 128, parts = parts) == expected)
    }
  }

  test("distinct estimate within the published relative bound") {
    val k = 256
    val n = 20000
    // deterministic "hashes": xxhash64 of 1..n via Spark itself
    graft.functions.KmvSketchAgg.register(spark, k)
    val est = spark.range(n.toLong)
      .select(xxhash64(col("id")).as("h"))
      .agg(expr("kmv_sketch(h)").as("sk"))
      .select(
        when(size(col("sk")) === k,
          lit((k - 1).toDouble) /
            (element_at(col("sk"), k).cast("double") / lit(1.8446744073709552e19) +
              when(element_at(col("sk"), k) < 0, 1.0).otherwise(0.0)))
          .otherwise(size(col("sk")).cast("double")).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - n) <= 6.0 / math.sqrt((k - 2).toDouble) * n,
      s"est $est vs exact $n")
  }

  test("kmv gate row: every boolean true at sf0.001 and sf0.01") {
    for (d <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val rows = Dedup.sourceOverlapKmvVerified(spark, d).collect()
      assert(rows.nonEmpty, s"no overlap pairs at $d")
      assert(rows.forall(_.getAs[Boolean]("sizes_within_bound")), s"sizes bound failed at $d")
      assert(rows.forall(_.getAs[Boolean]("shared_within_bound")), s"shared bound failed at $d")
    }
  }

  test("overlap estimate is deterministic under recomputation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.sourceOverlapKmvOf(docs).collect().toSeq
    val b = Dedup.sourceOverlapKmvOf(docs).collect().toSeq
    assert(a == b)
  }

  test("property: any adds + any merge tree == k smallest distinct (pure state, 300 cases)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      k <- Gen.choose(8, 96)
      n <- Gen.choose(0, 800)
      pool <- Gen.choose(16, 400)
      seed <- Gen.choose(0L, Long.MaxValue)
      splits <- Gen.choose(1, 6)
    } yield (k, n, pool, seed, splits)
    val prop = Prop.forAll(gen) { case (k, n, pool, seed, splits) =>
      val rng = new scala.util.Random(seed)
      // small pools force duplicates + evictions; occasional full-range
      // values exercise the unsigned extremes
      val vals = Seq.fill(n)(
        if (rng.nextInt(10) == 0) rng.nextLong()
        else new scala.util.Random(rng.nextInt(pool)).nextLong())
      val expected = vals.distinct.sortBy(h => h ^ Long.MinValue).take(k)
      // random partitioning into sub-states, merged pairwise in order
      val parts = vals.grouped(math.max(1, n / splits + 1)).toSeq
      val states = parts.map { p =>
        val s = new graft.functions.KmvState(k); p.foreach(s.add); s
      }
      val merged = states.reduceOption { (a, b) => a.mergeIn(b); a }
        .getOrElse(new graft.functions.KmvState(k))
      merged.sorted.toSeq == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("sketch union law: merge of disjoint-source sketches = sketch of union") {
    val k = 64
    val rng = new scala.util.Random(11)
    val xs = Seq.fill(1000)(rng.nextLong())
    val ys = Seq.fill(1000)(rng.nextLong())
    val merged = sketchOf(xs ++ ys, k, parts = 5)
    // merging the two standalone sketches by re-aggregating their
    // retained values must give the identical sketch: the k smallest
    // of (k smallest of A) ∪ (k smallest of B) = k smallest of A ∪ B
    val viaParts = sketchOf(sketchOf(xs, k, 2) ++ sketchOf(ys, k, 2), k, parts = 3)
    assert(merged == viaParts)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

/** Bloom join pruning: no false negatives ever, false-positive rate in
  * the configured ballpark, and the pruned semi join is exactly the
  * plain semi join. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("keyBloom + mightContain: every inserted key passes") {
    val keys = (1L to 5000L).map(_ * 37)
    val bloom = BloomPrune.keyBloom(keys.toDF("k"), "k", expectedItems = 5000)
    val misses = keys.toDF("k")
      .filter(!BloomPrune.mightContain(bloom, col("k")))
      .count()
    assert(misses === 0, "a Bloom filter must never reject an inserted key")
  }

  test("false-positive rate is near the configured fpp") {
    val inserted = (1L to 10000L)
    val bloom = BloomPrune.keyBloom(inserted.toDF("k"), "k",
      expectedItems = 10000, fpp = 0.03)
    // probe disjoint keys; fp rate should be ~3%, allow generous slack
    val probes = (1000001L to 1020000L).toDF("k")
    val fp = probes.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    val rate = fp.toDouble / 20000
    assert(rate < 0.09, s"fp rate $rate should be near 0.03")
  }

  test("empty build side: Bloom is null-safe and the join returns nothing") {
    val big = (1L to 100L).toDF("k")
    val small = Seq.empty[Long].toDF("j")
    val out = BloomPrune.prunedSemiJoin(big, "k", small, "j", expectedItems = 10)
    assert(out.count() === 0)
  }

  test("prunedSemiJoin returns exactly the plain semi join") {
    val big = Tables.lineitem(spark, sf0001)
    val small = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.prunedSemiJoin(big, "l_orderkey", small, "o_orderkey",
        expectedItems = 10000)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSet
    val plain = big
      .join(small, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("prunedAntiJoin returns exactly the plain anti join") {
    val probe = Tables.customer(spark, sf0001)
    // urgent orders only: at sf0.001 every customer has SOME order but
    // 18 have no urgent one, so both branches of the result are exercised
    val history = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.prunedAntiJoin(probe, "c_custkey",
        history, "o_custkey", expectedItems = 10000)
      .select("c_custkey").as[Long].collect().toSet
    val plain = probe
      .join(history, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").as[Long].collect().toSet
    assert(pruned === plain)
    assert(pruned.nonEmpty, "sf0.001 has customers without urgent orders")
    assert(pruned.size < probe.count(), "and customers with urgent orders")
  }

  test("prunedAntiJoin shuffle fallback (broadcast disabled) is row-identical") {
    // with the broadcast threshold off, AQE leaves the matched-key
    // sliver on the plain shuffle-join path — the plan a
    // history-proportional match set takes at scale (ADVICE r8:
    // no forced broadcast hint); results must not move
    val probe = Tables.customer(spark, sf0001)
    val history = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    def run() = BloomPrune.prunedAntiJoin(probe, "c_custkey",
        history, "o_custkey", expectedItems = 10000)
      .select("c_custkey").as[Long].collect().toSet
    val auto = run()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val fallback =
      try { spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"); run() }
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(fallback === auto)
  }

  test("prunedAntiJoin keeps null-key probe rows, like the plain anti join") {
    val probe = Seq(Some(1L), Some(2L), None, Some(3L), None)
      .toDF("k")
    val history = Seq(2L, 9L).toDF("h")
    val got = BloomPrune.prunedAntiJoin(probe, "k", history, "h",
        expectedItems = 10)
      .as[Option[Long]].collect().toSeq
        .sortBy(_.getOrElse(Long.MinValue))
    // 2 matches history and drops; both null-key rows survive (null
    // never equi-matches), exactly as the plain left_anti behaves
    assert(got === Seq(None, None, Some(1L), Some(3L)))
  }

  test("prunedAntiJoin with empty history keeps the whole probe") {
    val probe = Seq(1L, 2L, 3L).toDF("k")
    val history = Seq.empty[Long].toDF("h")
    val got = BloomPrune.prunedAntiJoin(probe, "k", history, "h",
        expectedItems = 10)
      .as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 2L, 3L))
  }

  test("prunedAntiJoin survives duplicate keys on both sides") {
    val probe = Seq(1L, 1L, 2L, 3L, 3L).toDF("k")
    val history = Seq(3L, 3L, 4L).toDF("h")
    val got = BloomPrune.prunedAntiJoin(probe, "k", history, "h",
        expectedItems = 10)
      .as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 1L, 2L)) // both copies of 1 kept; both 3s dropped
  }
}

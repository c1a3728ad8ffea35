package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.execution.graft.GraftPlanBridge
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: drop big-side rows that cannot match
  * BEFORE the join's shuffle.
  *
  * At 100 TB the dominant cost of a selective fact⋈dim join is
  * shuffling fact rows that will never find a partner. A Bloom filter
  * of the build-side keys (a few MB for millions of keys) broadcast
  * into the probe-side scan turns those rows away at the map side, so
  * the shuffle carries only `selectivity + fpp` of the fact table. The
  * filter is only a pre-screen — the exact join still runs after it —
  * so false positives cost bandwidth, never correctness.
  *
  * Spark's AQE can inject this itself (runtime row-level filtering),
  * but only behind size heuristics; this operator makes the decision
  * explicit and testable. Built on Spark's own sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair the
  * runtime-filter rule uses), both codegen-capable, keyed on
  * `xxhash64` of the join key.
  */
object BloomPrune {

  /** Aggregate the distinct xxhash64'd keys of `df(key)` into a Bloom
    * filter, returned serialized. One partial+final aggregate pass;
    * the result is a few MB, safe to hold on the driver / broadcast. */
  def keyBloom(df: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(GraftPlanBridge.expr(col(key))), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(GraftPlanBridge.column(agg)).head().getAs[Array[Byte]](0)
  }

  /** The probe predicate: true iff `key` might be in the serialized
    * filter. False negatives are impossible. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftPlanBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftPlanBridge.expr(key)), 42L)))

  /** Semi join with map-side Bloom pruning: filter `big` by a Bloom of
    * `small`'s keys, then run the exact semi join on what survives.
    * Result is identical to the plain semi join for any filter size —
    * the Bloom only moves work, never answers. */
  def prunedSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    // xxhash64 is type-sensitive (hashInt and hashLong differ for equal
    // numeric values) while join equality coerces — mismatched key types
    // would make every probe miss and silently drop all matches, so
    // reject them loudly instead
    val (bt, st) = (big.schema(bigKey).dataType, small.schema(smallKey).dataType)
    require(bt == st,
      s"join key types must match for Bloom hashing: $bigKey is $bt, $smallKey is $st")
    val bloom = keyBloom(small, smallKey, expectedItems, fpp)
    big.filter(mightContain(bloom, big(bigKey)))
      .join(small.select(smallKey), big(bigKey) === small(smallKey), "left_semi")
  }

  /** Anti join of a SMALL probe against a HUGE filter side without ever
    * shuffling the huge side: keep `probe` rows whose key has no match
    * in `history`.
    *
    * The shape this exists for is the batch-vs-history guard of an
    * incremental pipeline (e.g. [[graft.streaming.StreamingAnalytics
    * .curateStream]]'s pass-table idempotency check): `history` is the
    * accumulated corpus — far too big to broadcast — so the plain
    * `left_anti` sort-merge-shuffles the ENTIRE history on every batch.
    * Here history is only ever scanned map-side:
    *
    *  1. a Bloom of history keys (few MB) aggregates without moving a
    *     history row;
    *  2. probe rows the Bloom rejects are DEFINITELY absent — kept with
    *     no join at all (that's `1 - fpp` of a mostly-new batch);
    *  3. the Bloom-positive sliver (`fpp` of the batch + true matches)
    *     is resolved exactly: its distinct keys broadcast INTO a semi
    *     join over history (map-side again), and the confirmed keys
    *     broadcast back into the final anti join.
    *
    * Result is identical to `probe.join(history, key, "left_anti")` for
    * any filter size — false positives only route a row through the
    * exact path. Precondition: the Bloom-positive key set must be
    * broadcastable, i.e. `probe` is batch-sized (its design center) —
    * history scale is unlimited.
    *
    * Null keys never equi-match, so a plain anti join KEEPS them; the
    * Bloom predicate evaluates to null on a null key, which would
    * silently drop such rows from both branches — they are routed
    * around the filter explicitly. */
  def prunedAntiJoin(probe: DataFrame, probeKey: String,
      history: DataFrame, historyKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val (pt, ht) = (probe.schema(probeKey).dataType, history.schema(historyKey).dataType)
    require(pt == ht,
      s"join key types must match for Bloom hashing: $probeKey is $pt, $historyKey is $ht")
    val bloom = keyBloom(history, historyKey, expectedItems, fpp)
    // empty history aggregates to a NULL sketch; the predicate would then
    // evaluate null on every row and silently drop the whole probe — for
    // an ANTI join the right answer is the probe unchanged
    if (bloom == null) return probe
    val nulls = probe.filter(col(probeKey).isNull)
    val hit = mightContain(bloom, probe(probeKey))
    val definitelyNew = probe.filter(col(probeKey).isNotNull && !hit)
    val maybe = probe.filter(col(probeKey).isNotNull && hit)
    val confirmed = history.select(col(historyKey).as(probeKey))
      .join(org.apache.spark.sql.functions.broadcast(
        maybe.select(probeKey).distinct()), Seq(probeKey), "left_semi")
      .distinct()
    val kept = maybe.join(
      org.apache.spark.sql.functions.broadcast(confirmed), Seq(probeKey), "left_anti")
    definitelyNew.unionByName(kept).unionByName(nulls)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join split isn't enough (e.g. one key holding >50% of a 100 TB
  * fact table, or a skewed aggregation rather than a join).
  *
  * Shape: the skewed (big) side gets a deterministic salt in [0, S) per
  * row; the small side is replicated S times with every salt; the join
  * key becomes (key, salt), spreading each hot key over S shuffle
  * partitions. Deterministic salting (hash of a unique column, not
  * rand()) keeps retries/resumes stable.
  *
  * Cost model: replicates the small side S× — use only when
  * |small| × S ≪ shuffle volume saved on the hot keys; at that point it
  * turns one straggler task into S parallel ones.
  */
object SkewJoin {

  /** Inner/left equi-join `big.key == small.key` with salt fan-out S.
    * `bigSaltSource` must be a column of `big` that varies per row (a
    * unique id) so salts distribute evenly and deterministically. */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      bigSaltSource: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(bigSaltSource), lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Skew-safe grouped count: two-phase aggregation — partial count per
    * (key, salt), then final sum per key. The first shuffle spreads each
    * hot key over S partitions; the second moves only S rows per key. */
  def saltedCount(big: DataFrame, key: String, bigSaltSource: Column, salts: Int): DataFrame =
    big.withColumn("_salt", pmod(xxhash64(bigSaltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
}

package graft.functions

import org.apache.spark.sql.Column

/** The repo's ONE deterministic sampling/shuffling hash: a two-step
  * Lehmer mix with the key pre-reduced mod 2³¹−1.
  *
  * Why this exact shape (and why it must never be re-typed inline):
  * each product is at most (2³¹−2)·48271 ≈ 1.0e14, far inside a long,
  * so the arithmetic can never overflow (ANSI mode would throw, not
  * wrap) at any NON-NEGATIVE key scale — unlike a raw Knuth multiply,
  * which leaves long range once keys pass ~3.4e9. Keys MUST be ≥ 0:
  * SQL `%` follows the dividend's sign, so a negative key hashes
  * negative and compares below every sampling threshold (selected
  * wholesale). All current call sites pass non-negative ids
  * (PropertiesSpec pins this); normalize with pmod before calling if a
  * signed key ever appears. Two steps, not one: a single
  * multiply leaves keys below ~44k un-wrapped (k·48271 < 2³¹−1), so
  * the smallest keys would be selected wholesale instead of hashed.
  * Seedless and engine-neutral: the DuckDB oracles inline the same
  * formula, which is what makes every sample/mix/shuffle/shard result
  * bit-reproducible across engines, partitionings, and runs.
  *
  * Used by: sample_det, sample_stratified, corpus_mix, corpus_shuffle,
  * corpus_shard, dsir_resample. */
object DetMix {
  val Modulus = 2147483647L // 2^31 - 1
  val Multiplier = 48271L   // MINSTD

  /** `((key mod M) · g mod M) · g mod M` as a codegen'd column. */
  def lehmerMix(key: Column): Column =
    (key % Modulus) * Multiplier % Modulus * Multiplier % Modulus
}

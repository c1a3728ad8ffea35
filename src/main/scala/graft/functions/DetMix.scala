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

  /** 62-bit mix for DERIVING VALUES AGAINST MODULI PAST 2³¹ (ADVICE
    * r14: [[graft.text.TextAnalysis.samplePps]]'s per-source phase is
    * `mix mod W`, and with [[lehmerMix]]'s ≤ 2³¹−2 range a token mass
    * W ≫ 2³¹ would collapse the phase toward 0 — degenerating Madow
    * boundary placement to the phase-0 grid). Two decorrelated Lehmer
    * streams over the key's LOW and HIGH 31-bit halves, concatenated
    * base-M: the result spans [0, M²−1] ≈ [0, 2⁶²) and uses the full
    * information of a 62-bit key, every product stays ≤ (M−1)·M
    * ≈ 4.6e18 — far inside a signed long, so no wraparound for either
    * engine to disagree on (DuckDB errors on BIGINT overflow; ANSI
    * Spark would too). The high half is offset by 1 so keys under 2³¹
    * do not pin the low stream at the mix(0) = 0 fixed point. Same
    * contract as [[lehmerMix]]: key ≥ 0 (and < 2⁶² — beyond any token
    * mass this engine addresses); seedless, engine-neutral — the
    * DuckDB oracles inline the identical shift/mask/multiply chain. */
  def lehmerMix62(key: Column): Column =
    lehmerMix(key.bitwiseAND(org.apache.spark.sql.functions.lit(Modulus))) *
      Modulus +
      lehmerMix(org.apache.spark.sql.functions.shiftright(key, 31) + 1L)
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional upgrade of a
  * lexicographic sort key for data-skipping layouts.
  *
  * The reference's MergeTree orders by `(event_time, product_id)`
  * (generate_data.py:172): min/max stats then prune time-range scans,
  * but a `product_id`-only predicate still reads everything because the
  * second sort column has no locality of its own. Interleaving the bits
  * of both dimensions gives every file a bounded range in BOTH — a
  * Z-curve tile — so single-dimension predicates on either column skip
  * most files (the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Built entirely from codegen'd built-ins (shifts, masks, or) — the
  * classic 5-step bit-spreading; no UDF, no custom expression. Inputs
  * are truncated to their low 31 bits (not 32: bit 31 of the second
  * dimension would land in the long's sign bit and make the key
  * negative, sorting those tiles before everything else), so callers
  * should ensure the low 31 bits are the significant ones (bucket
  * timestamps first, e.g. to minutes). */
object ZOrder {

  /** Spread the low 31 bits of `c` to the even bit positions of a long. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** The interleaved key: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Ordering by this key walks the Z-curve over (a, b).
    * Always non-negative: 31-bit inputs top out at bit positions 60/61. */
  def zkey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Reference interleave on the driver, for tests. */
  private[graft] def zkeyRef(a: Long, b: Long): Long = {
    def sp(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      (x | (x << 1)) & 0x5555555555555555L
    }
    sp(a) | (sp(b) << 1)
  }
}

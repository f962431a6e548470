package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout
  * primitive behind lakehouse `OPTIMIZE ZORDER BY`: sorting/bucketing
  * by the bit-interleaved key clusters rows so that a RANGE of z
  * values constrains EVERY participating dimension at once, which is
  * what lets min/max file statistics skip data for predicates on any
  * of the dimensions (a linear sort clusters only its leading
  * column). The guarantee is exact: fixing the top 2k bits of a
  * 2-dim z value fixes the top k bits of each dimension, so a
  * z-bucket's bounding box spans at most 2^(bits-k) per dimension.
  *
  * Pure closed-form column arithmetic (20 shift/mask terms for 2×10
  * bits) — codegen'd scan-side, no UDF, and reproduced verbatim by
  * the DuckDB oracle twin, which is the point: layout keys must be
  * engine-independent so the table stays portable. */
object ZOrder {

  /** Bit-interleave two non-negative ints of `bits` bits each:
    * dimension x occupies even bit positions, y odd. Inputs are
    * masked to `bits` bits (callers bucket/normalise first). */
  def interleave2(x: Column, y: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) out of range")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }
}

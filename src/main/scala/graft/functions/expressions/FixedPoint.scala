package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Allocation-free fixed-point kernels for the deterministic-sum hot
  * paths (PageRank supersteps): convert a double to its EXACT binary
  * value rounded half-up to 18 decimal places, as a primitive long of
  * unscaled 1e-18 units — so the per-edge contribution sum becomes a
  * Tungsten primitive-long hash aggregation instead of a
  * decimal(38,18) sum whose every add allocates BigDecimals.
  *
  * Value contract: `unscaled18(w) * 1e-18` is the exact binary
  * expansion of `w` rounded HALF_UP (away from zero) at the 18th
  * decimal — the same rounding rule, applied to the exact binary
  * value, that `CAST(w AS DECIMAL(38,18))` applies to the SHORTEST
  * decimal representation (`BigDecimal.valueOf`). The two differ by
  * at most one 1e-18 unit on doubles whose shortest form re-rounds
  * differently than the full expansion; consumers (PageRank's
  * round-to-6 ranks) sit 11 orders of magnitude above that. What the
  * conversion preserves exactly is the property the decimal cast was
  * bought for: a deterministic, accumulation-order-independent sum.
  *
  * Determinism: pure bit arithmetic on the IEEE representation —
  * identical output on any JVM/partitioning.
  */
object FixedPoint {

  /** 10^18 — one unit = 1e-18. */
  val Unit18: Long = 1000000000000000000L

  /** Splitting modulus for overflow-safe partial sums: callers sum
    * `u / SplitMod` and `u % SplitMod` separately (each bounded by
    * 9.3e9 per row), so per-group totals stay exact up to ~1e9 rows
    * per group where a raw Σu would wrap past 2^63 at a group value
    * sum of just 9.3. */
  val SplitMod: Long = 1000000000L

  /** Exact-binary-value-of-`w` rounded HALF_UP to 18 decimals, as
    * unscaled 1e-18 units. Caller guarantees `|w| < 9.0` and finite
    * (the [[Fixed18]] expression returns NULL outside that range and
    * the SQL plan falls back to the decimal cast). Allocation-free:
    * a 128-bit mantissa·10^18 product via multiplyHigh, then an exact
    * right-shift with the top dropped bit deciding the round. */
  def unscaled18(w: Double): Long = {
    if (w == 0.0) return 0L
    val neg = w < 0
    val bits = java.lang.Double.doubleToLongBits(if (neg) -w else w)
    val biased = ((bits >>> 52) & 0x7ffL).toInt
    val frac = bits & 0x000fffffffffffffL
    val m = if (biased == 0) frac else frac | (1L << 52)
    val s = if (biased == 0) 1074 else 1075 - biased // |w| = m * 2^-s
    // m * 10^18 as a 128-bit value (hi:lo); m < 2^53, 10^18 < 2^60
    val hi = Math.multiplyHigh(m, Unit18)
    val lo = m * Unit18
    // u = round_half_up((hi·2^64 + lo) / 2^s); |w| < 9 ⇒ s ≥ 49,
    // so every branch shifts by a legal 0..63
    val u =
      if (s >= 128) 0L // value·1e18 ≤ 2^113/2^128 < 0.5 → rounds to 0
      else if (s >= 64) {
        val k = s - 64
        val q = if (k == 0) hi else hi >>> k
        // fraction ≥ 1/2 iff bit (s-1) of the product is set
        val up = if (k == 0) lo < 0 else ((hi >>> (k - 1)) & 1L) == 1L
        if (up) q + 1 else q
      } else {
        val q = (hi << (64 - s)) | (lo >>> s)
        val up = ((lo >>> (s - 1)) & 1L) == 1L
        if (up) q + 1 else q
      }
    if (neg) -u else u
  }

  /** Reassemble per-group partial sums into the double the decimal
    * path would produce: `toDouble(Σ contributions)` where the small
    * contributions arrive as split long sums (hi = Σ u/SplitMod,
    * lo = Σ u%SplitMod) and any out-of-range stragglers as an exact
    * decimal(38,18) sum. One BigDecimal per GROUP, not per row. */
  def combine18(hi: Long, lo: Long, big: org.apache.spark.sql.types.Decimal): Double = {
    val unscaled = java.math.BigInteger.valueOf(hi)
      .multiply(java.math.BigInteger.valueOf(SplitMod))
      .add(java.math.BigInteger.valueOf(lo))
    val small = new java.math.BigDecimal(unscaled, 18)
    (if (big eq null) small else small.add(big.toJavaBigDecimal)).doubleValue
  }
}

/** `fixed18(w)`: [[FixedPoint.unscaled18]] as a codegen expression.
  * NULL for NULL, non-finite, or `|w| ≥ 9.0` input (the fallback
  * range a caller routes through the plain decimal cast). */
case class Fixed18(child: Expression) extends UnaryExpression {
  override def prettyName: String = "fixed18"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${t.simpleString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val w = v.asInstanceOf[Double]
      if (java.lang.Double.isNaN(w) || math.abs(w) >= 9.0) null
      else FixedPoint.unscaled18(w)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${c.isNull} && !Double.isNaN(${c.value}) &&
            Math.abs(${c.value}) < 9.0) {
          ${ev.isNull} = false;
          ${ev.value} = graft.functions.expressions.FixedPoint.unscaled18(${c.value});
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `fixed_combine(sum_hi, sum_lo, sum_big)`: [[FixedPoint.combine18]]
  * as a codegen expression — per-group reassembly of the split fixed-
  * point sums plus the decimal straggler sum into the exact-total
  * double. `sum_big` NULL means no straggler rows. Result is NULL
  * only when `sum_hi`/`sum_lo` are NULL (an empty group). */
case class FixedCombine(hi: Expression, lo: Expression, big: Expression)
    extends TernaryExpression {
  override def prettyName: String = "fixed_combine"
  override def first: Expression = hi
  override def second: Expression = lo
  override def third: Expression = big
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (hi.dataType, lo.dataType, big.dataType) match {
      case (LongType, LongType, DecimalType()) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (long, long, decimal), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val h = hi.eval(input)
    val l = lo.eval(input)
    if (h == null || l == null) null
    else {
      val b = big.eval(input)
      FixedPoint.combine18(h.asInstanceOf[Long], l.asInstanceOf[Long],
        if (b == null) null else b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = hi.genCode(ctx)
    val l = lo.genCode(ctx)
    val b = big.genCode(ctx)
    ev.copy(code =
      code"""
        ${h.code}
        ${l.code}
        ${b.code}
        boolean ${ev.isNull} = ${h.isNull} || ${l.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.expressions.FixedPoint.combine18(
            ${h.value}, ${l.value}, ${b.isNull} ? null : ${b.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(hi = f, lo = s, big = t)
}

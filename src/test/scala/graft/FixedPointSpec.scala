package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.{FixedPoint, GraftFunctions}

/** Pins the fixed-point PageRank kernels:
  *  - unscaled18 == BigDecimal exact-binary HALF_UP reference on
  *    adversarial and random doubles (the bit-twiddled 128-bit shift
  *    must round EXACTLY like new BigDecimal(w).setScale(18, HALF_UP))
  *  - the codegen expressions round-trip through SQL
  *  - pageRankDeterministic's fixed-point superstep equals the
  *    decimal(38,18) formulation it replaced, bit-for-bit, on a graph
  *    with hubs, cycles, dangling vertices and self-contributions
  */
class FixedPointSpec extends SparkSpec {
  import spark.implicits._

  private def reference(w: Double): Long =
    new java.math.BigDecimal(w)
      .setScale(18, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("unscaled18 matches the BigDecimal exact-binary HALF_UP reference") {
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5, 0.25, 0.1, 0.3, 1.0 / 3.0, 2.0 / 3.0,
      8.999999999999998, -8.999999999999998, 1e-18, 5e-19, 4.9999e-19,
      1e-19, 1e-300, -1e-300, java.lang.Double.MIN_VALUE,
      -java.lang.Double.MIN_VALUE, java.lang.Double.MIN_NORMAL,
      math.Pi, math.E, 0.15, 0.85, 1.0 / 7, 1.0 / 6, 0.15 / 1.0,
      // dyadic values whose ×1e18 is an exact integer (no rounding)
      0.125, 3.0625, 2.9802322387695312e-8,
      // values straddling the 2^63/1e18 shift-branch boundary s=49 vs 50
      8.0, 8.5, 7.999999999999999, 4.000000000000001)
    for (w <- adversarial) {
      assert(FixedPoint.unscaled18(w) === reference(w), s"w=$w")
    }
    val rnd = new scala.util.Random(20260815L)
    var i = 0
    while (i < 200000) {
      // log-uniform magnitude over the full in-range spectrum,
      // including subnormal territory
      val mag = math.pow(10.0, -320.0 + rnd.nextDouble() * 320.9) // up to ~8.9
      val w0 = if (rnd.nextBoolean()) mag else -mag
      val w = if (math.abs(w0) >= 9.0) w0 / 2 else w0
      assert(FixedPoint.unscaled18(w) === reference(w), s"w=$w bits=${java.lang.Double.doubleToLongBits(w)}")
      // also exercise raw-bit-pattern doubles near the mantissa edges
      val bits = (rnd.nextLong() & 0x000fffffffffffffL) |
        ((rnd.nextInt(1023).toLong + 1) << 52)
      val wb = java.lang.Double.longBitsToDouble(bits)
      if (!wb.isNaN && !wb.isInfinite && math.abs(wb) < 9.0)
        assert(FixedPoint.unscaled18(wb) === reference(wb), s"wb=$wb")
      i += 1
    }
  }

  test("combine18 reassembles split sums into toDouble(exact total)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val us = Seq.fill(rnd.nextInt(50) + 1)(
        FixedPoint.unscaled18(rnd.nextDouble() * 8.9))
      val hi = us.map(_ / FixedPoint.SplitMod).sum
      val lo = us.map(_ % FixedPoint.SplitMod).sum
      val exact = us.foldLeft(java.math.BigDecimal.ZERO)((a, u) =>
        a.add(new java.math.BigDecimal(java.math.BigInteger.valueOf(u), 18)))
      assert(FixedPoint.combine18(hi, lo, null) === exact.doubleValue)
      // with a decimal straggler
      val big = org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal("12.345678901234567890123")
          .setScale(18, java.math.RoundingMode.HALF_UP), 38, 18)
      assert(FixedPoint.combine18(hi, lo, big) ===
        exact.add(big.toJavaBigDecimal).doubleValue)
    }
  }

  test("fixed18/fixed_combine work through SQL codegen and match eval") {
    GraftFunctions.register(spark)
    val ws = (1 to 5000).map(i => (i.toLong, 1.0 / i + i * 1e-4)).toDF("id", "w")
    val got = ws.selectExpr("id", "fixed18(w) AS u", "w")
      .where(expr(s"u <> 0"))
      .selectExpr("id", "u", "fixed_combine(u div 1000000000, u % 1000000000, CAST(NULL AS DECIMAL(38,18))) AS back")
      .collect()
    assert(got.length === 5000)
    for (r <- got) {
      val id = r.getLong(0)
      val w = 1.0 / id + id * 1e-4
      assert(r.getLong(1) === reference(w), s"id=$id")
      assert(r.getDouble(2) ===
        new java.math.BigDecimal(java.math.BigInteger.valueOf(r.getLong(1)), 18).doubleValue)
    }
    // out-of-range and NaN → NULL (the decimal-fallback contract)
    val edge = Seq(9.0, 10.5, -9.0, Double.NaN,
      Double.PositiveInfinity).toDF("w")
      .selectExpr("fixed18(w) AS u").collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("fixed-point pagerank equals the decimal(38,18) formulation bit-for-bit") {
    // hub (1 → everything), a 3-cycle, a dangling sink, a chain — the
    // shapes that stress contribution magnitude and missing-vertex fill
    val edges = (
      (2 to 20).map(i => (1L, i.toLong)) ++
        Seq((2L, 3L), (3L, 4L), (4L, 2L), (5L, 6L), (6L, 7L),
          (10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L), (14L, 1L))
      ).toDF("src", "dst")
    val got = graft.operators.Traversals
      .pageRankDeterministic(edges, iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: the superseded per-edge decimal(38,18) cast + decimal
    // sum formulation, evaluated inline
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("odeg"))
    val eo = e.join(outDeg, "src")
    val verts = eo.select(col("src").as("vertex"))
      .union(eo.select(col("dst").as("vertex"))).distinct()
    val zeros = verts.select(col("vertex"),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)").as("w"))
    var r = verts.withColumn("rank", lit(1.0))
    for (_ <- 1 to 12) {
      val contrib = eo.join(r, eo("src") === r("vertex"))
        .select(eo("dst").as("vertex"),
          (col("rank") / col("odeg")).cast("decimal(38,18)").as("w"))
      r = contrib.union(zeros).groupBy("vertex")
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double")).as("rank"))
        .localCheckpoint(true)
    }
    val ref = r.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    // the two per-edge conversions (exact-binary vs shortest-repr
    // HALF_UP at 1e-18) may differ by 1 unit in the last place of the
    // DECIMAL, i.e. ~1e-18 per edge — assert equality at full double
    // precision scaled by a 1e-12 guard, and EXACT equality of the
    // round-6 gate projection
    for ((v, rk) <- ref) {
      assert(math.abs(got(v) - rk) <= math.max(1e-12, math.ulp(rk) * 64), s"v=$v got=${got(v)} ref=$rk")
      assert(BigDecimal(got(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP) ===
        BigDecimal(rk).setScale(6, BigDecimal.RoundingMode.HALF_UP), s"v=$v round6")
    }
  }
}

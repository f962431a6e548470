package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine money-aggregate parity helpers, shared by every
  * query module so the pattern lives in ONE place.
  *
  * Rationale: l_extendedprice / l_discount / l_tax / balances are
  * 2-decimal values, so a product of two of them is exactly a
  * 4-decimal number and a three-way product exactly 6-decimal.
  * Casting each double product to a decimal of that scale recovers
  * the exact value in BOTH engines (the double sits within ~1e-10 of
  * the grid point, so nearest-rounding is unambiguous regardless of
  * tie mode), the decimal sum is order-independent, and the final
  * double conversion is the same correctly-rounded IEEE value. A raw
  * double sum is order-dependent, and round(_, 2) of it can land on a
  * half-cent tie — q_tpch_q10 hash-mismatched in round 2 exactly this
  * way. DuckDB twin: `sum((term)::DECIMAL(18,s))::DOUBLE`.
  */
object Parity {

  /** Order-independent sum of 4-decimal-exact terms (two-factor money
    * products), as double. */
  def decSum4(term: Column): Column =
    sum(term.cast("decimal(18,4)")).cast("double")

  /** Order-independent sum of 6-decimal-exact terms (three-factor
    * money products), as double. */
  def decSum6(term: Column): Column =
    sum(term.cast("decimal(18,6)")).cast("double")

  /** Order-independent sum of 2-decimal-exact values, as double. */
  def decSum2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact average of 2-decimal values: exact decimal sum divided as
    * doubles — the same IEEE division in both engines. DuckDB twin:
    * `sum(c::DECIMAL(18,2))::DOUBLE / count(*)`. */
  def decAvg2(c: Column): Column = decSum2(c) / count(lit(1))

  /** The TPC-H revenue aggregate: sum of l_extendedprice*(1-l_discount)
    * as exact 4-decimal terms. */
  def revenueSum: Column =
    decSum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
}

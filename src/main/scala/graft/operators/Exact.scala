package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE decimal-exact aggregation convention, in one place.
  *
  * Double sums are order-dependent — a Spark sum and a DuckDB sum can
  * differ in the last ulp, which is fatal for the driver's hash compare.
  * All money/quantity aggregates therefore run in DECIMAL (exact,
  * associative) and only the final value is cast back to double. The
  * 2-decimal inputs are exactly representable in DECIMAL(18,2), so both
  * engines produce bit-identical doubles with no rounding anywhere.
  * Every query tranche MUST use these helpers (a precision change here
  * is the single point of sync with the oracle SQL convention).
  */
object Exact {
  val dec = "decimal(18,2)"

  /** Exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Exact sum of price*(1-discount), as double. */
  def revenue(price: Column, disc: Column): Column =
    sum(price.cast(dec) * (lit(1).cast(dec) - disc.cast(dec))).cast("double")

  /** Exact average: exact decimal sum over an exact count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}

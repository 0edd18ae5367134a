package graft.olap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for money aggregation.
  *
  * Source money columns are 2-dp values stored as doubles; casting to
  * DECIMAL(18,2) is exact (no .xx5 ties exist at the data's precision), and
  * decimal sums/products are associative — so results are independent of
  * partitioning and accumulation order, unlike double sums which drift in
  * the low bits. Final results come back as doubles via one deterministic
  * correctly-rounded conversion. Scales are kept minimal (2/4 dp) so the
  * unscaled sums stay well under 2^53 and the decimal→double conversions in
  * any engine agree bitwise.
  */
object Exact {
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Small-range 2-dp rate (discount/tax). */
  def rate(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Exact order-independent sum of a 2-dp money column, as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** avg = exact decimal sum / count, one double division. */
  def avgMoney(c: Column): Column =
    sum(money(c)).cast("double") / count(lit(1)).cast("double")

  /** TPC-H style discounted revenue: extendedprice * (1 - discount), exact
    * at 4 dp (DECIMAL(18,2) × DECIMAL(9,2)).
    */
  def revenue(extendedPrice: Column, discount: Column): Column =
    money(extendedPrice) * (lit(1).cast(DecimalType(8, 2)) - rate(discount))

  def sumRevenue(extendedPrice: Column, discount: Column): Column =
    sum(revenue(extendedPrice, discount)).cast("double")

  /** Oracle-side SQL fragments mirroring the same arithmetic. */
  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))"
}

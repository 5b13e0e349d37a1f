package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic ("exact") numeric aggregation helpers.
  *
  * Background: summing IEEE doubles is order-dependent, and Spark's
  * partial+final aggregation order differs from any single-threaded oracle
  * (DuckDB). Over ~60k rows the drift can exceed the driver's 6-decimal
  * rounding granularity, so hash-compared aggregates must NOT sum raw
  * doubles. Instead we cast to exact decimals, sum exactly (associative,
  * order-independent), and cast the final scalar back to double — bitwise
  * identical in every engine. The same trick is applied in the oracle SQL.
  *
  * At 100 TB this costs one decimal conversion per row inside codegen'd
  * HashAggregate (partial+final map-side combine still applies); decimal
  * sum precision (38,scale) cannot overflow at any realistic row count for
  * money-scale inputs (max ~1e5 * 1e12 rows = 1e17 << 1e34).
  */
object Exact {
  /** Money-scale values (prices, balances): 4 decimal places.
    * Precision 11 is deliberate and load-bearing: a triple product
    * (price * (1-disc) * (1+tax)) is (11,4)×(12,4)×(12,4) → (37,12),
    * which stays UNDER Spark's 38-digit cap, so no allowPrecisionLoss
    * scale reduction ever fires and every product is exact. At (28,4)
    * the same chain hits the cap, Spark silently rounds intermediate
    * scale to 6, and sums drift from the oracle at sf0.1+ (observed:
    * 7th decimal of a 2.8e9 total). Max representable 9,999,999.9999
    * comfortably covers all fixture money columns. */
  val Money: DecimalType = DecimalType(11, 4)
  /** Product-of-money terms (price * (1-disc) * (1+tax)): 12 places. */
  val Fine: DecimalType = DecimalType(38, 12)

  def dec(c: Column): Column = c.cast(Money)
  def decFine(c: Column): Column = c.cast(Fine)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact sum of a product expression; operands must be pre-cast via
    * [[dec]] so the multiply itself is decimal (exact). */
  def dsumExpr(c: Column): Column = sum(c.cast(Fine)).cast(DoubleType)

  /** Exact average = exact sum / count, divided as doubles at the end. */
  def davg(c: Column): Column =
    (sum(c.cast(Money)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Exact product-sum kept as DECIMAL — for two-level aggregations
    * (partial agg below a join, re-aggregated after) where the double
    * cast must wait until the FINAL sum. */
  def dsumExprDec(c: Column): Column = sum(c.cast(Fine))
}

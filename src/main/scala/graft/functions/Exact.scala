package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers.
  *
  * Double summation is order-dependent across shuffle partitions, so
  * every money-ish aggregate casts to DECIMAL *before* SUM: decimal
  * addition is associative/commutative, which makes results identical
  * regardless of partitioning — a requirement both for the DuckDB
  * oracle hash-match and for run-to-run determinism on a real cluster.
  */
object Exact {
  /** 2-dp money column (source doubles are generated at 2 dp, so this
    * cast is exact). */
  def d2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** small 2-dp rate column (discount / tax). */
  def r2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** price * (1 - discount), exact at scale 4. */
  def discPrice(price: Column, disc: Column): Column =
    (d2(price) * (lit(1) - r2(disc))).cast(DecimalType(16, 4))

  /** price * (1 - discount) * (1 + tax), exact at scale 6. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    (discPrice(price, disc) * (lit(1) + r2(tax))).cast(DecimalType(18, 6))

  /** Final-output sum of a scale-`scale` decimal column: exact,
    * order-independent, and FAST — the decimal is lifted to its
    * unscaled int64 (c·10^scale, exact) and summed as LONG, because
    * Spark's native decimal SUM widens precision by 10 and any
    * accumulator over precision 18 falls off the long-backed fast
    * path onto BigDecimal (~4x the aggregation wall-clock, measured
    * on q01). The emitted column is DOUBLE so Spark and the DuckDB
    * oracle print the identical float64; while the unscaled sum is
    * below 2^53 (10^15 at 2dp — ANSI mode faults loudly on int64
    * overflow long before results could silently drift) the division
    * reproduces bit-for-bit the decimal-sum-then-cast value, so
    * oracle SQL stays CAST(SUM(CAST(...)) AS DOUBLE). */
  def sumDec(c: Column, scale: Int): Column = {
    val factor = math.pow(10, scale)
    sum((c * lit(factor.toLong)).cast("long")).cast("double") / lit(factor)
  }

  /** 2-dp decimal sum emitted as DOUBLE, empty group → 0.0 (mirror
    * with CAST(COALESCE(SUM(CAST(x AS DECIMAL(12,2))),0) AS DOUBLE)
    * in oracle SQL). */
  def sumD2(c: Column): Column =
    coalesce(sumDec(d2(c), 2), lit(0.0))
}

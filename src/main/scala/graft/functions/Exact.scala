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

  /** Final-output sum: the SUM itself runs in decimal (exact, order-
    * independent across shuffle partitions), but the *emitted* column is
    * cast to DOUBLE so Spark and the DuckDB oracle print the identical
    * float64 — decimal trailing-zero strings ('995.80' vs '995.8')
    * otherwise flip the driver's value hash. Mirror with
    * CAST(SUM(...) AS DOUBLE) in oracle SQL. */
  def sumDec(c: Column, scale: Int): Column =
    sum(c).cast(DecimalType(38, scale)).cast("double")

  /** 2-dp decimal sum emitted as DOUBLE, empty group → 0.0 (mirror
    * with CAST(COALESCE(SUM(CAST(x AS DECIMAL(12,2))),0) AS DOUBLE)
    * in oracle SQL). */
  def sumD2(c: Column): Column =
    coalesce(sum(d2(c)).cast("double"), lit(0.0))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the polynomial hash of every L-CHARACTER
  * window of a string, computed with the O(n) ROLLING recurrence in one
  * pass — the per-position fingerprint stream for exact-substring
  * duplication detection (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better": training corpora carry long
  * verbatim substrings shared across documents; the practical
  * at-scale signal is "how many of a document's L-char windows occur
  * in another document", keyed on window hashes).
  *
  * h(window at i) = Σ_{j<L} cp(i+j) · B^{L-1-j}  mod M over Unicode
  * CODE POINTS (so Spark and DuckDB index the same units regardless
  * of UTF-8 byte widths), B = [[RollingHashes.B]], M =
  * [[RollingHashes.M]] (prime 10^12+39: terms (cp·P) mod M < 2^40,
  * L-term sums < 2^46, the rolling step (h·B + cp) < 2^60 — every
  * intermediate exact in int64). The ORACLE computes the identical
  * value as the direct per-window sum with the power table inlined as
  * SQL literals ([[RollingHashes.powersSqlList]]) — O(n·L) there vs
  * O(n) here, because SQL cannot express the rolling reuse without
  * recursion; same discipline as ShingleHashes: both engines hash,
  * then key EVERYTHING on h, so hash collisions (expected ~n²/2M —
  * ~45 in 20M windows at sf1) affect both sides identically and cost
  * only a vanishing false-positive rate in the SIGNAL, never
  * cross-engine agreement.
  *
  * Fewer than L characters → empty array; NULL → NULL.
  */
case class RollingHashes(child: Expression, l: Int) extends UnaryExpression {

  require(l >= 2, s"window length must be >= 2, got $l")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      RollingHashes.compute(input.asInstanceOf[UTF8String], l))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.RollingHashes.compute($s, $l));")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** Polynomial base (the ShingleHashes plane-prime, coprime to M). */
  val B = 1000003L

  /** Modulus: prime 10^12 + 39 — large enough that window-collision
    * false positives are ~n²/2M, small enough that every intermediate
    * stays exact in int64 (see class scaladoc). */
  val M = 1000000000039L

  /** B^k mod M for k = 0 .. l-1 (index k). */
  def powers(l: Int): Array[Long] = {
    val p = new Array[Long](l)
    p(0) = 1L
    var k = 1
    while (k < l) { p(k) = mulMod(p(k - 1), B); k += 1 }
    p
  }

  /** The power table P_j = B^{l-1-j} mod M as a DuckDB list literal,
    * for the oracle's direct-sum mirror. */
  def powersSqlList(l: Int): String =
    powers(l).reverse.mkString("[", ",", "]")

  /** (a*b) mod M without overflow: a < M < 2^40 and b ≤ B < 2^20 keep
    * the product under 2^60; for two sub-M factors split b. */
  private def mulMod(a: Long, b: Long): Long =
    if (b <= B) (a * b) % M
    else { // generic path (unused in the hot loop, kept total)
      var r = 0L; var x = a % M; var y = b
      while (y > 0) {
        if ((y & 1L) == 1L) r = (r + x) % M
        x = (x << 1) % M; y >>= 1
      }
      r
    }

  /** All L-char-window hashes of `s`, rolling O(n); called from both
    * interpreted eval and generated code — must stay public. */
  def compute(s: UTF8String, l: Int): Array[Long] = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < l) return Array.emptyLongArray
    val pTop = powers(l)(l - 1)
    val out = new Array[Long](n - l + 1)
    var h = 0L
    var i = 0
    while (i < l) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    while (i < n) {
      // remove cps(i-l), shift, add cps(i): all intermediates < 2^60
      h = Math.floorMod(h - (cps(i - l) % M) * pTop % M, M)
      h = (h * B + cps(i)) % M
      out(i - l + 1) = h
      i += 1
    }
    out
  }

  def apply(s: Column, l: Int): Column =
    SparkSqlBridge.column(new RollingHashes(SparkSqlBridge.expression(s), l))
}

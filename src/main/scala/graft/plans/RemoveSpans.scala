package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: cut the L-CODEPOINT windows starting at
  * the given positions out of a string — the surgery step of
  * exact-substring dedup ([[graft.operators.Dedup.stripDupSpans]]).
  * Overlapping windows merge naturally (a code point is dropped if ANY
  * window covers it), so removal never double-counts. Positions are
  * 0-based code-point indices (the [[RollingHashes]] window indexing);
  * out-of-range positions are clipped. NULL text → NULL; NULL/empty
  * position array → the text unchanged. */
case class RemoveSpans(left: Expression, right: Expression, l: Int)
    extends BinaryExpression {

  require(l >= 1, s"window length must be >= 1, got $l")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<bigint>), got (${a.catalogString}, ${b.catalogString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_spans"

  override def nullSafeEval(text: Any, positions: Any): Any =
    RemoveSpans.compute(text.asInstanceOf[UTF8String],
      positions.asInstanceOf[ArrayData].toLongArray(), l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.plans.RemoveSpans.compute($t, $p.toLongArray(), $l);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveSpans =
    copy(left = newLeft, right = newRight)
}

object RemoveSpans {
  /** Called from both interpreted eval and generated code — public. */
  def compute(s: UTF8String, positions: Array[Long], l: Int): UTF8String = {
    if (positions.isEmpty) return s
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val drop = new Array[Boolean](n)
    var k = 0
    while (k < positions.length) {
      // clip the window's INTERSECTION with [0, n) in LONG space
      // before narrowing: a position >= 2^32 must clip to the string
      // end (not wrap through .toInt), a negative one keeps only the
      // in-range tail of its window
      val p = positions(k)
      var i = Math.min(Math.max(0L, p), n.toLong).toInt
      val end = Math.max(0L, Math.min(n.toLong, p + l)).toInt
      while (i < end) { drop(i) = true; i += 1 }
      k += 1
    }
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { if (!drop(i)) sb.appendCodePoint(cps(i)); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  def apply(text: Column, positions: Column, l: Int): Column =
    SparkSqlBridge.column(new RemoveSpans(
      SparkSqlBridge.expression(text), SparkSqlBridge.expression(positions), l))
}

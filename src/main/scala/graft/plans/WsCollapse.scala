package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression:
  * `regexp_replace(text, "[ \t\n\x0B\f\r]+", " ")` — every maximal
  * whitespace run collapsed to one space — as a single byte pass
  * instead of a java.util.regex traversal. This is the normalization
  * step inside `TextFunctions.fingerprint` (q31/q34/q78): after
  * PiiScan went native, it was the last regex pass left on the q78
  * hot path.
  *
  * Exactness: the pattern's class is the explicit cross-engine
  * whitespace set (`TextFunctions.WsChars` — all single ASCII bytes),
  * the replacement is a literal space, and a leftmost-greedy match of
  * `[ws]+` is precisely "maximal whitespace run" — no backtracking,
  * no `\b`, no multi-byte class members, so byte-level simulation is
  * trivially identical on BOTH java.util.regex and RE2 (unlike
  * PiiScan there is no engine divergence to take a side on). The
  * ORACLE keeps the regexp form; TextFunctionsSpec property-pins this
  * class against it.
  *
  * No-op inputs (no ws byte besides single spaces with non-ws
  * neighbors — the common case for normalized corpus text) return the
  * input UTF8String zero-copy.
  */
case class WsCollapse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "ws_collapse"

  override def nullSafeEval(input: Any): Any =
    WsCollapse.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.WsCollapse.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): WsCollapse =
    copy(child = newChild)
}

object WsCollapse {
  // the explicit TextFunctions.WsChars set: ' ' \t \n \x0B \f \r
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= 9 && b <= 13)

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // count ws bytes and runs; detect the identity fast path
    var wsBytes = 0
    var runs = 0
    var inRun = false
    var identity = true
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isWs(b)) {
        wsBytes += 1
        if (!inRun) { runs += 1; inRun = true } else identity = false
        if (b != ' ') identity = false
      } else inRun = false
      i += 1
    }
    if (identity) return s
    val src = s.getBytes
    val out = new Array[Byte](n - wsBytes + runs)
    var w = 0
    i = 0
    while (i < n) {
      val b = src(i)
      if (isWs(b)) {
        out(w) = ' '; w += 1
        while (i < n && isWs(src(i))) i += 1
      } else { out(w) = b; w += 1; i += 1 }
    }
    UTF8String.fromBytes(out)
  }

  /** DataFrame-API entry point. */
  def apply(text: Column): Column =
    SparkSqlBridge.column(WsCollapse(SparkSqlBridge.expression(text)))
}

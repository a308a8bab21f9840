package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BPE-ish token count — the number of
  * matches of `[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]` — computed as a
  * single allocation-free byte scan instead of a Java-regex scan.
  *
  * Engine-extension layer (SURVEY.md §4), same tier as
  * [[QuantizedDotProduct]]: `regexp_count` on this pattern was the one
  * work-dominated hot path still >2× the RE2-based baseline at sf1
  * (Java's regex engine pays per-char interpreter dispatch that RE2
  * does not). The pattern is just three disjoint character classes, so
  * the count is expressible exactly as
  *
  *   (#runs of [a-z]) + (#runs of [0-9]) + (#other non-ws code points)
  *
  * which one pass over the UTF8String bytes computes with two ints of
  * state. Unicode exactness: only UTF-8 *leading* bytes (anything but
  * 0b10xxxxxx) are classified, so a multi-byte code point counts as
  * exactly one symbol match — matching both Java regex and RE2, which
  * match negated classes per code point, not per byte/UTF-16 unit.
  * (The continuation-byte skip leaves run state untouched; that is
  * safe because a non-ASCII lead byte always resets the run state to
  * "symbol" before its continuation bytes arrive.)
  *
  * Cross-engine contract: must stay count-identical to the oracle's
  * `len(regexp_extract_all(text, BpeTokenRe))` — pinned by a
  * property test against Spark's own `regexp_count` in
  * TextFunctionsSpec.
  *
  * Reference semantics: token-budget accounting in
  * `/root/reference/finetune_prep.py` (tokenizer-based there; the
  * SURVEY pins this engine's deterministic regex-class definition).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0L
    var prev = 0 // 0 = none/ws/symbol, 1 = in letter run, 2 = in digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // leading byte: one code point
        if (b >= 'a' && b <= 'z') { if (prev != 1) cnt += 1; prev = 1 }
        else if (b >= '0' && b <= '9') { if (prev != 2) cnt += 1; prev = 2 }
        else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') prev = 0
        else { cnt += 1; prev = 0 } // single symbol (incl. non-ASCII lead)
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val prev = ctx.freshName("prev")
      s"""
         |final int $n = $s.numBytes();
         |long $cnt = 0L;
         |int $prev = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $b = $s.getByte($i);
         |  if (($b & 0xC0) != 0x80) {
         |    if ($b >= 'a' && $b <= 'z') { if ($prev != 1) $cnt++; $prev = 1; }
         |    else if ($b >= '0' && $b <= '9') { if ($prev != 2) $cnt++; $prev = 2; }
         |    else if ($b == ' ' || ($b >= 9 && $b <= 13)) { $prev = 0; }
         |    else { $cnt++; $prev = 0; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** DataFrame-API entry point. */
  def apply(text: Column): Column =
    SparkSqlBridge.column(BpeTokenCount(SparkSqlBridge.expression(text)))
}

/** Native Catalyst expression: whitespace-token count — exactly
  * `size(split(trim(text), "[ \t\n\x0B\f\r]+"))` (q28's other half),
  * as one allocation-free byte scan instead of a regex split that
  * materializes an array of substrings just to take its length.
  *
  * Semantics pinned to the built-in chain (property-tested in
  * TextFunctionsSpec):
  *  - `trim` strips SPACES only (0x20), not other whitespace — so the
  *    scan first narrows [lo,hi) past leading/trailing spaces;
  *  - Java split with limit -1 keeps leading/trailing empty fields
  *    produced by non-space whitespace at the ends: the count is
  *    (#maximal non-ws runs) + (starts-with-ws ? 1 : 0)
  *    + (ends-with-ws ? 1 : 0), and an empty trimmed string counts 1
  *    (split("") = [""]).
  * Whitespace is ASCII-only (the shared WsChars set), so multi-byte
  * code points need no special handling here — every non-ASCII byte is
  * simply a non-ws byte inside a run.
  */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ws_token_count"

  @inline private def isWs(b: Byte): Boolean = b == ' ' || (b >= 9 && b <= 13)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var lo = 0
    var hi = s.numBytes()
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 1L
    var runs = 0L
    var inRun = false
    var i = lo
    while (i < hi) {
      if (!isWs(s.getByte(i))) { if (!inRun) runs += 1; inRun = true }
      else inRun = false
      i += 1
    }
    if (isWs(s.getByte(lo))) runs += 1
    if (isWs(s.getByte(hi - 1))) runs += 1
    runs
  }

  // CODEGEN TRAP (caught live by PlanSpec's compile gate): Spark's
  // `code` interpolator strips margin-like leading characters per
  // line — never start a generated line with `|`, keep every
  // statement on one line.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val runs = ctx.freshName("runs")
      val inRun = ctx.freshName("inRun")
      s"""
         |int $lo = 0;
         |int $hi = $s.numBytes();
         |while ($lo < $hi && $s.getByte($lo) == ' ') $lo++;
         |while ($hi > $lo && $s.getByte($hi - 1) == ' ') $hi--;
         |if ($lo == $hi) {
         |  ${ev.value} = 1L;
         |} else {
         |  long $runs = 0L;
         |  boolean $inRun = false;
         |  for (int $i = $lo; $i < $hi; $i++) {
         |    final byte $b = $s.getByte($i);
         |    if ($b == ' ' || ($b >= 9 && $b <= 13)) { $inRun = false; }
         |    else { if (!$inRun) $runs++; $inRun = true; }
         |  }
         |  final byte ${b}f = $s.getByte($lo);
         |  final byte ${b}l = $s.getByte($hi - 1);
         |  if (${b}f == ' ' || (${b}f >= 9 && ${b}f <= 13)) $runs++;
         |  if (${b}l == ' ' || (${b}l >= 9 && ${b}l <= 13)) $runs++;
         |  ${ev.value} = $runs;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {
  /** DataFrame-API entry point. */
  def apply(text: Column): Column =
    SparkSqlBridge.column(WsTokenCount(SparkSqlBridge.expression(text)))
}

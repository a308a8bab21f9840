package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the q29/q30 text signals —
  * `struct(n_words, n_punct, n_stop)` — in ONE allocation-free byte
  * pass over the document. Replaces three separate per-row string
  * passes, two of which materialize intermediates just to count them:
  *
  *  - n_words = `size(split(trim(text), " "))` — built an ARRAY of
  *    every word to take its length; equals (#0x20 bytes in the
  *    space-trimmed region) + 1 (split keeps empty segments;
  *    split("") = [""] → 1);
  *  - n_punct = `length(translate(text, allowed, ""))` — built a new
  *    STRING minus the allowed chars to take its length; equals the
  *    count of code points outside [a-z0-9] + ASCII whitespace
  *    (`TextFunctions.PunctRe` — uppercase deliberately counts, the
  *    pinned cross-engine semantic); only UTF-8 lead bytes are
  *    classified, so a multi-byte code point counts once;
  *  - n_stop = words of `split(trim(lower(text)), " ")` that are in
  *    the 10-word stopword list. Lowercasing never creates or removes
  *    0x20 bytes, so word boundaries coincide with the raw text's;
  *    a word matches iff it is ASCII-case-insensitively equal to a
  *    stopword. EXACT for this list: the only Unicode characters
  *    whose simple lowercase mapping lands in ASCII are U+212A
  *    (KELVIN→k) and U+0130 (İ→"i̇", which also changes length) —
  *    neither can produce a match the byte compare misses, because no
  *    stopword contains 'k' and the length changes break equality
  *    (property-pinned against the built-in chain in
  *    TextFunctionsSpec).
  *
  * The ORACLE keeps the composed string_split/list_filter/regex forms
  * (TextOps q29/q30 SQL) — this expression must stay count-identical.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = TextStats.Schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1

    var nPunct = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // lead byte: one code point
        val allowed = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
          b == ' ' || (b >= 9 && b <= 13)
        if (!allowed) nPunct += 1
      }
      i += 1
    }

    var nWords = 1L
    var nStop = 0L
    var ws = lo // current word start
    i = lo
    while (i <= hi) {
      if (i == hi || s.getByte(i) == ' ') {
        if (TextStats.isStopword(s, ws, i)) nStop += 1
        if (i < hi) nWords += 1
        ws = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, nPunct, nStop))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val nw = ctx.freshName("nw")
      val np = ctx.freshName("np")
      val ns = ctx.freshName("ns")
      val wsv = ctx.freshName("ws")
      // NB codegen style per WsTokenCount's trap note: no line may
      // start with '|', every statement on one line.
      s"""
         |final int $n = $s.numBytes();
         |int $lo = 0; int $hi = $n;
         |while ($lo < $hi && $s.getByte($lo) == ' ') $lo++;
         |while ($hi > $lo && $s.getByte($hi - 1) == ' ') $hi--;
         |long $np = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final byte $b = $s.getByte($i);
         |  if (($b & 0xC0) != 0x80) {
         |    if (!(($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9') || $b == ' ' || ($b >= 9 && $b <= 13))) $np++;
         |  }
         |}
         |long $nw = 1L; long $ns = 0L;
         |int $wsv = $lo;
         |for (int $i = $lo; $i <= $hi; $i++) {
         |  if ($i == $hi || $s.getByte($i) == ' ') {
         |    if (graft.plans.TextStats.isStopword($s, $wsv, $i)) $ns++;
         |    if ($i < $hi) $nw++;
         |    $wsv = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(new Object[] { $nw, $np, $ns });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  /** ASCII-case-insensitive match of the word at bytes [from, until)
    * against the 10-entry stopword list (see the class scaladoc for
    * why this equals `lower(word) IN stopwords` for this list).
    * Called from both the interpreted eval and the generated code —
    * must stay public and JVM-static-reachable. */
  def isStopword(s: UTF8String, from: Int, until: Int): Boolean = {
    val len = until - from
    if (len < 1 || len > 3) return false
    @inline def c(off: Int): Int = {
      val b = s.getByte(from + off)
      if (b >= 'A' && b <= 'Z') b + 32 else b.toInt
    }
    len match {
      case 1 => c(0) == 'a'
      case 2 =>
        val c0 = c(0); val c1 = c(1)
        (c0 == 'a' && c1 == 'n') || (c0 == 'i' && (c1 == 's' || c1 == 'n' || c1 == 't')) ||
          (c0 == 'o' && (c1 == 'f' || c1 == 'n')) || (c0 == 't' && c1 == 'o')
      case _ =>
        val c0 = c(0); val c1 = c(1); val c2 = c(2)
        (c0 == 't' && c1 == 'h' && c2 == 'e') || (c0 == 'a' && c1 == 'n' && c2 == 'd')
    }
  }

  /** DataFrame-API entry point:
    * `struct<n_words: long, n_punct: long, n_stop: long>`. */
  def apply(text: Column): Column =
    SparkSqlBridge.column(TextStats(SparkSqlBridge.expression(text)))
}

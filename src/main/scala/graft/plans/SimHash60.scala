package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 60-bit SimHash of a single-space-
  * separated word string, in ONE pass over the UTF-8 bytes — the
  * per-document signature for q37's near-dup detection computed as a
  * shuffle-free map-stage projection.
  *
  * Exact semantics of the SQL pipeline it replaces (and of the DuckDB
  * oracle, which still runs that pipeline):
  *
  *   explode(split(s, " "))                      -- boundary segments kept
  *     → h = conv(substr(md5(w), 1, 15), 16, 10) -- top 60 bits of md5
  *     → per bit b: vote += (bit set ? +1 : -1)
  *     → simhash bit b set iff vote > 0
  *
  * Split semantics: a segment per run between single 0x20 bytes,
  * INCLUDING empty segments (consecutive/boundary spaces, and one
  * empty segment for the empty string) — identical to Spark's
  * split(s, " ") with its keep-trailing-empties limit=-1, which the
  * old explode pipeline hashed too. Callers pass trim(text) exactly as
  * the SQL form did. A 0x20 byte never occurs inside a multi-byte
  * UTF-8 character, so the byte scan equals the string split.
  *
  * Why native: the explode shape shuffles every word of the corpus
  * into a 60-counter aggregation — with map-side partial aggregation
  * the shuffle moves only docs×60 longs, but the explode itself
  * materializes the word stream and the 60 conditional sums run in
  * the aggregate path. Here the whole signature is one codegen'd
  * per-row loop: no Generate, no aggregation, no exchange.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = h >>> 4
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sh |= (1L << b); b += 1 }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    val votes = ctx.addMutableState("int[]", "simhashVotes", v => s"$v = new int[60];")
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |java.util.Arrays.fill($votes, 0);
         |int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    $md.reset();
         |    $md.update($bytes, $start, $i - $start);
         |    final byte[] $d = $md.digest();
         |    long $h = 0L;
         |    for (int $k = 0; $k < 8; $k++) { $h = ($h << 8) | ($d[$k] & 0xffL); }
         |    $h = $h >>> 4;
         |    for (int $b = 0; $b < 60; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) { $votes[$b]++; } else { $votes[$b]--; }
         |    }
         |    $start = $i + 1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($votes[$b] > 0) { ${ev.value} |= (1L << $b); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** DataFrame-API entry point. */
  def apply(s: Column): Column =
    SparkSqlBridge.column(SimHash60(SparkSqlBridge.expression(s)))
}

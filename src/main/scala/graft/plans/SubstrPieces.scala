package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every substring of a string up to
  * `maxLen` CODE POINTS, one entry per occurrence position, as
  * `array<string>` in ONE pass over the UTF-8 bytes. The q105
  * unigram-seed stream base, fusing the composed form
  *
  *   flatten(transform(sequence(1, length(w)), s ->      -- INTERPRETED
  *     transform(sequence(1, least(maxLen, length-s+1)),  -- (HOFs have
  *       l -> substr(w, s, l))))                          --  no codegen)
  *
  * whose nested interpreted lambdas re-walk the string from byte 0 on
  * EVERY substr call (UTF8String.substringSQL is O(position) — the
  * composed form is O(n²·maxLen) byte work per word plus per-element
  * lambda dispatch; q105's sf10 profile put it at 5.8x DuckDB, the
  * round-14 verdict's #4). Here the code-point offsets are computed
  * once and each piece is a single byte-range copy — O(n·maxLen)
  * total output bytes, the lower bound. The [[WordHashPairs]]
  * precedent (round 13, q87).
  *
  * Emission order matches the composed form exactly (start position
  * ascending, then length ascending) and PropertySpec pins the
  * equality on multi-byte/empty/edge inputs. NULL input → NULL;
  * empty string → empty array.
  *
  * Piece bytes are COPIED out of the input buffer (UnsafeRow buffers
  * are reused across rows; a zero-copy slice could alias overwritten
  * memory once the operator pipelines).
  */
case class SubstrPieces(child: Expression, maxLen: Int)
    extends UnaryExpression {

  require(maxLen > 0, s"maxLen must be positive, got $maxLen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "substr_pieces"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nb = bytes.length
    // code-point start offsets; offs(n) = nb so piece ends are uniform
    val offs = new Array[Int](nb + 1)
    var n = 0
    var i = 0
    while (i < nb) {
      offs(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
      if (i > nb) i = nb // clamp a malformed trailing sequence
    }
    offs(n) = nb
    var total = 0
    var s = 0
    while (s < n) { total += math.min(maxLen, n - s); s += 1 }
    val out = new Array[Any](total)
    var idx = 0
    s = 0
    while (s < n) {
      val m = math.min(maxLen, n - s)
      var l = 1
      while (l <= m) {
        out(idx) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, offs(s), offs(s + l)))
        idx += 1
        l += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val nb = ctx.freshName("nb")
      val offs = ctx.freshName("offs")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val total = ctx.freshName("total")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val l = ctx.freshName("l")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |final int $nb = $bytes.length;
         |final int[] $offs = new int[$nb + 1];
         |int $n = 0;
         |int $i = 0;
         |while ($i < $nb) {
         |  $offs[$n++] = $i;
         |  $i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte($bytes[$i]);
         |  if ($i > $nb) $i = $nb;
         |}
         |$offs[$n] = $nb;
         |int $total = 0;
         |for (int $s = 0; $s < $n; $s++) $total += Math.min($maxLen, $n - $s);
         |final Object[] $out = new Object[$total];
         |int $idx = 0;
         |for (int $s = 0; $s < $n; $s++) {
         |  final int $m = Math.min($maxLen, $n - $s);
         |  for (int $l = 1; $l <= $m; $l++) {
         |    $out[$idx++] = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |      java.util.Arrays.copyOfRange($bytes, $offs[$s], $offs[$s + $l]));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubstrPieces =
    copy(child = newChild)
}

object SubstrPieces {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.SparkSqlBridge
  def apply(s: Column, maxLen: Int): Column =
    SparkSqlBridge.column(SubstrPieces(SparkSqlBridge.expression(s), maxLen))
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every NON-EMPTY single-space segment of
  * a string as `array<string>`, one byte pass. Semantics are exactly
  * the composed word stream every vocabulary consumer uses:
  *
  *   explode(split(trim-or-raw-text, " ")) + filter(length(w) > 0)
  *
  * i.e. segments split on single 0x20 bytes with empty segments
  * (consecutive/boundary spaces) dropped — [[WordHashPairs]] minus
  * the per-term md5 (callers that need word STRINGS only, like the
  * BPE/unigram vocabulary aggregation, were paying `split`'s
  * java.util.regex Pattern machinery per document plus a post-explode
  * length filter; one branchy byte loop replaces both). NULL → NULL.
  * PropertySpec pins equality against the composed form.
  *
  * Word bytes are COPIED out of the input buffer (UnsafeRow buffers
  * are reused across rows; a zero-copy slice could alias overwritten
  * memory once the operator pipelines).
  */
case class SpaceWords(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "space_words"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val start = ctx.freshName("start")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |final java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    if ($i > $start) {
         |      $out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |        java.util.Arrays.copyOfRange($bytes, $start, $i)));
         |    }
         |    $start = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SpaceWords =
    copy(child = newChild)
}

object SpaceWords {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.SparkSqlBridge
  def apply(s: Column): Column =
    SparkSqlBridge.column(SpaceWords(SparkSqlBridge.expression(s)))
}

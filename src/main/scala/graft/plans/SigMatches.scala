package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the number of position-wise equal
  * entries of two BIGINT arrays — the MinHash signature-agreement
  * count, `size(filter(zip_with(sa, sb, (x,y) -> x = y), v -> v))`
  * as one codegen'd loop (that chain ran INTERPRETED per candidate
  * pair — the band join's per-candidate filter, the q87
  * WordHashPairs lesson). Counts over the shorter length if they
  * differ (signatures are fixed-width by construction, so they never
  * do); NULL if either side is NULL. The DuckDB oracle's
  * `list_sum(list_transform(range(...), i -> CASE WHEN sa[i]=sb[i]
  * ...))` is unchanged — same integer count. Property-pinned equal
  * to the composed form in PropertySpec.
  */
case class SigMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sig_matches"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[ArrayData]
    val sb = b.asInstanceOf[ArrayData]
    val n = math.min(sa.numElements(), sb.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (sa.getLong(i) == sb.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatches =
    copy(left = newLeft, right = newRight)
}

object SigMatches {
  /** DataFrame-API entry point. */
  def apply(a: Column, b: Column): Column =
    SparkSqlBridge.column(SigMatches(
      SparkSqlBridge.expression(a), SparkSqlBridge.expression(b)))
}

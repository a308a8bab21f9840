package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: integer-quantized dot product of two
  * float vectors — Σ floor(double(aᵢ)·1e7) · floor(double(bᵢ)·1e7) as
  * BIGINT.
  *
  * Engine-extension layer (SURVEY.md §4): this is the custom-
  * `Expression` tier of the preference order — built-ins can express
  * the same semantics only as a Dim-term expression chain, whose
  * generated code grows linearly with Dim (multi-kilobyte methods,
  * codegen-size-limit fallbacks when several appear in one
  * projection); this expression emits a constant-size LOOP in
  * doGenCode, works for any vector length, and keeps the whole stage
  * inside codegen. Semantics byte-match VectorFunctions.dotQ and the
  * DuckDB oracle (floor of an IEEE double product is deterministic).
  *
  * Mismatched / null element handling: null on either side or length
  * mismatch yields null (same as the built-in chain on malformed
  * input it would error on — here it degrades to null).
  */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is not implementable out-of-tree (AbstractDataType
  // is private[sql]); explicit type check instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var sum = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val qa = math.floor(x.getFloat(i).toDouble * 1.0e7).toLong
      val qb = math.floor(y.getFloat(i).toDouble * 1.0e7).toLong
      sum += qa * qb
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $qa = (long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1.0E7D);
         |    long $qb = (long) java.lang.Math.floor(((double) $b.getFloat($i)) * 1.0E7D);
         |    $sum += $qa * $qb;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotProduct =
    copy(left = newLeft, right = newRight)
}

object QuantizedDotProduct {
  /** DataFrame-API entry point. */
  def apply(a: Column, b: Column): Column =
    SparkSqlBridge.column(QuantizedDotProduct(
      SparkSqlBridge.expression(a), SparkSqlBridge.expression(b)))
}

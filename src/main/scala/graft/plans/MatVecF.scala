package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native Catalyst expression: y = M·x for a LITERAL row-major square
  * float matrix M (an orthogonal rotation in the OPQ path —
  * operators/Opq) and an array<float> column x.
  *
  * Engine-extension layer (SURVEY.md §4): the built-in alternative is
  * a higher-order `transform(sequence(...), i -> aggregate(...))`
  * chain, which is CodegenFallback — every row pays dim² interpreted
  * lambda calls exactly where the corpus scan is hottest. This
  * expression is a constant-size two-level loop in generated code; the
  * matrix rides along as a referenced float[] object, never a plan
  * literal tree (the [[PqLut]]/[[PqCodes]] codebook discipline).
  * Arithmetic is double-accumulated then rounded to float — the same
  * result every engine/platform computes for these 64-term sums.
  *
  * Null/shape handling: null input or a length != dim yields null
  * (the PqCodes malformed-input discipline: degrade to null, never
  * garbage).
  */
case class MatVecF(child: Expression, mat: Seq[Float], dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (dim > 0 && mat.size == dim * dim) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName matrix must be dim² floats: got ${mat.size} for dim=$dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec_f"

  @transient private lazy val matArr: Array[Float] = mat.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val xs = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j)) return null
      xs(j) = x.getFloat(j)
      j += 1
    }
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      var k = 0
      val base = i * dim
      while (k < dim) {
        acc += matArr(base + k).toDouble * xs(k).toDouble
        k += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("opqMat", matArr, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val xs = ctx.freshName("xs")
      val out = ctx.freshName("out")
      val base = ctx.freshName("base")
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $xs = new float[$dim];
         |  for (int $k = 0; $k < $dim; $k++) {
         |    if ($x.isNullAt($k)) { ${ev.isNull} = true; break; }
         |    $xs[$k] = $x.getFloat($k);
         |  }
         |  if (!${ev.isNull}) {
         |    float[] $out = new float[$dim];
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $acc = 0.0D;
         |      int $base = $i * $dim;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $acc += ((double) $matRef[$base + $k]) * ((double) $xs[$k]);
         |      }
         |      $out[$i] = (float) $acc;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecF =
    copy(child = newChild)
}

object MatVecF {
  /** DataFrame-API entry point: rotate `x` by the row-major `mat`. */
  def apply(x: Column, mat: Seq[Float], dim: Int): Column =
    SparkSqlBridge.column(MatVecF(SparkSqlBridge.expression(x), mat, dim))
}

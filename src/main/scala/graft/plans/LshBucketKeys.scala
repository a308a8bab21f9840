package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: all sign-bit LSH bucket keys of one
  * embedding in a single pass — `bkeys[t] = Σ_{p} (dot_j > 0) << p`
  * with `dot_j = Σ_i floor(x_i·1e7) · coef(j,i)` over an integer
  * hyperplane matrix baked in as a literal (j = t·planesPerTable + p).
  *
  * Engine-extension layer (SURVEY.md §4), same tier and rationale as
  * [[QuantizedDotProduct]]: the alternatives are an explode(Dim) ⋈
  * broadcast(planes) → two hash aggregations (the previous shape —
  * Dim·|planes| intermediate rows PER VECTOR and two shuffles, the
  * index-build bottleneck of q40 at sf1), a higher-order-function
  * chain (CodegenFallback — interpreted lambda per element, ~100x),
  * or a |planes|·Dim-term built-in expression chain (blows the
  * generated-method size limit and falls back to interpreted). This
  * expression is one constant-size nested loop inside whole-stage
  * codegen: the index build becomes a pure map stage — at corpus
  * scale the scan is the only pass and NOTHING shuffles.
  *
  * Exactness: |floor(x·1e7)| ≤ 1e7 and |coef| ≤ 1000003, so each dot
  * is an exact int64 sum (< 2^50) — bit-identical to the DuckDB
  * oracle's list_sum regardless of summation order. Null element or
  * a vector shorter than the plane dimensionality → null (mirrors
  * [[QuantizedDotProduct]]'s degrade-to-null contract).
  */
case class LshBucketKeys(
    child: Expression,
    planes: Seq[Seq[Long]],
    planesPerTable: Int,
    thresholds: Seq[Long] = Nil)
  extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.size == planes.head.size),
    "plane matrix must be rectangular")
  require(planes.size % planesPerTable == 0,
    s"${planes.size} planes do not fill tables of $planesPerTable")
  require(thresholds.isEmpty || thresholds.size == planes.size,
    "one threshold per plane (or none for the through-origin default)")

  private val dim = planes.head.size
  private val numTables = planes.size / planesPerTable
  // flat row-major copy for both eval paths
  private lazy val flat: Array[Long] = planes.flatten.toArray
  // per-plane sign thresholds: 0 = planes through the origin; a
  // CENTERED index passes dot(mean, plane) here, shifting every plane
  // to pass through the corpus centroid (bucket-entropy recovery on
  // biased data — Similarity.lshEntries scaladoc)
  private lazy val thr: Array[Long] =
    if (thresholds.isEmpty) new Array[Long](planes.size) else thresholds.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val bkeys = new Array[Long](numTables)
    var j = 0
    while (j < planes.size) {
      var dot = 0L
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        dot += math.floor(v.getFloat(i).toDouble * 1.0e7).toLong * flat(j * dim + i)
        i += 1
      }
      if (dot > thr(j)) bkeys(j / planesPerTable) |= 1L << (j % planesPerTable)
      j += 1
    }
    new GenericArrayData(bkeys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", flat, "long[]")
      val thrRef = ctx.addReferenceObj("lshThresholds", thr, "long[]")
      val bkeys = ctx.freshName("bkeys")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nPlanes = planes.size
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $bkeys = new long[$numTables];
         |  for (int $j = 0; $j < $nPlanes && !${ev.isNull}; $j++) {
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $dot += (long) java.lang.Math.floor(((double) $v.getFloat($i)) * 1.0E7D) * $planesRef[$j * $dim + $i];
         |    }
         |    if ($dot > $thrRef[$j]) $bkeys[$j / $planesPerTable] |= 1L << ($j % $planesPerTable);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bkeys);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketKeys =
    copy(child = newChild)
}

object LshBucketKeys {
  /** DataFrame-API entry point (through-origin planes). */
  def apply(embedding: Column, planes: Seq[Seq[Long]], planesPerTable: Int): Column =
    SparkSqlBridge.column(LshBucketKeys(
      SparkSqlBridge.expression(embedding), planes, planesPerTable))

  /** Centered variant: per-plane integer thresholds (= dot(mean, plane)). */
  def apply(embedding: Column, planes: Seq[Seq[Long]], planesPerTable: Int,
            thresholds: Seq[Long]): Column =
    SparkSqlBridge.column(LshBucketKeys(
      SparkSqlBridge.expression(embedding), planes, planesPerTable, thresholds))
}

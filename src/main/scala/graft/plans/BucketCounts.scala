package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-row histogram of an `array<long>`
  * — `array<struct<bucket: long, n_occ: long>>`, buckets ascending.
  *
  * Round 14, the q97 sf10 lesson: the design matrix's
  * `groupBy(doc_id, bucket)` shuffle moves O(docs × features) rows
  * for ZERO combining benefit — every (doc, bucket) group lives
  * entirely inside ONE input row (a doc's whole feature stream comes
  * from its own text), so map-side partial aggregation has already
  * collapsed each group before the exchange, and the shuffle is pure
  * data movement (~165M rows at sf10, the whole query's cost).
  * Grouping WITHIN the row (sort + run-length encode of the feature
  * array, ~2×words elements) makes the (doc, bucket, n_occ) stream a
  * pure projection: no exchange at any corpus size, and
  * streaming-composable like the q97 in-row scorer.
  */
case class BucketCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> (containsNull=false) input, " +
        s"got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("n_occ", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bucket_counts"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    java.util.Arrays.sort(arr)
    var distinct = 0
    var i = 0
    while (i < arr.length) {
      if (i == 0 || arr(i) != arr(i - 1)) distinct += 1
      i += 1
    }
    val out = new Array[Any](distinct)
    var o = 0
    i = 0
    while (i < arr.length) {
      var j = i
      while (j < arr.length && arr(j) == arr(i)) j += 1
      out(o) = new GenericInternalRow(Array[Any](arr(i), (j - i).toLong))
      o += 1
      i = j
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val arr = ctx.freshName("arr")
      val distinct = ctx.freshName("distinct")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      s"""
         |final long[] $arr = $in.toLongArray();
         |java.util.Arrays.sort($arr);
         |int $distinct = 0;
         |for (int $i = 0; $i < $arr.length; $i++) {
         |  if ($i == 0 || $arr[$i] != $arr[$i - 1]) $distinct++;
         |}
         |final Object[] $out = new Object[$distinct];
         |int $o = 0;
         |for (int $i = 0; $i < $arr.length; ) {
         |  int $j = $i;
         |  while ($j < $arr.length && $arr[$j] == $arr[$i]) $j++;
         |  $out[$o++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $arr[$i], (long) ($j - $i) });
         |  $i = $j;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCounts =
    copy(child = newChild)
}

object BucketCounts {
  /** DataFrame-API entry point. */
  def apply(s: Column): Column =
    SparkSqlBridge.column(BucketCounts(SparkSqlBridge.expression(s)))
}

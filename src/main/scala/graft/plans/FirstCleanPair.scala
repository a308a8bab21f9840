package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: index of the FIRST simhash block-pair
  * table in which two hashes collide — the ownership rule that lets
  * the 28-table band self-join emit every near-pair from exactly one
  * table instead of deduplicating up to 28 copies with a shuffle
  * (operators/Dedup.simhashPairs).
  *
  * Semantics: over the block layout (shifts(i), widths(i)), block i is
  * CLEAN iff both hashes agree on it (the xor restricted to the block
  * is zero). With z = bitmap of clean blocks and i1 < i2 its two
  * lowest set bits, the result is the index of combo (i1, i2) in
  * (i asc, j asc) enumeration order: i1·(B−1) − i1·(i1−1)/2 + i2−i1−1.
  * Fewer than two clean blocks → −1 (matches no table; cannot occur
  * for rows produced by a block-pair bucket join).
  *
  * Why native and not a SQL expression chain: the filter sits on a
  * join output and references both sides, so Catalyst folds it into
  * the join condition and inlines the shared z sub-expression into
  * every use — a 12x-duplicated CASE tree too large for codegen
  * (measured: interpreted-mode join condition, ~10x q37 wall-clock).
  * This expression evaluates z once per row in constant-size code.
  */
case class FirstCleanPair(left: Expression, right: Expression,
                          shifts: Seq[Int], widths: Seq[Int])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // Separate messages: an input-type failure and a block-layout
    // misconfiguration are different bugs — reporting datatypes for a
    // shifts/widths mismatch sent the reader to the wrong place.
    if (!Seq(left, right).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BIGINT inputs, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else if (shifts.length != widths.length || widths.length < 2 ||
      widths.length > 31)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName block layout invalid: shifts.length=${shifts.length}, " +
          s"widths.length=${widths.length} (lengths must match, with 2-31 blocks)")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "first_clean_pair"

  private def nBlocks = widths.length

  override def nullSafeEval(a: Any, b: Any): Any = {
    val m = a.asInstanceOf[Long] ^ b.asInstanceOf[Long]
    var z = 0
    var i = 0
    while (i < nBlocks) {
      if (((m >>> shifts(i)) & ((1L << widths(i)) - 1L)) == 0L) z |= (1 << i)
      i += 1
    }
    val z2 = z & (z - 1)
    if (z2 == 0) -1
    else {
      val i1 = java.lang.Integer.numberOfTrailingZeros(z)
      val i2 = java.lang.Integer.numberOfTrailingZeros(z2)
      i1 * (nBlocks - 1) - i1 * (i1 - 1) / 2 + i2 - i1 - 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val z = ctx.freshName("z")
      val z2 = ctx.freshName("z2")
      val i1 = ctx.freshName("i1")
      val i2 = ctx.freshName("i2")
      val blockChecks = shifts.indices.map { i =>
        s"if ((($m >>> ${shifts(i)}) & ${(1L << widths(i)) - 1L}L) == 0L) $z |= ${1 << i};"
      }.mkString("\n")
      s"""
         |final long $m = $a ^ $b;
         |int $z = 0;
         |$blockChecks
         |final int $z2 = $z & ($z - 1);
         |if ($z2 == 0) {
         |  ${ev.value} = -1;
         |} else {
         |  final int $i1 = java.lang.Integer.numberOfTrailingZeros($z);
         |  final int $i2 = java.lang.Integer.numberOfTrailingZeros($z2);
         |  ${ev.value} = $i1 * ${nBlocks - 1} - $i1 * ($i1 - 1) / 2 + $i2 - $i1 - 1;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstCleanPair =
    copy(left = newLeft, right = newRight)
}

object FirstCleanPair {
  /** DataFrame-API entry point. */
  def apply(a: Column, b: Column, shifts: Seq[Int], widths: Seq[Int]): Column =
    SparkSqlBridge.column(FirstCleanPair(
      SparkSqlBridge.expression(a), SparkSqlBridge.expression(b), shifts, widths))
}

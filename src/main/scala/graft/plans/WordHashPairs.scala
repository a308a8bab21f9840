package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every NON-EMPTY single-space segment
  * of a string paired with its 48-bit-md5 hash —
  * `array<struct<term: string, h: long>>` in ONE pass over the UTF-8
  * bytes. The q87 word-stream base, fusing what was four operators:
  *
  *   zip_with(split(s, " "),                 -- 2nd text pass + array
  *            ShingleHashes(s, 1, p),        -- 1st text pass
  *            (w, h) -> struct(w, h))        -- INTERPRETED (HOFs have
  *                                           --  no codegen)
  *     → explode → filter(length(term) > 0) -- empty-segment churn
  *
  * Higher-order functions run interpreted (the q93 lesson — no
  * codegen, per-element lambda dispatch), so the zip dominated the
  * projection; here the segment scan, the md5, the term slice and the
  * empty-drop are one codegen'd loop. Semantics are EXACTLY the
  * composed form's: segments split on single 0x20 bytes (callers pass
  * trim(text) as ever), empty segments dropped (consecutive/boundary
  * spaces), h = first 48 digest bits of the term bytes as a
  * non-negative long mod p — `CAST(('0x'||substr(md5(w),1,12)) AS
  * BIGINT) % p` in DuckDB (the ShingleHashes n=1 hash, bit-for-bit).
  * NULL text → NULL. Property-pinned equal to the composed pipeline
  * in PropertySpec.
  *
  * Term bytes are COPIED out of the input buffer (UnsafeRow buffers
  * are reused across rows; a zero-copy slice could alias overwritten
  * memory once the operator pipelines).
  */
case class WordHashPairs(child: Expression, p: Long) extends UnaryExpression {

  require(p > 0, s"modulus must be positive, got $p")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "word_hash_pairs"

  // Interpreted-path digest, hoisted like the codegen path's mutable
  // state (per-task instance — see BandKeys.mdShared).
  @transient private lazy val mdShared =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = mdShared
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (i > start) {
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          var h = 0L
          var k = 0
          while (k < 6) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
          val term = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i))
          out.add(new GenericInternalRow(Array[Any](term, h % p)))
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "whpMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val start = ctx.freshName("start")
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val term = ctx.freshName("term")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |final java.util.ArrayList<Object> $out = new java.util.ArrayList<Object>();
         |int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    if ($i > $start) {
         |      $md.reset();
         |      $md.update($bytes, $start, $i - $start);
         |      final byte[] $d = $md.digest();
         |      long $h = 0L;
         |      for (int $k = 0; $k < 6; $k++) { $h = ($h << 8) | ($d[$k] & 0xffL); }
         |      final org.apache.spark.unsafe.types.UTF8String $term =
         |        org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |          java.util.Arrays.copyOfRange($bytes, $start, $i));
         |      $out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[] { $term, $h % ${p}L }));
         |    }
         |    $start = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordHashPairs =
    copy(child = newChild)
}

object WordHashPairs {
  /** DataFrame-API entry point. */
  def apply(s: Column, p: Long): Column =
    SparkSqlBridge.column(WordHashPairs(SparkSqlBridge.expression(s), p))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the q85 bigram-LM feature stream —
  * position-aligned (context-unigram-bucket, bigram-bucket) pairs of
  * a single-space-separated string, `array<struct<b1: long,
  * b2: long>>` in ONE pass over the UTF-8 bytes. Entry i (0-based,
  * i = 0..segs−2) pairs segment i's 48-bit-md5 unigram bucket with
  * the contiguous "seg_i seg_{i+1}" byte range's bigram bucket, so
  * Σ_w2 c(w1, w2) = c(w1) holds by construction — exactly
  * [[graft.operators.LangModel.contextPairs]]'s
  *
  *   zip_with(slice(ShingleHashes(s,1,k), 1, segs−1),
  *            ShingleHashes(s,2,k), (a, b) -> struct(a, b))
  *
  * which paid TWO text passes plus an INTERPRETED zip (higher-order
  * functions have no codegen — the q87 WordHashPairs lesson).
  * Split semantics are ShingleHashes': segments between single 0x20
  * bytes INCLUDING empties; both n-grams hash zero-copy from the
  * source bytes. Fewer than two segments → empty array; NULL → NULL.
  * Property-pinned equal to the composed form in PropertySpec; the
  * q85 oracle (which mirrors the hash arithmetic directly) is
  * unchanged.
  */
case class ContextPairHashes(child: Expression, buckets: Long)
    extends UnaryExpression {

  require(buckets > 0, s"bucket count must be positive, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("b1", LongType, nullable = false),
      StructField("b2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "context_pair_hashes"

  // Interpreted-path digest, hoisted like the codegen path's mutable
  // state (per-task instance — see BandKeys.mdShared).
  @transient private lazy val mdShared =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = mdShared
    def h48(off: Int, len: Int): Long = {
      md.reset()
      md.update(bytes, off, len)
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 6) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h % buckets
    }
    var segs = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) segs += 1; i += 1 }
    if (segs < 2) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](segs - 1)
    var prevStart = 0
    var prevEnd = -1
    var start = 0
    var idx = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (prevEnd >= 0) {
          out(idx) = new GenericInternalRow(Array[Any](
            h48(prevStart, prevEnd - prevStart), // unigram: previous segment
            h48(prevStart, i - prevStart)))      // bigram: prev + space + this
          idx += 1
        }
        prevStart = start
        prevEnd = i
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "cphMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val segs = ctx.freshName("segs")
      val out = ctx.freshName("out")
      val prevStart = ctx.freshName("prevStart")
      val prevEnd = ctx.freshName("prevEnd")
      val start = ctx.freshName("start")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val d = ctx.freshName("digest")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |int $segs = 1;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] == 0x20) $segs++;
         |}
         |final Object[] $out = new Object[$segs < 2 ? 0 : $segs - 1];
         |int $prevStart = 0;
         |int $prevEnd = -1;
         |int $start = 0;
         |int $idx = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    if ($prevEnd >= 0) {
         |      $md.reset();
         |      $md.update($bytes, $prevStart, $prevEnd - $prevStart);
         |      byte[] $d = $md.digest();
         |      long $h1 = 0L;
         |      for (int $k = 0; $k < 6; $k++) { $h1 = ($h1 << 8) | ($d[$k] & 0xffL); }
         |      $md.reset();
         |      $md.update($bytes, $prevStart, $i - $prevStart);
         |      $d = $md.digest();
         |      long $h2 = 0L;
         |      for (int $k = 0; $k < 6; $k++) { $h2 = ($h2 << 8) | ($d[$k] & 0xffL); }
         |      $out[$idx++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |        new Object[] { $h1 % ${buckets}L, $h2 % ${buckets}L });
         |    }
         |    $prevStart = $start;
         |    $prevEnd = $i;
         |    $start = $i + 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ContextPairHashes =
    copy(child = newChild)
}

object ContextPairHashes {
  /** DataFrame-API entry point. */
  def apply(s: Column, buckets: Long): Column =
    SparkSqlBridge.column(ContextPairHashes(SparkSqlBridge.expression(s), buckets))
}

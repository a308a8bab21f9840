package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DSIR hashed feature stream —
  * 48-bit-md5 buckets of every word 1-gram followed by every word
  * 2-gram, `array<long>` in ONE pass over the UTF-8 bytes. Exactly
  * `concat(ShingleHashes(s,1,k), ShingleHashes(s,2,k))`
  * ([[graft.operators.Dsir.featureBuckets]]'s composed form), which
  * paid TWO text passes; both n-gram widths hash zero-copy from the
  * same byte scan here (the ContextPairHashes loop with a flat
  * unigram-block-then-bigram-block layout). Split semantics are
  * ShingleHashes': segments between single 0x20 bytes INCLUDING
  * empties; one segment → just its unigram; NULL → NULL.
  * Property-pinned equal to the composed form in PropertySpec; the
  * q76/q97/q85 oracles (which mirror the hash arithmetic directly)
  * are unchanged.
  */
case class UniBiBuckets(child: Expression, buckets: Long)
    extends UnaryExpression {

  require(buckets > 0, s"bucket count must be positive, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "uni_bi_buckets"

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
    val out = new Array[Long](segs + segs - 1)
    var prevStart = 0
    var prevEnd = -1
    var start = 0
    var u = 0
    var bi = segs
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        out(u) = h48(start, i - start); u += 1
        if (prevEnd >= 0) {
          out(bi) = h48(prevStart, i - prevStart); bi += 1
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
    val md = ctx.addMutableState("java.security.MessageDigest", "ubbMd",
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
      val u = ctx.freshName("u")
      val bi = ctx.freshName("bi")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |int $segs = 1;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] == 0x20) $segs++;
         |}
         |final long[] $out = new long[$segs + $segs - 1];
         |int $prevStart = 0;
         |int $prevEnd = -1;
         |int $start = 0;
         |int $u = 0;
         |int $bi = $segs;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    $md.reset();
         |    $md.update($bytes, $start, $i - $start);
         |    byte[] $d = $md.digest();
         |    long $h = 0L;
         |    for (int $k = 0; $k < 6; $k++) { $h = ($h << 8) | ($d[$k] & 0xffL); }
         |    $out[$u++] = $h % ${buckets}L;
         |    if ($prevEnd >= 0) {
         |      $md.reset();
         |      $md.update($bytes, $prevStart, $i - $prevStart);
         |      $d = $md.digest();
         |      $h = 0L;
         |      for (int $k = 0; $k < 6; $k++) { $h = ($h << 8) | ($d[$k] & 0xffL); }
         |      $out[$bi++] = $h % ${buckets}L;
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

  override protected def withNewChildInternal(newChild: Expression): UniBiBuckets =
    copy(child = newChild)
}

object UniBiBuckets {
  /** DataFrame-API entry point. */
  def apply(s: Column, buckets: Long): Column =
    SparkSqlBridge.column(UniBiBuckets(SparkSqlBridge.expression(s), buckets))
}

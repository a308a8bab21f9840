package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 48-bit-md5 hashes of every word
  * n-gram of a single-space-separated string, in ONE pass over the
  * UTF-8 bytes — the per-document shingle stream for MinHash dedup
  * (q36) computed as a shuffle-free map-stage projection.
  *
  * Replaces the explode shape
  *
  *   posexplode(split(s, " "))                      -- every WORD a row
  *     → lead(w, 1..n-1) OVER (PARTITION BY doc ORDER BY i)
  *     → g = concat_ws(" ", w, w1, ..)              -- n-gram strings
  *     → h = conv(substr(md5(g), 1, 12), 16, 10) % p
  *
  * whose window shuffles the ENTIRE word stream of the corpus by
  * doc_id just to line up adjacent words — at 100 TB that is the
  * single largest exchange in the dedup path. Here adjacency is free:
  * consecutive segments of a single-space split are contiguous in the
  * source bytes, so each n-gram IS the byte range from the start of
  * segment i to the end of segment i+n-1 and is md5'd zero-copy.
  *
  * Split semantics: a segment per run between single 0x20 bytes,
  * INCLUDING empty segments (consecutive/boundary spaces, and one
  * empty segment for the empty string) — identical to Spark's
  * split(s, " ") and DuckDB's string_split, which the old pipeline
  * hashed too. Callers pass trim(text) exactly as the SQL form did.
  * Duplicate n-grams are emitted (NOT deduped): every consumer —
  * the per-(hash) countDistinct(doc_id) document-frequency guard and
  * the 32 per-doc MIN aggregates — is duplicate-insensitive, and
  * skipping the per-doc hash set keeps the loop branch-free.
  * Fewer than n segments → empty array (the lead pipeline's
  * trailing-NULL filter dropped incomplete grams the same way);
  * NULL text → NULL.
  *
  * Exactness: h = first 48 digest bits as a non-negative long, mod p
  * — `CAST(('0x'||substr(md5(g),1,12)) AS BIGINT) % p` in DuckDB, so
  * the oracle reproduces the stream bit-for-bit (collisions included:
  * both engines hash, then key EVERYTHING on h).
  */
case class ShingleHashes(child: Expression, n: Int, p: Long)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(p > 0, s"modulus must be positive, got $p")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    var segs = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) segs += 1; i += 1 }
    val grams = segs - n + 1
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](grams)
    val ring = new Array[Int](n)
    var segIdx = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        ring(segIdx % n) = start
        if (segIdx >= n - 1) {
          val gs = ring((segIdx - n + 1) % n)
          md.reset()
          md.update(bytes, gs, i - gs)
          val d = md.digest()
          var h = 0L
          var k = 0
          while (k < 6) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
          out(segIdx - n + 1) = h % p
        }
        start = i + 1
        segIdx += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "shingleMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    val ring = ctx.addMutableState("int[]", "shingleRing", v => s"$v = new int[$n];")
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val segs = ctx.freshName("segs")
      val grams = ctx.freshName("grams")
      val out = ctx.freshName("out")
      val segIdx = ctx.freshName("segIdx")
      val start = ctx.freshName("start")
      val gs = ctx.freshName("gs")
      val d = ctx.freshName("digest")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |int $segs = 1;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] == 0x20) $segs++;
         |}
         |final int $grams = $segs - $n + 1;
         |final long[] $out = new long[$grams > 0 ? $grams : 0];
         |int $segIdx = 0;
         |int $start = 0;
         |for (int $i = 0; $i <= $bytes.length; $i++) {
         |  if ($i == $bytes.length || $bytes[$i] == 0x20) {
         |    $ring[$segIdx % $n] = $start;
         |    if ($segIdx >= $n - 1) {
         |      final int $gs = $ring[($segIdx - $n + 1) % $n];
         |      $md.reset();
         |      $md.update($bytes, $gs, $i - $gs);
         |      final byte[] $d = $md.digest();
         |      long $h = 0L;
         |      for (int $k = 0; $k < 6; $k++) { $h = ($h << 8) | ($d[$k] & 0xffL); }
         |      $out[$segIdx - $n + 1] = $h % ${p}L;
         |    }
         |    $start = $i + 1;
         |    $segIdx++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** DataFrame-API entry point. */
  def apply(s: Column, n: Int, p: Long): Column =
    SparkSqlBridge.column(ShingleHashes(SparkSqlBridge.expression(s), n, p))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL MinHash LSH band keys of a
  * signature array in one pass — `array<string>` of `bands` md5-hex
  * keys, key b = md5 of the comma-joined decimal band slice
  * `sg[b·r+1 .. b·r+r]`, exactly the composed form
  *
  *   transform(sequence(0, bands−1), b ->
  *     md5(array_join(transform(slice(sg, b·r+1, r),
  *                              v -> cast(v as string)), ",")))
  *
  * which ran INTERPRETED per signature row (HOFs have no codegen; 20
  * bands × (slice + per-element lambda + join + md5) of lambda
  * dispatch — the q87/q85 lesson applied to the dedup path). The
  * DuckDB oracle's `md5(array_to_string(sg[b*r+1 : b*r+r], ','))` is
  * unchanged: same bytes hashed, same lowercase-hex key.
  * Property-pinned equal to the composed form in PropertySpec.
  * NULL signature → NULL; elements must be non-null (signature
  * arrays are MIN aggregates, non-null by construction).
  */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1,
    s"bad band layout: $bands x $rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "band_keys"

  private val HexChars = "0123456789abcdef".getBytes

  // Interpreted-path digest, hoisted like the codegen path's mutable
  // state: expressions deserialize per task, so instance reuse is
  // thread-safe and a codegen fallback no longer allocates per row.
  @transient private lazy val mdShared =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val sg = input.asInstanceOf[ArrayData]
    // LOUD on undersized signatures: the codegen path would otherwise
    // read adjacent unsafe-buffer memory and emit garbage keys
    // silently (e.g. an older persisted index with a different
    // NumHashes) — the composed slice form degraded deterministically
    if (sg.numElements() < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"band_keys: signature has ${sg.numElements()} entries, " +
          s"need ${bands * rowsPerBand}")
    val md = mdShared
    val sb = new java.lang.StringBuilder(24 * rowsPerBand)
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var j = 0
      while (j < rowsPerBand) {
        if (j > 0) sb.append(',')
        sb.append(sg.getLong(b * rowsPerBand + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HexChars((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = HexChars(d(k) & 0xf)
        k += 1
      }
      out(b) = UTF8String.fromBytes(hex)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "bandMd",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    val hexChars = ctx.addMutableState("byte[]", "bandHexChars",
      v => s"""$v = "0123456789abcdef".getBytes();""")
    nullSafeCodeGen(ctx, ev, in => {
      val out = ctx.freshName("out")
      val sb = ctx.freshName("sb")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d = ctx.freshName("digest")
      val hex = ctx.freshName("hex")
      s"""
         |if ($in.numElements() < ${bands * rowsPerBand}) {
         |  throw new IllegalArgumentException(
         |    "band_keys: signature has " + $in.numElements() +
         |    " entries, need ${bands * rowsPerBand}");
         |}
         |final Object[] $out = new Object[$bands];
         |final java.lang.StringBuilder $sb = new java.lang.StringBuilder(${24 * rowsPerBand});
         |for (int $b = 0; $b < $bands; $b++) {
         |  $sb.setLength(0);
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    if ($j > 0) $sb.append(',');
         |    $sb.append($in.getLong($b * $rowsPerBand + $j));
         |  }
         |  $md.reset();
         |  final byte[] $d = $md.digest($sb.toString().getBytes(
         |    java.nio.charset.StandardCharsets.US_ASCII));
         |  final byte[] $hex = new byte[32];
         |  for (int $k = 0; $k < 16; $k++) {
         |    $hex[2 * $k] = $hexChars[($d[$k] >> 4) & 0xf];
         |    $hex[2 * $k + 1] = $hexChars[$d[$k] & 0xf];
         |  }
         |  $out[$b] = org.apache.spark.unsafe.types.UTF8String.fromBytes($hex);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

object BandKeys {
  /** DataFrame-API entry point. */
  def apply(sg: Column, bands: Int, rowsPerBand: Int): Column =
    SparkSqlBridge.column(BandKeys(SparkSqlBridge.expression(sg), bands, rowsPerBand))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, LongType}

/** Native Catalyst expressions for PRODUCT QUANTIZATION (the FAISS
  * IVFPQ shape — Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): residual encode, asymmetric
  * lookup-table build, and ADC scoring, each a constant-size codegen
  * loop over a codebook shipped as a reference object (the
  * [[LshBucketKeys]] discipline — no literal-size codegen blowup, no
  * interpreted higher-order lambdas in the corpus-scan hot path).
  *
  * Exactness protocol (the [[QuantizedDotProduct]] family): all
  * distances are exact int64 sums of squared differences of QUANTIZED
  * components — `r_i = floor(x_i·1e7) − floor(c_i·1e7)` — so code
  * assignment is deterministic arithmetic both engines reproduce
  * bit-for-bit (q103's DuckDB mirror), and ADC totals are
  * order-independent integers. Overflow bound: |component| ≤ ~90
  * keeps a dsub-term sum of squared diffs under 2^63 (unit-norm-ish
  * embeddings sit at |x| ≤ 1, five orders inside the bound).
  *
  * Argmin ties break toward the LOWEST codeword id via explicit
  * (dist, id) comparison — never a composite `dist·ksub + id` key,
  * whose multiply would re-tighten the overflow bound by ksub.
  */
object PqOps {

  /** Shared shape contract: `codebook` is flat row-major
    * m × ksub × dsub quantized entries; entry (j, c) starts at
    * (j·ksub + c)·dsub. */
  private[plans] def checkBook(m: Int, ksub: Int, dsub: Int,
                               codebook: Seq[Long]): Unit = {
    require(m > 0 && ksub > 0 && dsub > 0, s"bad PQ shape m=$m ksub=$ksub dsub=$dsub")
    require(codebook.length == m * ksub * dsub,
      s"codebook length ${codebook.length} != m*ksub*dsub = ${m * ksub * dsub}")
  }
}

/** PQ ENCODE: the m per-subspace codeword ids of one embedding's
  * residual against its home coarse centroid, as `array<long>`.
  * Children: (embedding array<float>, centroid array<float>). */
case class PqCodes(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int,
    codebook: Seq[Long])
  extends BinaryExpression {

  private val dim = graft.functions.VectorFunctions.Dim
  private val dsub = dim / m
  require(dim % m == 0, s"m=$m must divide Dim=$dim")
  PqOps.checkBook(m, ksub, dsub, codebook)
  // case-class field stays a Seq (structural equality — plan
  // canonicalization / exchange reuse); eval paths use the array
  @transient private lazy val book: Array[Long] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(emb: Any, cent: Any): Any = {
    val v = emb.asInstanceOf[ArrayData]
    val c = cent.asInstanceOf[ArrayData]
    if (v.numElements() != dim || c.numElements() != dim) return null
    val r = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i) || c.isNullAt(i)) return null
      r(i) = math.floor(v.getFloat(i).toDouble * 1.0e7).toLong -
        math.floor(c.getFloat(i).toDouble * 1.0e7).toLong
      i += 1
    }
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var bestC = 0L
      var cw = 0
      while (cw < ksub) {
        var d = 0L
        var t = 0
        val base = (j * ksub + cw) * dsub
        while (t < dsub) {
          val diff = r(j * dsub + t) - book(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; bestC = cw.toLong }
        cw += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val bookRef = ctx.addReferenceObj("pqBook", book, "long[]")
      val r = ctx.freshName("r")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cw = ctx.freshName("cw"); val t = ctx.freshName("t")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim || $c.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $r = new long[$dim];
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $r[$i] = (long) java.lang.Math.floor(((double) $v.getFloat($i)) * 1.0E7D)
         |           - (long) java.lang.Math.floor(((double) $c.getFloat($i)) * 1.0E7D);
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $codes = new long[$m];
         |    for (int $j = 0; $j < $m; $j++) {
         |      long $bestD = Long.MAX_VALUE; long $bestC = 0L;
         |      for (int $cw = 0; $cw < $ksub; $cw++) {
         |        long $d = 0L;
         |        int $base = ($j * $ksub + $cw) * $dsub;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          long $diff = $r[$j * $dsub + $t] - $bookRef[$base + $t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $bestC = (long) $cw; }
         |      }
         |      $codes[$j] = $bestC;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

object PqCodes {
  def apply(embedding: Column, centroid: Column, m: Int, ksub: Int,
            codebook: Seq[Long]): Column =
    SparkSqlBridge.column(PqCodes(SparkSqlBridge.expression(embedding),
      SparkSqlBridge.expression(centroid), m, ksub, codebook))
}

/** RECONSTRUCTION ERROR of a vector under the codebook: the exact
  * int64 squared L2 distance between the vector's residual (vs its
  * home cell centroid) and its own best code words — i.e. the sum of
  * the per-subspace argmin distances [[PqCodes]] computes internally
  * and throws away. `max` of this over an index is the quantization
  * radius bound the tie-band shortlist rule needs
  * ([[graft.operators.Pq.searchAdcRerankIndex]]): any candidate whose
  * adist exceeds (sqrt(adist_k) + 2·sqrt(maxErr))² provably cannot be
  * a true top-k neighbor in the quantized metric. Same children and
  * arithmetic as [[PqCodes]]. */
case class PqReconErr(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int,
    codebook: Seq[Long])
  extends BinaryExpression {

  private val dim = graft.functions.VectorFunctions.Dim
  private val dsub = dim / m
  require(dim % m == 0, s"m=$m must divide Dim=$dim")
  PqOps.checkBook(m, ksub, dsub, codebook)
  @transient private lazy val book: Array[Long] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_recon_err"

  override def nullSafeEval(emb: Any, cent: Any): Any = {
    val v = emb.asInstanceOf[ArrayData]
    val c = cent.asInstanceOf[ArrayData]
    if (v.numElements() != dim || c.numElements() != dim) return null
    val r = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i) || c.isNullAt(i)) return null
      r(i) = math.floor(v.getFloat(i).toDouble * 1.0e7).toLong -
        math.floor(c.getFloat(i).toDouble * 1.0e7).toLong
      i += 1
    }
    var err = 0L
    var j = 0
    while (j < m) {
      var bestD = Long.MaxValue
      var cw = 0
      while (cw < ksub) {
        var d = 0L
        var t = 0
        val base = (j * ksub + cw) * dsub
        while (t < dsub) {
          val diff = r(j * dsub + t) - book(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) bestD = d
        cw += 1
      }
      err += bestD
      j += 1
    }
    err
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val bookRef = ctx.addReferenceObj("pqBook", book, "long[]")
      val r = ctx.freshName("r")
      val err = ctx.freshName("err")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cw = ctx.freshName("cw"); val t = ctx.freshName("t")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim || $c.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $r = new long[$dim];
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $r[$i] = (long) java.lang.Math.floor(((double) $v.getFloat($i)) * 1.0E7D)
         |           - (long) java.lang.Math.floor(((double) $c.getFloat($i)) * 1.0E7D);
         |  }
         |  if (!${ev.isNull}) {
         |    long $err = 0L;
         |    for (int $j = 0; $j < $m; $j++) {
         |      long $bestD = Long.MAX_VALUE;
         |      for (int $cw = 0; $cw < $ksub; $cw++) {
         |        long $d = 0L;
         |        int $base = ($j * $ksub + $cw) * $dsub;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          long $diff = $r[$j * $dsub + $t] - $bookRef[$base + $t];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) $bestD = $d;
         |      }
         |      $err += $bestD;
         |    }
         |    ${ev.value} = $err;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconErr =
    copy(left = newLeft, right = newRight)
}

object PqReconErr {
  def apply(embedding: Column, centroid: Column, m: Int, ksub: Int,
            codebook: Seq[Long]): Column =
    SparkSqlBridge.column(PqReconErr(SparkSqlBridge.expression(embedding),
      SparkSqlBridge.expression(centroid), m, ksub, codebook))
}

/** ADC LOOKUP TABLE of one query against one coarse cell: entry
  * (j·ksub + c) = exact int64 squared L2 distance between the query
  * residual's subspace-j slice and codebook entry (j, c) — built once
  * per (query, probed cell), |queries|·probes rows total, each
  * m·ksub longs. Children: (query embedding, cell centroid). */
case class PqLut(
    left: Expression,
    right: Expression,
    m: Int,
    ksub: Int,
    codebook: Seq[Long])
  extends BinaryExpression {

  private val dim = graft.functions.VectorFunctions.Dim
  private val dsub = dim / m
  require(dim % m == 0, s"m=$m must divide Dim=$dim")
  PqOps.checkBook(m, ksub, dsub, codebook)
  // case-class field stays a Seq (structural equality — plan
  // canonicalization / exchange reuse); eval paths use the array
  @transient private lazy val book: Array[Long] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(emb: Any, cent: Any): Any = {
    val v = emb.asInstanceOf[ArrayData]
    val c = cent.asInstanceOf[ArrayData]
    if (v.numElements() != dim || c.numElements() != dim) return null
    val r = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i) || c.isNullAt(i)) return null
      r(i) = math.floor(v.getFloat(i).toDouble * 1.0e7).toLong -
        math.floor(c.getFloat(i).toDouble * 1.0e7).toLong
      i += 1
    }
    val lut = new Array[Long](m * ksub)
    var j = 0
    while (j < m) {
      var cw = 0
      while (cw < ksub) {
        var d = 0L
        val base = (j * ksub + cw) * dsub
        var t = 0
        while (t < dsub) {
          val diff = r(j * dsub + t) - book(base + t)
          d += diff * diff
          t += 1
        }
        lut(j * ksub + cw) = d
        cw += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val bookRef = ctx.addReferenceObj("pqBook", book, "long[]")
      val r = ctx.freshName("r"); val lut = ctx.freshName("lut")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cw = ctx.freshName("cw"); val t = ctx.freshName("t")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim || $c.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $r = new long[$dim];
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $r[$i] = (long) java.lang.Math.floor(((double) $v.getFloat($i)) * 1.0E7D)
         |           - (long) java.lang.Math.floor(((double) $c.getFloat($i)) * 1.0E7D);
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $lut = new long[${m * ksub}];
         |    for (int $j = 0; $j < $m; $j++) {
         |      for (int $cw = 0; $cw < $ksub; $cw++) {
         |        long $d = 0L;
         |        int $base = ($j * $ksub + $cw) * $dsub;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          long $diff = $r[$j * $dsub + $t] - $bookRef[$base + $t];
         |          $d += $diff * $diff;
         |        }
         |        $lut[$j * $ksub + $cw] = $d;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLut =
    copy(left = newLeft, right = newRight)
}

object PqLut {
  def apply(qEmbedding: Column, centroid: Column, m: Int, ksub: Int,
            codebook: Seq[Long]): Column =
    SparkSqlBridge.column(PqLut(SparkSqlBridge.expression(qEmbedding),
      SparkSqlBridge.expression(centroid), m, ksub, codebook))
}

/** PACK m codeword ids (each < 256) into an m-byte binary — the
  * stored index column (Dim·4 float bytes → m bytes, the 16–32x
  * compression PQ exists for). */
case class PqPack(child: Expression, m: Int, ksub: Int)
  extends UnaryExpression {

  require(ksub <= 256, s"byte-packed codes need ksub <= 256, got $ksub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_pack"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != m) return null
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      if (a.isNullAt(j)) return null
      val v = a.getLong(j)
      if (v < 0 || v >= ksub) return null
      out(j) = v.toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val v = ctx.freshName("v")
      s"""
         |if ($a.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$m];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    long $v = $a.getLong($j);
         |    if ($v < 0 || $v >= $ksub) { ${ev.isNull} = true; break; }
         |    $out[$j] = (byte) $v;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $out; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqPack =
    copy(child = newChild)
}

object PqPack {
  def apply(codes: Column, m: Int, ksub: Int): Column =
    SparkSqlBridge.column(PqPack(SparkSqlBridge.expression(codes), m, ksub))
}

/** ADC SCORE: exact int64 approximate squared distance of one stored
  * code row against one query's lookup table —
  * `Σ_j lut[j·ksub + codes[j]]`. Children: (codes binary, lut
  * array<long>). The per-candidate work is m ADDS and m loads — the
  * whole point of PQ: the scan never touches a float vector. */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<long>), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codes: Any, lutAny: Any): Any = {
    val pq = codes.asInstanceOf[Array[Byte]]
    val lut = lutAny.asInstanceOf[ArrayData]
    if (pq.length != m || lut.numElements() != m * ksub) return null
    var s = 0L
    var j = 0
    while (j < m) {
      val c = pq(j) & 0xff
      if (c >= ksub || lut.isNullAt(j * ksub + c)) return null
      s += lut.getLong(j * ksub + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pq, lut) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      s"""
         |if ($pq.length != $m || $lut.numElements() != ${m * ksub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $c = $pq[$j] & 0xff;
         |    if ($c >= $ksub || $lut.isNullAt($j * $ksub + $c)) { ${ev.isNull} = true; break; }
         |    $s += $lut.getLong($j * $ksub + $c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(codes: Column, lut: Column, m: Int, ksub: Int): Column =
    SparkSqlBridge.column(PqAdc(SparkSqlBridge.expression(codes),
      SparkSqlBridge.expression(lut), m, ksub))
}

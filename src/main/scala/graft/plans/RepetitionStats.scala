package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the Gopher repetition signals of ONE
  * document in ONE pass over its UTF-8 bytes — per-row local hash
  * counting instead of a corpus-wide gram shuffle.
  *
  * Replaces the explode shape (reference rule set: Rae et al. 2021
  * Table A1; the q73 oracle keeps this composed SQL form)
  *
  *   explode(2-grams ++ 5-grams)            -- ~2 rows per word
  *     → groupBy(doc_id, n, gram).count     -- full gram-stream shuffle
  *     → groupBy(doc_id).agg(max/sum cov)   -- second shuffle
  *     → join back to the doc table         -- third exchange
  *
  * with a pure map stage. The repetition being measured is a
  * WITHIN-document property, so nothing about it needs an exchange:
  * each row's 2-gram/5-gram counts live in a per-row hash map
  * (bounded by the document's own word count) and die with the row.
  * At sf1 (50k docs) the explode shape shuffled ~7M gram rows and
  * took 2.8 s; this scan is one pass. At 100 TB it is the difference
  * between a scan-bandwidth map stage and the corpus's largest
  * shuffle.
  *
  * Output struct (field semantics = the composed form EXACTLY):
  *   - n_words: segments of split(trim(text), " ") — empties included
  *     (consecutive spaces), 1 for the empty string (Spark split
  *     keeps trailing empties at limit -1; DuckDB string_split same).
  *   - tot: non-space CHARACTER count (code points, not bytes).
  *   - top2_cov: max over distinct word 2-grams of
  *     count × (chars(gram) − 1) — the "most covering 2-gram"
  *     tie-free variant of Gopher's most-frequent-2-gram rule; 0 if
  *     no 2-gram.
  *   - dup5_cov: Σ over distinct word 5-grams with count > 1 of
  *     count × (chars(gram) − 4); 0 if none.
  *
  * Gram identity is the exact byte string (words joined by the single
  * separator space, zero-copy slices of the source bytes); char
  * counts are code points, matching `length()` in both engines.
  * NULL text → NULL struct. Input must already be trim'd (callers
  * pass trim(text), exactly as the SQL form splits trim(text); `tot`
  * is unaffected because only spaces are trimmed).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = RepetitionStats.Schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  // Static-call codegen: the per-row hash maps don't inline cleanly as
  // flat statements (the WsTokenCount style), so the generated code
  // calls the same static method the interpreted path uses — still
  // inside whole-stage codegen, one virtual-free invoke per row.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.RepetitionStats.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("tot", LongType, nullable = false),
    StructField("top2_cov", LongType, nullable = false),
    StructField("dup5_cov", LongType, nullable = false)))

  /** One-pass Gopher repetition stats; called from both interpreted
    * eval and generated code — must stay public. */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    // segment boundaries of split-on-single-space (empties kept)
    var segs = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) segs += 1; i += 1 }
    val starts = new Array[Int](segs)
    val ends = new Array[Int](segs)
    var si = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        starts(si) = start; ends(si) = i; si += 1; start = i + 1
      }
      i += 1
    }
    val tot = s.numChars().toLong - (segs - 1).toLong

    var top2 = 0L
    if (segs >= 2) {
      val m = new java.util.HashMap[UTF8String, Array[Long]](segs * 2)
      i = 0
      while (i < segs - 1) {
        val g = UTF8String.fromBytes(bytes, starts(i), ends(i + 1) - starts(i))
        val c = m.get(g)
        if (c == null) m.put(g, Array(1L)) else c(0) += 1L
        i += 1
      }
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cov = e.getValue()(0) * (e.getKey.numChars().toLong - 1L)
        if (cov > top2) top2 = cov
      }
    }

    var dup5 = 0L
    if (segs >= 5) {
      val m = new java.util.HashMap[UTF8String, Array[Long]](segs * 2)
      i = 0
      while (i < segs - 4) {
        val g = UTF8String.fromBytes(bytes, starts(i), ends(i + 4) - starts(i))
        val c = m.get(g)
        if (c == null) m.put(g, Array(1L)) else c(0) += 1L
        i += 1
      }
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cnt = e.getValue()(0)
        if (cnt > 1L) dup5 += cnt * (e.getKey.numChars().toLong - 4L)
      }
    }

    new GenericInternalRow(Array[Any](segs, tot, top2, dup5))
  }

  def apply(s: Column): Column =
    SparkSqlBridge.column(new RepetitionStats(SparkSqlBridge.expression(s)))
}

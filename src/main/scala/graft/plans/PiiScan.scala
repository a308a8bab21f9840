package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkSqlBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: PII detection + redaction —
  * `struct(n_email, n_phone, n_ip, red_text)` — in byte-level scans
  * over the document, replacing THREE chained `regexp_replace` passes
  * plus THREE `regexp_count` passes (six full java.util.regex
  * traversals with per-match allocation) in `Quality.redactPii` /
  * `Quality.cleanCorpus`. The q74 measurement put the Java-regex gap
  * at 4.6×; composed into the q78 pipeline it was the last >2× bench
  * row.
  *
  * Semantics are pinned to the regex chain EXACTLY (the oracle SQL
  * keeps the regexp forms; PiiScanSpec property-pins this class
  * against java.util.regex on adversarial inputs):
  *
  *   - `n_email`/`n_phone`/`n_ip` = `regexp_count(text, pat)` on the
  *     ORIGINAL text, each pattern independently (leftmost,
  *     non-overlapping, greedy — java.util.regex `find()` semantics).
  *   - `red_text` = the CHAIN
  *     `replace(replace(replace(text, Email, "<EMAIL>"), Ip, "<IP>"),
  *     Phone, "<PHONE>")` — email first so digit runs inside a
  *     matched address can't re-match; each later pass runs over the
  *     PREVIOUS pass's output, so IP/phone matching happens only in
  *     the gaps between earlier replacements, with the placeholder
  *     edges acting as word boundaries (`<`/`>` are non-word chars —
  *     e.g. in `a@b.co123.4.5.6` the trailing octets become an IP
  *     match only AFTER the email is replaced, exactly as the chain
  *     does). Placeholders contain no digits, so later patterns
  *     (digits/dots/hyphens only) can never match INTO a placeholder,
  *     which is what makes the gap decomposition exact.
  *
  * The matchers hand-implement the three patterns on UTF-8 bytes with
  * ASCII `\d`/`\w`/`\b` — the RE2 definition, i.e. the ORACLE
  * (DuckDB) semantics. One deliberate divergence from the
  * java.util.regex chain this replaces: Java's `\b` is Unicode-aware
  * even though its `\d`/`\w` are ASCII (probed: `\b\d+` does NOT
  * match in `é123` under java.util.regex, but does under RE2 and
  * here), so on digits adjacent to non-ASCII letters the native scan
  * sides with the oracle where the old regex chain could not
  * (PiiScanSpec pins both the ASCII agreement and this divergence):
  *
  *   - Email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a
  *     match starts at the head of a maximal local-char run ending at
  *     `@` (backtracking the `+` can never reposition the `@`); the
  *     greedy domain resolves to the LAST dot in the maximal
  *     domain-char run that is followed by ≥2 letters, TLD extended
  *     maximally.
  *   - IPv4 `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: starts inside a
  *     digit run can never satisfy `\b`, so candidates are digit-run
  *     heads; each octet's digits are fenced by fixed dot positions,
  *     so `{1,3}` backtracking reduces to length checks; on failure
  *     the next candidate is the next digit-run head (which is how
  *     the engine recovers `5.6.7.8` from `1234.5.6.7.8`).
  *   - Phone `\b\d{3}[-.]\d{3,4}[-.]\d{4}\b`: same digit-run-head
  *     argument; the `{3,4}` middle group's two greedy paths are
  *     mutually exclusive on the run length, so no real backtracking
  *     survives.
  *
  * Scale shape: pure map stage, no allocation on the no-PII fast path
  * (returns the input UTF8String as `red_text`), one bounded output
  * buffer otherwise. Codegen is a static call (the RepetitionStats
  * discipline) — stays inside whole-stage codegen.
  *
  * `withCounts=false` (the q78 pipeline, which only consumes
  * `red_text`) skips the two independent count scans and reports the
  * CHAIN's per-kind replacement counts instead — documented weaker
  * semantics for a consumer that discards the counts anyway.
  */
case class PiiScan(child: Expression, withCounts: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = PiiScan.Schema
  override def prettyName: String = "pii_scan"

  override def nullSafeEval(input: Any): Any =
    PiiScan.compute(input.asInstanceOf[UTF8String], withCounts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.PiiScan.compute($s, $withCounts);")

  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiScan {
  val Schema: StructType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false),
    StructField("red_text", StringType, nullable = false)))

  private val EmailTag: Array[Byte] = "<EMAIL>".getBytes("UTF-8")
  private val IpTag: Array[Byte] = "<IP>".getBytes("UTF-8")
  private val PhoneTag: Array[Byte] = "<PHONE>".getBytes("UTF-8")
  private val Tags: Array[Array[Byte]] = Array(EmailTag, IpTag, PhoneTag)

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'
  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'
  @inline private def isSep(b: Byte): Boolean = b == '-' || b == '.'

  /** Growable (start, end, kind) triple list; kept sorted by
    * construction (every scan emits left to right). */
  private final class Spans {
    var n = 0
    var a: Array[Int] = new Array[Int](12)
    def add(start: Int, end: Int, kind: Int): Unit = {
      if (n + 3 > a.length) {
        val b = new Array[Int](a.length * 2)
        System.arraycopy(a, 0, b, 0, n); a = b
      }
      a(n) = start; a(n + 1) = end; a(n + 2) = kind; n += 3
    }
  }

  /** All email matches in [0, n); returns the count, appends spans
    * (kind 0) when `out` is non-null. */
  private def scanEmails(s: UTF8String, out: Spans): Int = {
    val n = s.numBytes()
    var cnt = 0
    var search = 0 // previous match end — find() never re-reads before it
    var j = 0
    while (j < n) {
      if (s.getByte(j) == '@') {
        var a = j
        while (a > search && isLocal(s.getByte(a - 1))) a -= 1
        if (a < j) {
          var k = j + 1
          while (k < n && isDomain(s.getByte(k))) k += 1
          // greedy domain: LAST dot in [j+2, k-3] followed by >=2 letters
          var p = -1
          var q = k - 3
          while (q >= j + 2 && p < 0) {
            if (s.getByte(q) == '.' && isAlpha(s.getByte(q + 1)) &&
              isAlpha(s.getByte(q + 2))) p = q
            q -= 1
          }
          if (p >= 0) {
            var e = p + 3
            while (e < k && isAlpha(s.getByte(e))) e += 1
            if (out != null) out.add(a, e, 0)
            cnt += 1
            search = e
            j = e - 1 // +1 below resumes the '@' hunt at the match end
          }
        }
      }
      j += 1
    }
    cnt
  }

  /** IPv4 matches in [lo, hi). The region edges are always word
    * boundaries for the caller (document edge or placeholder edge —
    * `<`/`>` are non-word), so `\b` at lo/hi holds unconditionally. */
  private def scanIp(s: UTF8String, lo: Int, hi: Int, out: Spans): Int = {
    var cnt = 0
    var i = lo
    while (i < hi) {
      if (!isDigit(s.getByte(i))) i += 1
      else {
        var e1 = i
        while (e1 < hi && isDigit(s.getByte(e1))) e1 += 1
        var end = -1
        if ((i == lo || !isWord(s.getByte(i - 1))) && e1 - i <= 3 &&
          e1 < hi && s.getByte(e1) == '.') {
          var ok = true
          var pos = e1 + 1
          var oct = 2
          while (ok && oct <= 4) {
            var e = pos
            while (e < hi && isDigit(s.getByte(e))) e += 1
            val len = e - pos
            if (len < 1 || len > 3) ok = false
            else if (oct < 4) {
              if (e < hi && s.getByte(e) == '.') pos = e + 1 else ok = false
            } else if (e == hi || !isWord(s.getByte(e))) end = e
            else ok = false
            oct += 1
          }
        }
        if (end >= 0) {
          if (out != null) out.add(i, end, 1)
          cnt += 1
          i = end
        } else i = e1 // next candidate = next digit-run head
      }
    }
    cnt
  }

  /** Phone matches (`\d{3}[-.]\d{3,4}[-.]\d{4}` with `\b` fences) in
    * [lo, hi); same open-edge contract as [[scanIp]]. */
  private def scanPhone(s: UTF8String, lo: Int, hi: Int, out: Spans): Int = {
    var cnt = 0
    var i = lo
    while (i < hi) {
      if (!isDigit(s.getByte(i))) i += 1
      else {
        var e1 = i
        while (e1 < hi && isDigit(s.getByte(e1))) e1 += 1
        var end = -1
        if ((i == lo || !isWord(s.getByte(i - 1))) && e1 - i == 3 &&
          e1 < hi && isSep(s.getByte(e1))) {
          val st2 = e1 + 1
          var e2 = st2
          while (e2 < hi && isDigit(s.getByte(e2))) e2 += 1
          val len2 = e2 - st2
          // {3,4} greedy: the 4- and 3-digit paths need a separator at
          // the run end, so they are mutually exclusive on len2
          if ((len2 == 3 || len2 == 4) && e2 < hi && isSep(s.getByte(e2))) {
            val st3 = e2 + 1
            var e3 = st3
            while (e3 < hi && isDigit(s.getByte(e3))) e3 += 1
            if (e3 - st3 == 4 && (e3 == hi || !isWord(s.getByte(e3)))) end = e3
          }
        }
        if (end >= 0) {
          if (out != null) out.add(i, end, 2)
          cnt += 1
          i = end
        } else i = e1
      }
    }
    cnt
  }

  /** Run `scan` over the gaps of the (sorted) span set, appending new
    * spans of the later pass; returns the merged sorted span set. */
  private def scanGaps(s: UTF8String, prior: Spans,
      scan: (UTF8String, Int, Int, Spans) => Int): Spans = {
    val n = s.numBytes()
    val fresh = new Spans
    var prev = 0
    var k = 0
    while (k < prior.n) {
      if (prev < prior.a(k)) scan(s, prev, prior.a(k), fresh)
      prev = prior.a(k + 1)
      k += 3
    }
    if (prev < n) scan(s, prev, n, fresh)
    if (fresh.n == 0) prior
    else { // linear merge of two sorted triple lists
      val m = new Spans
      var i = 0
      var j = 0
      while (i < prior.n || j < fresh.n) {
        if (j >= fresh.n || (i < prior.n && prior.a(i) < fresh.a(j))) {
          m.add(prior.a(i), prior.a(i + 1), prior.a(i + 2)); i += 3
        } else { m.add(fresh.a(j), fresh.a(j + 1), fresh.a(j + 2)); j += 3 }
      }
      m
    }
  }

  def compute(s: UTF8String, withCounts: Boolean): GenericInternalRow = {
    val n = s.numBytes()
    val emails = new Spans
    val nEmail = scanEmails(s, emails)
    val withIp = scanGaps(s, emails, scanIp)
    val all = scanGaps(s, withIp, scanPhone)

    var nIp = 0
    var nPhone = 0
    if (withCounts) {
      nIp = scanIp(s, 0, n, null)
      nPhone = scanPhone(s, 0, n, null)
    } else {
      var k = 0
      while (k < all.n) {
        if (all.a(k + 2) == 1) nIp += 1
        else if (all.a(k + 2) == 2) nPhone += 1
        k += 3
      }
    }

    val red: UTF8String =
      if (all.n == 0) s // no-PII fast path: zero-copy
      else {
        var outLen = n
        var k = 0
        while (k < all.n) {
          outLen += Tags(all.a(k + 2)).length - (all.a(k + 1) - all.a(k))
          k += 3
        }
        val src = s.getBytes
        val out = new Array[Byte](outLen)
        var w = 0
        var prev = 0
        k = 0
        while (k < all.n) {
          val st = all.a(k); val en = all.a(k + 1); val tag = Tags(all.a(k + 2))
          System.arraycopy(src, prev, out, w, st - prev); w += st - prev
          System.arraycopy(tag, 0, out, w, tag.length); w += tag.length
          prev = en
          k += 3
        }
        System.arraycopy(src, prev, out, w, n - prev)
        UTF8String.fromBytes(out)
      }

    new GenericInternalRow(Array[Any](nEmail, nPhone, nIp, red))
  }

  /** DataFrame-API entry point:
    * `struct<n_email: int, n_phone: int, n_ip: int, red_text: string>`. */
  def apply(text: Column, withCounts: Boolean): Column =
    SparkSqlBridge.column(PiiScan(SparkSqlBridge.expression(text), withCounts))
  def apply(text: Column): Column = apply(text, withCounts = true)
}

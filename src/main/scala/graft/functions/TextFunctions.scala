package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text distillation functions — everything is built from
  * org.apache.spark.sql.functions (codegen'd, no UDFs), and each
  * regex/constant is shared verbatim with the DuckDB oracle SQL.
  *
  * Reference semantics:
  *  - OOC scrub `\(.*?\)` — reference: distill3a_ic_regex.py:34-35
  *  - Discord mention / custom-emoji normalization — reference:
  *    distill4_normalize.py:340,343
  *  - OOC heuristic markers (OOC/OOG, leading paren) — reference:
  *    distill3b_ic_classifier_gpt.py
  *  - id hashing for anonymization — reference: scripts/anonymize.py:24-29
  *  - deterministic train/test split — reference: finetune_prep.py:172-176
  */
object TextFunctions {

  /** Parenthesized OOC asides (reference: distill3a_ic_regex.py:34). */
  val OocAsideRe = "\\(.*?\\)"
  /** Discord user/role/channel mentions (reference: distill4_normalize.py:340). */
  val MentionRe = "<(@[!&]?|#)\\d{17,20}>"
  /** Discord custom emoji → keep `:name:` (reference: distill4_normalize.py:343). */
  val EmojiRe = "<a?(:\\w+?:)\\d{17,20}>"
  /** Whitespace spelled out as an explicit character set: Java's `\s`
    * includes `\x0B` (vertical tab) but DuckDB's RE2 `\s` does not, so
    * a bare `\s` silently diverges cross-engine on text containing
    * `\x0B`. These characters are shared VERBATIM with every oracle
    * SQL regex (both engines parse `\t`/`\n`/`\x0B`/`\f`/`\r`
    * identically inside a class). */
  val WsChars = " \\t\\n\\x0B\\f\\r"
  /** One-or-more whitespace, cross-engine exact. */
  val WsPlusRe = s"[$WsChars]+"
  /** Non-alnum-non-whitespace (punctuation-ish), cross-engine exact. */
  val PunctRe = s"[^a-z0-9$WsChars]"
  /** BPE-ish token pattern: letter runs, digit runs, single symbols. */
  val BpeTokenRe = s"[a-z]+|[0-9]+|$PunctRe"
  /** English stopword sample for the language-ID / quality heuristics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "is", "of", "to", "and", "in", "it", "on")
  /** Same list as a SQL IN-list literal. */
  val StopwordsSql: String = Stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  /** Scrub parenthesized asides and trim (empty result = drop). */
  def scrubOoc(text: Column): Column = trim(regexp_replace(text, OocAsideRe, ""))

  /** Strip mentions, reduce custom emoji to `:name:`. */
  def normalizeMessage(text: Column): Column =
    regexp_replace(regexp_replace(text, MentionRe, ""), EmojiRe, "$1")

  /** Heuristic OOC flag (0/1): leading paren or OOC/OOG marker. */
  def isOoc(text: Column): Column = {
    val t = lower(text)
    (t.startsWith("(") || t.contains("ooc") || t.contains("oog")).cast("int")
  }

  /** The exact complement of [[PunctRe]] as a literal char list. */
  private val PunctAllowedChars =
    "abcdefghijklmnopqrstuvwxyz0123456789 \t\n\u000B\f\r"

  /** Count of [[PunctRe]]-matching chars, computed as a codegen'd
    * char-map delete (`translate`) instead of a Java-regex scan —
    * measured ~5x cheaper on the documents corpus, same count for
    * BMP text (both sides count single chars outside the allowed
    * set; the synthetic corpus is ASCII). The ORACLE keeps the regex
    * form — the cross-engine constant stays [[PunctRe]]. */
  def punctCount(text: Column): Column =
    length(translate(text, PunctAllowedChars, "")).cast("bigint")

  /** Whitespace-token count (BIGINT): byte-scan run counter, exact
    * equivalent of `size(split(trim(text), WsPlusRe))` without the
    * regex split's substring-array materialization (see
    * [[graft.plans.WsTokenCount]]; equivalence property-tested). */
  def wsTokenCount(text: Column): Column =
    graft.plans.WsTokenCount(text)

  /** The regex-split form of [[wsTokenCount]] — kept as the
    * property-test reference for the byte-scan expression. */
  def wsTokenCountRegex(text: Column): Column =
    size(split(trim(text), WsPlusRe)).cast("bigint")

  /** BPE-ish token count (BIGINT): matches of [[BpeTokenRe]], computed
    * by the allocation-free byte-scan expression
    * [[graft.plans.BpeTokenCount]] instead of a Java-regex scan
    * (measured >3× cheaper at sf1 — Java regex on a hot text path
    * loses badly to the oracle's RE2; same cure as [[punctCount]]).
    * The ORACLE keeps `regexp_extract_all` with the shared
    * [[BpeTokenRe]] constant; equivalence is property-tested against
    * `regexp_count` in TextFunctionsSpec. */
  def bpeTokenCount(text: Column): Column =
    graft.plans.BpeTokenCount(text)

  /** The Java-regex form of [[bpeTokenCount]] — kept as the
    * property-test reference for the byte-scan expression. */
  def bpeTokenCountRegex(text: Column): Column =
    regexp_count(text, lit(BpeTokenRe)).cast("bigint")

  /** Single-space word array (matches DuckDB string_split(x, ' ')). */
  def words(text: Column): Column = split(trim(text), " ")

  /** Count of stopwords in a word array (BIGINT). Kept as the
    * property-test reference for [[textStats]]. */
  def stopwordCount(wordArr: Column): Column =
    size(filter(wordArr, w => w.isin(Stopwords: _*))).cast("bigint")

  /** One-pass `struct<n_words, n_punct, n_stop>` — the q29/q30
    * signals computed by the native byte-scan expression
    * [[graft.plans.TextStats]] instead of three separate passes (a
    * split-array build, a translate string build, and a filtered
    * split) — measured ~2x on the q30 hot path at sf1. The ORACLE
    * keeps the composed forms; equivalence is property-pinned in
    * TextFunctionsSpec. */
  def textStats(text: Column): Column = graft.plans.TextStats(text)

  /** The q30 quality score, verbatim (the oracle-established
    * formula): 0.4·[20 ≤ words ≤ 1000] + 1.5·stopword-ratio +
    * 0.3·(1 − punct-ratio). Shared by q98/q99's ordering tier and
    * the capstone's optional tail stages. */
  def qualityScore(c: Column): Column = {
    val st = textStats(c)
    val nChars = length(c).cast("bigint")
    val nWords = st.getField("n_words")
    // NULL-guarded divisions (ANSI mode): an empty document — which
    // the capstone's span surgery CAN produce — scores NULL rather
    // than erroring, matching SQL NULL propagation; the established
    // q98/q99 oracle surfaces never see the empty case
    val punct = when(nChars > 0, st.getField("n_punct") / nChars)
    val stop = when(nWords > 0, st.getField("n_stop") / nWords)
    lit(0.4) * when(nWords >= 20 && nWords <= 1000, 1).otherwise(0) +
      lit(0.3) * stop * 5 + lit(0.3) * (lit(1) - punct)
  }

  /** Whole-document fingerprint: md5 of whitespace-collapsed,
    * lowercased, trimmed text (reference: scripts/anonymize.py:24
    * hash-of-normalized-identity analog). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(graft.plans.WsCollapse(text))))

  /** The regex form of the fingerprint's normalization — kept as the
    * property-test reference for [[graft.plans.WsCollapse]]. */
  def wsCollapseRegex(text: Column): Column =
    regexp_replace(text, WsPlusRe, " ")

  /** Deterministic anonymous id: 16 hex chars of salted md5
    * (reference: scripts/anonymize.py:24-29 md5(id) → numeric id). */
  def anonId(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 16)

  /** Deterministic [0, mod) bucket from a salted md5 — identical in
    * DuckDB as CAST(('0x' || substr(md5(...),1,4)) AS BIGINT) % mod.
    * (reference: finetune_prep.py:172-176 deterministic split). */
  def hashBucket(id: Column, salt: String, mod: Int): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("bigint") % mod).cast("bigint")

  /** Actor HP bucket label from (hp, max_hp) — the exact ratio
    * boundaries of the reference's actor normalization (reference:
    * distill4_normalize.py:170-181): >=1 Healthy, (0.5,1) Injured,
    * (0.15,0.5] Bloodied, (0,0.15] Critical, <=0 Dead. Null when
    * either side is null or max_hp <= 0. */
  def hpBucket(hp: Column, maxHp: Column): Column = {
    val r = hp.cast("double") / maxHp.cast("double")
    when(hp.isNull || maxHp.isNull || maxHp <= 0, lit(null).cast("string"))
      .when(r >= 1, "Healthy")
      .when(r > 0.5, "Injured")
      .when(r > 0.15, "Bloodied")
      .when(r > 0, "Critical")
      .otherwise("Dead")
  }

  /** Actor HP display string "<hp/max HP; Bucket>" (reference:
    * distill4_normalize.py:168-186). */
  def hpState(hp: Column, maxHp: Column): Column =
    when(hp.isNull || maxHp.isNull, lit(null).cast("string"))
      .otherwise(concat(
        lit("<"), hp.cast("string"), lit("/"), maxHp.cast("string"), lit(" HP"),
        when(hpBucket(hp, maxHp).isNotNull,
          concat(lit("; "), hpBucket(hp, maxHp))).otherwise(lit("")),
        lit(">")))

  /** Replace the FIRST occurrence of the server's command prefix with
    * the canonical "!" (reference: distill4_normalize.py:356-357,
    * content.replace(prefix, "!", 1)). Rows without the prefix pass
    * through unchanged. */
  def normalizeCommandPrefix(content: Column, prefix: Column): Column = {
    val pos = instr(content, prefix) // 1-based; 0 when absent
    val before = content.substr(lit(1), pos - 1)
    val after = content.substr(pos + length(prefix), length(content))
    when(pos > 0, concat(before, lit("!"), after)).otherwise(content)
  }
}

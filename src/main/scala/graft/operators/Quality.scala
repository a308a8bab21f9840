package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality / repetition operators — the Gopher-style rule
  * family (Rae et al. 2021, "Scaling Language Models", Table A1) a
  * pretraining pipeline runs between ingestion and dedup. The
  * reference repo's distillation plays the same role for its corpus
  * (short/bot filters, distill2_authors.py single-caster gate); these
  * are the general-corpus analogs, first-class here like the dedup
  * suite.
  *
  * Scale shape: everything is either a pure map stage (PII redaction)
  * or explode → keyed hash aggregation with map-side partial
  * aggregation (n-gram counts). The gram-count shuffle carries the
  * doc key, so within-document repetition — the very thing being
  * measured — compresses in the partial aggregate before the
  * exchange. No windows, no joins except the final doc_id-keyed
  * stitch, which pins SHUFFLE_HASH because both sides are
  * corpus-shaped (round-9 broadcast-estimate discipline).
  */
object Quality {

  /** Tagged word n-gram stream column: array of (n, gram) structs for
    * each requested n, empty when the document is shorter than n
    * words. `ws` must be the split word array column. */
  private def taggedGrams(ws: Column, ns: Seq[Int]): Column =
    concat(ns.map { n =>
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => struct(lit(n).as("n"), concat_ws(" ", slice(ws, i, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }: _*)

  /** Plain word n-gram array for a single n (empty below n words). */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Gopher repetition rules per document (documents(doc_id, text)):
    *
    *   - `top2_frac`: fraction of non-space characters covered by the
    *     single word 2-gram covering the most characters (count ×
    *     gram chars). Gopher removes docs where the most frequent
    *     2-gram covers > 0.20 of the text; "covering the most
    *     characters" is the deterministic tie-free variant of "most
    *     frequent" (ties in count cannot flip the fraction).
    *   - `dup5_frac`: fraction of characters covered by occurrences
    *     of DUPLICATED word 5-grams (each occurrence's chars counted;
    *     Gopher threshold 0.15). This is the common published
    *     approximation of the paper's overlap-once accounting
    *     (overlapping occurrences may double-count characters).
    *   - `mean_word_len`, `n_words`, and the combined `keep` flag.
    *
    * `keep` is decided in exact int64 arithmetic (cov*5 <= tot,
    * cov*20 <= 3*tot) so the threshold comparison can never disagree
    * across engines on a float ulp.
    *
    * One explode + two keyed aggregations + one doc_id-keyed stitch
    * join; the grouping keys carry (tot, nw) — functionally dependent
    * on doc_id — so no extra columns shuffle separately.
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val d = docs.select(
      col("doc_id"),
      split(trim(col("text")), " ").as("ws"),
      length(translate(col("text"), " ", "")).as("tot"))
    val base = d.select(col("doc_id"), col("tot"), size(col("ws")).as("nw"))

    val grams = d.select(
      col("doc_id"), col("tot"), size(col("ws")).as("nw"),
      explode(taggedGrams(col("ws"), Seq(2, 5))).as("t"))

    val cnts = grams
      .groupBy(col("doc_id"), col("tot"), col("nw"),
        col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cnt"))

    val perDoc = cnts
      .groupBy(col("doc_id"), col("tot"), col("nw"))
      .agg(
        max(when(col("n") === 2, col("cnt") * (length(col("g")) - 1)))
          .as("top2_cov"),
        sum(when(col("n") === 5 && col("cnt") > 1,
          col("cnt") * (length(col("g")) - 4))).as("dup5_cov"))
      .select(col("doc_id"), col("tot"), col("nw"),
        coalesce(col("top2_cov"), lit(0L)).as("top2_cov"),
        coalesce(col("dup5_cov"), lit(0L)).as("dup5_cov"))

    val totNz = when(col("tot") === 0, lit(null)).otherwise(col("tot"))
    // join on all three keys — (tot, nw) are functionally dependent on
    // doc_id and already in the aggregate's HashPartitioning, so the
    // probe side needs no re-exchange
    base
      .hint("shuffle_hash")
      .join(perDoc, Seq("doc_id", "tot", "nw"), "left")
      .select(
        col("doc_id"),
        col("nw").as("n_words"),
        (coalesce(col("top2_cov"), lit(0L)).cast("double") / totNz)
          .as("top2_frac"),
        (coalesce(col("dup5_cov"), lit(0L)).cast("double") / totNz)
          .as("dup5_frac"),
        (col("tot").cast("double") / col("nw")).as("mean_word_len"),
        (coalesce(col("top2_cov"), lit(0L)) * 5 <= col("tot") &&
          coalesce(col("dup5_cov"), lit(0L)) * 20 <= col("tot") * 3)
          .cast("int").as("keep"))
  }

  // PII patterns — portable between Java regex (Spark) and RE2
  // (DuckDB): character classes, bounded repetition and \b only, no
  // backrefs or lookaround.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{4}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction over a text column: per-row match
    * counts for email / phone / IPv4 patterns and the redacted text
    * (`<EMAIL>`/`<IP>`/`<PHONE>` placeholders; email replaced first so
    * digit runs inside a matched address can't be re-matched). Pure
    * map stage — at 100 TB this saturates scan bandwidth, nothing
    * shuffles. */
  def redactPii(df: DataFrame, textCol: Column): DataFrame = {
    val red =
      regexp_replace(
        regexp_replace(
          regexp_replace(textCol, EmailRe, "<EMAIL>"),
          IpRe, "<IP>"),
        PhoneRe, "<PHONE>")
    df.withColumn("n_email", regexp_count(textCol, lit(EmailRe)))
      .withColumn("n_phone", regexp_count(textCol, lit(PhoneRe)))
      .withColumn("n_ip", regexp_count(textCol, lit(IpRe)))
      .withColumn("red_text", red)
  }

  /** Corpus-level top-k word n-grams by occurrence count (boilerplate
    * / template detection — the heavy-hitter scan run before writing
    * a cleaning rule). Deterministic total order (count desc, gram
    * asc). Shape: explode → gram-keyed hash agg (map-side combine
    * absorbs within-partition repetition) → two-phase distinct-doc
    * count → TakeOrdered top-k; no global sort materializes. */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val d = docs.select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
    d.select(col("doc_id"), explode(wordNgrams(col("ws"), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }
}

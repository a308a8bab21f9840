package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Quality

/** Corpus-cleaning operators over `documents` — the Gopher-style
  * repetition rules, PII redaction, and boilerplate heavy-hitter scan
  * a pretraining pipeline runs alongside the dedup suite (§2.D). The
  * reference's corpus hygiene is its distill filters (short/bot drop,
  * distill3a scrub); these are the general-corpus analogs, carried as
  * first-class operators like q71's decontamination.
  */
object CleanOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  // ---------------------------------------------------------------
  // q73: Gopher repetition rules (Rae et al. 2021 Table A1): per-doc
  // top-2-gram character coverage, duplicate-5-gram character
  // coverage, mean word length, and the exact-integer keep decision.
  private def q73(s: SparkSession, dir: String): DataFrame =
    Quality.gopherRepetition(docs(s, dir)).orderBy(col("doc_id"))

  private val q73Sql =
    """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws,
      |             length(replace(text, ' ', '')) AS tot FROM documents),
      |base AS (SELECT doc_id, tot, len(ws) AS nw FROM d),
      |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |         i -> ws[i] || ' ' || ws[i+1])) AS g
      |       FROM d WHERE len(ws) >= 2),
      |c2 AS (SELECT doc_id, max(cnt * (length(g) - 1)) AS top2_cov
      |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
      |       GROUP BY 1),
      |g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
      |       FROM d WHERE len(ws) >= 5),
      |c5 AS (SELECT doc_id, sum(cnt * (length(g) - 4)) AS dup5_cov
      |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2)
      |       WHERE cnt > 1 GROUP BY 1)
      |SELECT b.doc_id, b.nw AS n_words,
      |  CAST(coalesce(top2_cov, 0) AS DOUBLE) / nullif(b.tot, 0) AS top2_frac,
      |  CAST(coalesce(dup5_cov, 0) AS DOUBLE) / nullif(b.tot, 0) AS dup5_frac,
      |  CAST(b.tot AS DOUBLE) / b.nw AS mean_word_len,
      |  CAST(coalesce(top2_cov, 0) * 5 <= b.tot
      |       AND coalesce(dup5_cov, 0) * 20 <= 3 * b.tot AS INT) AS keep
      |FROM base b LEFT JOIN c2 USING (doc_id) LEFT JOIN c5 USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q74: PII redaction. The synthetic corpus carries no PII, so —
  // like q57's sampled labels and q59's actor sheets — a
  // deterministic salted-md5 stand-in injects emails / phone numbers
  // / IPv4 addresses into a known subset of docs IDENTICALLY on both
  // engines; the operator under test is the detect+redact map stage.
  private def piiAugmentedSpark(s: SparkSession, dir: String): DataFrame = {
    def hx(from: Int, len: Int): String =
      s"CAST(conv(substr(h, $from, $len), 16, 10) AS BIGINT)"
    docs(s, dir)
      .withColumn("h", md5(concat(lit("pii"), col("doc_id").cast("string"))))
      .withColumn("aug", expr(
        s"""concat(text, CASE ${hx(1, 4)} % 5
           |  WHEN 0 THEN concat(' contact user', CAST(${hx(5, 4)} % 10000 AS STRING), '@example.com')
           |  WHEN 1 THEN concat(' call 555-', lpad(CAST(${hx(9, 4)} % 10000 AS STRING), 4, '0'),
           |                     '-', lpad(CAST(${hx(13, 4)} % 10000 AS STRING), 4, '0'))
           |  WHEN 2 THEN concat(' node ', CAST(${hx(17, 2)} % 256 AS STRING), '.', CAST(${hx(19, 2)} % 256 AS STRING),
           |                     '.', CAST(${hx(21, 2)} % 256 AS STRING), '.', CAST(${hx(23, 2)} % 256 AS STRING))
           |  WHEN 3 THEN concat(' contact user', CAST(${hx(5, 4)} % 10000 AS STRING), '@example.com at ',
           |                     CAST(${hx(17, 2)} % 256 AS STRING), '.', CAST(${hx(19, 2)} % 256 AS STRING),
           |                     '.', CAST(${hx(21, 2)} % 256 AS STRING), '.', CAST(${hx(23, 2)} % 256 AS STRING))
           |  ELSE '' END)""".stripMargin))
  }

  private def q74(s: SparkSession, dir: String): DataFrame =
    Quality.redactPii(piiAugmentedSpark(s, dir), col("aug"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        col("red_text"))
      .orderBy(col("doc_id"))

  private val q74Sql = {
    def hx(from: Int, len: Int): String =
      s"CAST(('0x' || substr(h, $from, $len)) AS BIGINT)"
    s"""WITH d AS (SELECT doc_id, text,
       |    md5('pii' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
       |a AS (SELECT doc_id, text || CASE ${hx(1, 4)} % 5
       |    WHEN 0 THEN ' contact user' || CAST(${hx(5, 4)} % 10000 AS VARCHAR) || '@example.com'
       |    WHEN 1 THEN ' call 555-' || lpad(CAST(${hx(9, 4)} % 10000 AS VARCHAR), 4, '0')
       |                || '-' || lpad(CAST(${hx(13, 4)} % 10000 AS VARCHAR), 4, '0')
       |    WHEN 2 THEN ' node ' || CAST(${hx(17, 2)} % 256 AS VARCHAR) || '.' || CAST(${hx(19, 2)} % 256 AS VARCHAR)
       |                || '.' || CAST(${hx(21, 2)} % 256 AS VARCHAR) || '.' || CAST(${hx(23, 2)} % 256 AS VARCHAR)
       |    WHEN 3 THEN ' contact user' || CAST(${hx(5, 4)} % 10000 AS VARCHAR) || '@example.com at '
       |                || CAST(${hx(17, 2)} % 256 AS VARCHAR) || '.' || CAST(${hx(19, 2)} % 256 AS VARCHAR)
       |                || '.' || CAST(${hx(21, 2)} % 256 AS VARCHAR) || '.' || CAST(${hx(23, 2)} % 256 AS VARCHAR)
       |    ELSE '' END AS aug FROM d)
       |SELECT doc_id,
       |  len(regexp_extract_all(aug, '${Quality.EmailRe}')) AS n_email,
       |  len(regexp_extract_all(aug, '${Quality.PhoneRe}')) AS n_phone,
       |  len(regexp_extract_all(aug, '${Quality.IpRe}')) AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(aug,
       |    '${Quality.EmailRe}', '<EMAIL>', 'g'),
       |    '${Quality.IpRe}', '<IP>', 'g'),
       |    '${Quality.PhoneRe}', '<PHONE>', 'g') AS red_text
       |FROM a ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q75: corpus boilerplate heavy-hitters — top-20 word 3-grams by
  // occurrence count with distinct-doc spread (the scan you run
  // before writing a template-removal rule).
  private val TopK = 20

  private def q75(s: SparkSession, dir: String): DataFrame =
    Quality.topNgrams(docs(s, dir), 3, TopK)

  private val q75Sql =
    s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
       |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
       |      FROM d WHERE len(ws) >= 3)
       |SELECT gram, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
       |FROM g GROUP BY gram ORDER BY cnt DESC, gram LIMIT $TopK""".stripMargin

  // ---------------------------------------------------------------
  // q76: the fitted DSIR selection model (Xie et al. 2023) — hashed
  // unigram+bigram occurrence counts per bucket for the target slice
  // (q29's stopword-ratio "en" predicate) and the raw corpus. The
  // model IS the data-shaped surface (exact int64 counts on the
  // 48-bit-md5 stream, byte-reproducible); the float log-ratio /
  // Gumbel resampling tail is spec-gated (`Dsir.logWeights/select`,
  // CleanOpsSpec) — the q58 design-matrix precedent.
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred =
      (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    // Spread: the hashed-ngram bucket counting is scan-side compute;
    // on an under-split layout it runs on one task (operators/Spread —
    // measured 0.84 -> 0.48 s at sf0.1; no-op on real layouts).
    graft.operators.Dsir.bucketModel(
      graft.operators.Spread(docs(s, dir)), enPred)
      .orderBy(col("bucket"))
  }

  private val q76Sql = {
    import graft.functions.TextFunctions.StopwordsSql
    val k = graft.operators.Dsir.NumBuckets
    s"""WITH t AS (SELECT doc_id, text,
       |    (len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql))
       |       / len(string_split(lower(trim(text)), ' '))) >= 0.05 AS is_t
       |  FROM documents),
       |d AS (SELECT is_t, string_split(trim(text), ' ') AS ws FROM t),
       |u1 AS (SELECT is_t, unnest(list_transform(range(1, len(ws) + 1),
       |    i -> CAST(('0x' || substr(md5(ws[i]), 1, 12)) AS BIGINT) % $k)) AS bucket FROM d),
       |u2 AS (SELECT is_t, unnest(list_transform(range(1, len(ws)),
       |    i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 12)) AS BIGINT) % $k)) AS bucket FROM d),
       |a AS (SELECT * FROM u1 UNION ALL SELECT * FROM u2)
       |SELECT bucket, CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
       |  count(*) AS n_raw
       |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------
  // q78: the CLEAN-CORPUS capstone — the composed pipeline a
  // pretraining job actually materializes: exact-dedup survivors
  // (q34's fingerprint window) → Gopher repetition keep (q73's rules
  // as an inline RepetitionStats map filter — no gram shuffle) → PII
  // redaction (q74's map stage) → BPE-ish token count (q28's native
  // counter) per surviving document. Spark shape: ONE scan, ONE
  // window exchange (the dedup fingerprint), everything else fused
  // map work — the whole corpus-hygiene pipeline at scan bandwidth.
  private def q78(s: SparkSession, dir: String): DataFrame =
    Quality.cleanCorpus(docs(s, dir))

  private val q78Sql = {
    import graft.functions.TextFunctions.{BpeTokenRe, WsPlusRe}
    val red = s"""regexp_replace(regexp_replace(regexp_replace(text,
       |    '${Quality.EmailRe}', '<EMAIL>', 'g'),
       |    '${Quality.IpRe}', '<IP>', 'g'),
       |    '${Quality.PhoneRe}', '<PHONE>', 'g')""".stripMargin
    s"""WITH f AS (SELECT doc_id, text,
       |    md5(lower(trim(regexp_replace(text, '$WsPlusRe', ' ', 'g')))) AS fp
       |  FROM documents),
       |surv AS (SELECT doc_id, text FROM
       |  (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY fp) AS canon FROM f)
       |  WHERE doc_id = canon),
       |d AS (SELECT doc_id, text, string_split(trim(text), ' ') AS ws,
       |    length(replace(text, ' ', '')) AS tot FROM surv),
       |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |         i -> ws[i] || ' ' || ws[i+1])) AS g
       |       FROM d WHERE len(ws) >= 2),
       |c2 AS (SELECT doc_id, max(cnt * (length(g) - 1)) AS top2_cov
       |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
       |       GROUP BY 1),
       |g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
       |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
       |       FROM d WHERE len(ws) >= 5),
       |c5 AS (SELECT doc_id, sum(cnt * (length(g) - 4)) AS dup5_cov
       |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2)
       |       WHERE cnt > 1 GROUP BY 1),
       |keepd AS (SELECT d.doc_id, d.text
       |  FROM d LEFT JOIN c2 USING (doc_id) LEFT JOIN c5 USING (doc_id)
       |  WHERE coalesce(top2_cov, 0) * 5 <= d.tot
       |    AND coalesce(dup5_cov, 0) * 20 <= 3 * d.tot)
       |SELECT doc_id, $red AS red_text,
       |  CAST(len(regexp_extract_all($red, '$BpeTokenRe')) AS BIGINT) AS n_tokens
       |FROM keepd ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q80: the data-MIXTURE table — per-source document count,
  // exact-dup count (q34's non-survivors), BPE token total, and
  // English-looking count (q76's stopword-ratio predicate). The
  // rollup every pretraining run builds before choosing per-source
  // sampling weights; one fingerprint window + a tiny-key groupBy.
  private def q80(s: SparkSession, dir: String): DataFrame =
    Quality.sourceMix(docs(s, dir))

  private val q80Sql = {
    import graft.functions.TextFunctions.{BpeTokenRe, StopwordsSql, WsPlusRe}
    s"""WITH f AS (SELECT doc_id, text, source,
       |    md5(lower(trim(regexp_replace(text, '$WsPlusRe', ' ', 'g')))) AS fp
       |  FROM documents),
       |c AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canon FROM f),
       |t AS (SELECT source, doc_id, canon,
       |    CAST(len(regexp_extract_all(text, '$BpeTokenRe')) AS BIGINT) AS toks,
       |    (len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql))
       |       / len(string_split(lower(trim(text)), ' '))) >= 0.05 AS en
       |  FROM c)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN doc_id <> canon THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN en THEN 1 ELSE 0 END) AS BIGINT) AS n_en
       |FROM t GROUP BY source ORDER BY source""".stripMargin
  }

  // q85: CCNet-style LM quality scoring (Wenzek et al. 2020) — the
  // add-one-smoothed hashed-bucket bigram model fitted on the q76
  // target slice (stopword-ratio "en" predicate), every document
  // scored against it. The oracle surface is the exact-int64 per-doc
  // feature table (bigram count, Σ looked-up bigram/context bucket
  // counts — the q76/q58 house split); the `ln` tail and the CCNet
  // head/middle/tail strata are spec-gated in CleanOpsSpec.
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred =
      (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    graft.operators.LangModel.pplFeatures(docs(s, dir), enPred)
      // local presentation sort (the round-12 q87 discipline): the
      // stitch join already clusters by doc_id; a global orderBy
      // would add a range exchange AND a sampler pass that re-runs
      // the child. The driver compare re-sorts canonically anyway.
      .sortWithinPartitions(col("doc_id"))
  }

  private val q85Sql = {
    import graft.functions.TextFunctions.StopwordsSql
    val k = graft.operators.LangModel.NumBuckets
    s"""WITH t AS (SELECT doc_id, text,
       |    (len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql))
       |       / len(string_split(lower(trim(text)), ' '))) >= 0.05 AS is_t
       |  FROM documents),
       |d AS (SELECT doc_id, is_t, string_split(trim(text), ' ') AS ws FROM t),
       |occ AS (SELECT doc_id, is_t,
       |    unnest(list_transform(range(1, len(ws)),
       |      i -> CAST(('0x' || substr(md5(ws[i]), 1, 12)) AS BIGINT) % $k)) AS b1,
       |    unnest(list_transform(range(1, len(ws)),
       |      i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 12)) AS BIGINT) % $k)) AS b2
       |  FROM d),
       |m1 AS (SELECT b1 AS b, count(*) AS c FROM occ WHERE is_t GROUP BY b1),
       |m2 AS (SELECT b2 AS b, count(*) AS c FROM occ WHERE is_t GROUP BY b2),
       |j AS (SELECT o.doc_id, coalesce(m1.c, 0) AS c1, coalesce(m2.c, 0) AS c2
       |  FROM occ o LEFT JOIN m1 ON m1.b = o.b1 LEFT JOIN m2 ON m2.b = o.b2),
       |agg AS (SELECT doc_id, count(*) AS n_bi,
       |    CAST(sum(c2) AS BIGINT) AS sum_c2, CAST(sum(c1) AS BIGINT) AS sum_c1
       |  FROM j GROUP BY doc_id)
       |SELECT dd.doc_id, coalesce(a.n_bi, 0) AS n_bi,
       |  coalesce(a.sum_c2, 0) AS sum_c2, coalesce(a.sum_c1, 0) AS sum_c1
       |FROM documents dd LEFT JOIN agg a ON a.doc_id = dd.doc_id
       |ORDER BY dd.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q97: the fastText-style hashed linear quality classifier's
  // DESIGN MATRIX (CCNet §4.4 / LLaMA's Wikipedia-exemplar filter) —
  // per-doc hashed unigram+bigram bucket counts (the q76 feature
  // stream with the doc key kept) + exemplar label y (q76's
  // stopword-ratio "en" predicate as the planted exemplar class) +
  // the sklearn-"balanced" class weight (q58's formula, doc-level
  // counts). The LBFGS fit, in-row sigmoid scorer, and
  // classifierFilter selection are spec-gated (QualityClassifierSpec:
  // determinism, planted preference, scorer equivalence) — the q58
  // house split.
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred =
      (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    // Spread: the design-matrix projection is scan-side compute; on an
    // under-split layout it runs on one task (operators/Spread —
    // measured 0.92 -> 0.38 s at sf0.1; no-op on real layouts).
    Quality.classifierDesign(graft.operators.Spread(docs(s, dir)), enPred)
      // Presentation sort WITHIN partitions only (round 14, the q87
      // lesson): the design matrix is O(docs × distinct buckets) —
      // ~165M rows at sf10 — and a global orderBy's range sampler
      // re-executes the child as a separate job, then merges output
      // no consumer needs globally ordered. The matrix is a pure
      // projection since round 14 (BucketCounts in-row grouping —
      // see classifierDesign's scaladoc); a local sort appends to
      // the scan stage. The driver compare re-sorts both engines'
      // rows, so global order was never load-bearing.
      .sortWithinPartitions(col("doc_id"), col("bucket"))
  }

  private val q97Sql = {
    import graft.functions.TextFunctions.StopwordsSql
    val k = graft.operators.Dsir.NumBuckets
    s"""WITH t AS (SELECT doc_id, text,
       |    (len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql))
       |       / len(string_split(lower(trim(text)), ' '))) >= 0.05 AS is_ex
       |  FROM documents),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(CASE WHEN is_ex THEN 1 ELSE 0 END) AS DOUBLE) AS np FROM t),
       |d AS (SELECT doc_id, is_ex, string_split(trim(text), ' ') AS ws FROM t),
       |u1 AS (SELECT doc_id, is_ex, unnest(list_transform(range(1, len(ws) + 1),
       |    i -> CAST(('0x' || substr(md5(ws[i]), 1, 12)) AS BIGINT) % $k)) AS bucket FROM d),
       |u2 AS (SELECT doc_id, is_ex, unnest(list_transform(range(1, len(ws)),
       |    i -> CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 12)) AS BIGINT) % $k)) AS bucket FROM d),
       |a AS (SELECT * FROM u1 UNION ALL SELECT * FROM u2),
       |g AS (SELECT doc_id, bucket, count(*) AS n_occ, max(is_ex) AS is_ex
       |      FROM a GROUP BY doc_id, bucket)
       |SELECT doc_id, bucket, CAST(n_occ AS BIGINT) AS n_occ,
       |  CASE WHEN is_ex THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS y,
       |  CASE WHEN is_ex THEN n / (2.0 * np) ELSE n / (2.0 * (n - np)) END AS w
       |FROM g CROSS JOIN st ORDER BY doc_id, bucket""".stripMargin
  }

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q73_gopher_repetition", q73, Some(q73Sql)),
    QueryDef("q74_pii_redact", q74, Some(q74Sql)),
    QueryDef("q75_boilerplate_ngrams", q75, Some(q75Sql)),
    QueryDef("q76_dsir_model", q76, Some(q76Sql)),
    QueryDef("q78_clean_corpus", q78, Some(q78Sql)),
    QueryDef("q80_source_mix", q80, Some(q80Sql)),
    QueryDef("q85_lm_ppl", q85, Some(q85Sql)),
    QueryDef("q97_quality_classifier", q97, Some(q97Sql)))
}

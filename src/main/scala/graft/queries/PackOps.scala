package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.SequencePack

/** Corpus → training-stream prep: sequence packing and mixture
  * sampling — the two steps between a cleaned/deduped corpus and an
  * actual pretraining data loader. Neither exists in the reference
  * (its corpus fits one GPU's finetune set, finetune_prep.py just
  * writes JSONL), but both are table stakes for the 100 TB pipeline
  * this engine targets, alongside the dedup/ANN suite.
  *
  *  - q67: concat-and-chunk packing ([[SequencePack]]): the corpus in
  *    doc_id order is one token stream cut into 2048-token context
  *    windows; reported per chunk. The cumsum is the GlobalRank-style
  *    two-phase prefix sum — NO SinglePartition window.
  *  - q68: deterministic mixture sampling: per-language target weights
  *    (en 1.5x, other 0.25x) realized as floor(w) guaranteed copies
  *    plus one salted-hash-gated fractional copy — the standard
  *    up/down-sampling mix, reproducible row-for-row in SQL (same
  *    md5-bucket primitive as the train/test split).
  */
object PackOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("text"))

  val Capacity = 2048L

  private def q67(s: SparkSession, dir: String): DataFrame =
    SequencePack.withBin(
      docs(s, dir).select(col("doc_id"), bpeTokenCount(col("text")).as("tok")),
      col("tok"), Seq(col("doc_id")), Capacity)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))

  private val q67Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$BpeTokenRe')) AS BIGINT) AS tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tok,
       |    COALESCE(SUM(tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
       |  FROM t)
       |SELECT CAST(floor(bef / $Capacity) AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // per-language mixture weights × 1000 (exact integer gates):
  // en → 1.5 (one guaranteed copy + 50% of a second),
  // other → 0.25 (25% of one copy)
  private val WEn = 1500L
  private val WOther = 250L

  private def q68(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .withColumn("_st", textStats(col("text")))
      .withColumn("lang_pred",
        when(col("_st.n_stop") / col("_st.n_words") >= 0.05, "en").otherwise("other"))
      .withColumn("w", when(col("lang_pred") === "en", WEn).otherwise(WOther))
      .withColumn("n_copies",
        (col("w") / 1000).cast("bigint") +
          when(hashBucket(col("doc_id"), "mix_", 1000) < col("w") % 1000, 1L)
            .otherwise(0L))
      .filter(col("n_copies") >= 1)
    base
      .select(col("doc_id"), col("lang_pred"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  private val q68Sql =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
       |l AS (
       |  SELECT doc_id,
       |    CASE WHEN len(list_filter(ws, x -> x IN $StopwordsSql)) / len(ws) >= 0.05
       |         THEN 'en' ELSE 'other' END AS lang_pred
       |  FROM w),
       |c AS (
       |  SELECT doc_id, lang_pred,
       |    (CASE WHEN lang_pred = 'en' THEN $WEn ELSE $WOther END) // 1000
       |    + CASE WHEN CAST(('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000
       |             < (CASE WHEN lang_pred = 'en' THEN $WEn ELSE $WOther END) % 1000
       |           THEN 1 ELSE 0 END AS n_copies
       |  FROM l)
       |SELECT doc_id, lang_pred, CAST(u.copy AS BIGINT) AS copy
       |FROM c, unnest(range(1, n_copies + 1)) AS u(copy)
       |WHERE n_copies >= 1
       |ORDER BY doc_id, copy""".stripMargin

  private def q104(s: SparkSession, dir: String): DataFrame =
    SequencePack.packBinned(
      docs(s, dir).select(col("doc_id"), bpeTokenCount(col("text")).as("tok")),
      col("tok"), col("doc_id"), Capacity)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tok_sum"),
        max(col("fit")).as("fit"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))

  private val q104Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '$BpeTokenRe')) AS BIGINT) AS tok
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, tok,
       |    $Capacity // greatest(tok, 1) AS m,
       |    greatest($Capacity // greatest(tok, 1), 1) AS k,
       |    substr(md5('pack_' || CAST(doc_id AS VARCHAR)), 1, 8) AS s
       |  FROM t),
       |r AS (
       |  SELECT doc_id, tok, m, k,
       |    ROW_NUMBER() OVER (PARTITION BY m ORDER BY s, doc_id) - 1 AS r
       |  FROM b),
       |o AS (
       |  SELECT m, (count(*) + min(k) - 1) // min(k) AS nb FROM r GROUP BY m),
       |p AS (
       |  SELECT m, COALESCE(SUM(nb) OVER (ORDER BY m
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
       |  FROM o)
       |SELECT CAST(p.boff + r.r // r.k AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(r.tok) AS BIGINT) AS tok_sum,
       |  CAST(max(r.k) AS BIGINT) AS fit,
       |  min(r.doc_id) AS first_doc, max(r.doc_id) AS last_doc
       |FROM r JOIN p USING (m)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q67_pack_sequences", q67, Some(q67Sql)),
    QueryDef("q68_mixture_sample", q68, Some(q68Sql)),
    QueryDef("q104_pack_binned", q104, Some(q104Sql)))
}

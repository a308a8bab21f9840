package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.GlobalRank

/** Training-stream ORDERING operators — the two selection/ordering
  * stages between a scored corpus and the data loader that neither
  * the mixture (q68) nor the packer (q67) covers:
  *
  *  - q98 CURRICULUM ORDER: the deterministic global training order —
  *    quality-phase buckets first (high-quality docs early, the
  *    standard curriculum-learning schedule), a seeded salted-hash
  *    shuffle WITHIN each phase (reproducible "random" order, the
  *    q33 split primitive), and a dense global position. The global
  *    numbering is [[GlobalRank]] — range-partition + local sort +
  *    O(#partitions) prefix offsets — NOT a no-partition window,
  *    which would plan the SinglePartition exchange this suite
  *    gates against.
  *  - q99 TOKEN-BUDGET selection: per source, keep the
  *    highest-quality documents until a fixed token budget is
  *    reached — the "take the best N billion tokens per source"
  *    stage every mixture design starts from. A per-source window
  *    running sum decides the cut; the budget test uses the sum
  *    BEFORE the doc (a doc that straddles the boundary is kept —
  *    budgets are floors, not ceilings, in the standard recipe).
  *
  * Scale notes: q98 is one range exchange + per-partition sorts +
  * a 32-long driver collect (the SequencePack/GlobalRank bound).
  * q99's per-source running sum is inherently a per-source total
  * order — the window exchanges on source (keyed, not
  * SinglePartition) and sorts each source's docs on one task chain;
  * at 100 TB with few giant sources the honest mitigation is a
  * pre-prune on a per-source quality quantile (sketch-estimated)
  * before the exact window, which composes in front of this operator
  * unchanged — the cut itself needs the exact running sum either
  * way. Both outputs are pure functions of the corpus (no RNG state,
  * no driver-dependent ordering): rerunnable, resumable,
  * partition-count-independent.
  */
object OrderOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))

  /** q30's quality score, verbatim (the established oracle formula). */
  private def qualityScore(c: org.apache.spark.sql.Column) = {
    val st = textStats(c)
    val nChars = length(c).cast("bigint")
    val nWords = st.getField("n_words")
    val punct = st.getField("n_punct") / nChars
    val stop = st.getField("n_stop") / nWords
    lit(0.4) * when(nWords >= 20 && nWords <= 1000, 1).otherwise(0) +
      lit(0.3) * stop * 5 + lit(0.3) * (lit(1) - punct)
  }

  private val qualitySqlExpr =
    s"""(0.4 * (CASE WHEN len(string_split(trim(text), ' ')) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
       | + 0.3 * (CAST(len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql)) AS BIGINT)
       |          / CAST(len(string_split(trim(text), ' ')) AS BIGINT)) * 5
       | + 0.3 * (1 - CAST(len(regexp_extract_all(text, '$PunctRe')) AS BIGINT)
       |          / CAST(length(text) AS BIGINT)))""".stripMargin.replaceAll("\n", " ")

  // curriculum phases: fixed score thresholds (deterministic at any
  // SF — a quantile-based phasing would need a global sort/sketch and
  // make the phase of doc X depend on the rest of the corpus)
  private def phaseOf(qs: org.apache.spark.sql.Column) =
    when(qs >= 0.8, 0L).when(qs >= 0.6, 1L).when(qs >= 0.4, 2L).otherwise(3L)

  private def q98(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .withColumn("qs", qualityScore(col("text")))
      .withColumn("phase", phaseOf(col("qs")))
      .withColumn("skey",
        conv(substring(md5(concat(lit("order:"), col("doc_id").cast("string"))),
          1, 12), 16, 10).cast("long"))
      .select(col("doc_id"), col("phase"), col("skey"))
    GlobalRank.withRowNumber(base,
      Seq(col("phase"), col("skey"), col("doc_id")), "pos")
      .select(col("doc_id"), col("phase"), col("skey"), col("pos"))
      .sortWithinPartitions(col("pos"))
  }

  private val q98Sql =
    s"""WITH b AS (SELECT doc_id, $qualitySqlExpr AS qs FROM documents),
       |p AS (SELECT doc_id,
       |    CASE WHEN qs >= 0.8 THEN 0 WHEN qs >= 0.6 THEN 1
       |         WHEN qs >= 0.4 THEN 2 ELSE 3 END AS phase,
       |    CAST(('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS skey
       |  FROM b)
       |SELECT doc_id, CAST(phase AS BIGINT) AS phase, skey,
       |  CAST(row_number() OVER (ORDER BY phase, skey, doc_id) AS BIGINT) AS pos
       |FROM p ORDER BY pos""".stripMargin

  /** q99 token budget per source (tokens, not docs — the unit
    * training actually consumes). */
  val Budget = 1000L

  private def q99(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("qs").desc, col("doc_id"))
    val base = docs(s, dir)
      .withColumn("qs", qualityScore(col("text")))
      .withColumn("tok", bpeTokenCount(col("text")))
    base
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("tok")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < Budget)
      .select(col("source"), col("doc_id"), col("tok"), col("rank"),
        col("cum_before"))
      .sortWithinPartitions(col("source"), col("rank"))
  }

  private val q99Sql =
    s"""WITH b AS (SELECT source, doc_id, $qualitySqlExpr AS qs,
       |    CAST(len(regexp_extract_all(text, '$BpeTokenRe')) AS BIGINT) AS tok
       |  FROM documents),
       |r AS (SELECT source, doc_id, tok,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY qs DESC, doc_id) AS BIGINT) AS rank,
       |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY qs DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM b)
       |SELECT source, doc_id, tok, rank, cum_before
       |FROM r WHERE cum_before < $Budget ORDER BY source, rank""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q98_curriculum_order", q98, Some(q98Sql)),
    QueryDef("q99_token_budget", q99, Some(q99Sql)))
}

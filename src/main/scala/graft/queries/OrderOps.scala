package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

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
  * Round 13: both queries are thin wrappers over the PARAMETERIZED
  * operators in [[graft.operators.Curriculum]] (callable like
  * q67/q68/q95's), and q99 runs the production path — the
  * sketch-quantile per-source PRE-PRUNE in front of the exact
  * running-sum window (a giant source's window input is bounded near
  * the budget instead of the source; superset proof + spec-pinned
  * byte-identity with the exact form in Curriculum). Both outputs
  * are pure functions of the corpus (no RNG state, no
  * driver-dependent ordering): rerunnable, resumable,
  * partition-count-independent.
  */
object OrderOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))

  private val qualitySqlExpr =
    s"""(0.4 * (CASE WHEN len(string_split(trim(text), ' ')) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
       | + 0.3 * (CAST(len(list_filter(string_split(lower(trim(text)), ' '), x -> x IN $StopwordsSql)) AS BIGINT)
       |          / CAST(len(string_split(trim(text), ' ')) AS BIGINT)) * 5
       | + 0.3 * (1 - CAST(len(regexp_extract_all(text, '$PunctRe')) AS BIGINT)
       |          / CAST(length(text) AS BIGINT)))""".stripMargin.replaceAll("\n", " ")

  private def q98(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curriculum.curriculumOrder(
      docs(s, dir), qualityScore(col("text")))
      .sortWithinPartitions(col("pos"))

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

  // the PRODUCTION path — sketch pre-prune ON, so the oracle gates
  // the pruned shape's byte-identity with the exact form every round
  private def q99(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curriculum.tokenBudget(
      docs(s, dir), Budget,
      qualityScore(col("text")), bpeTokenCount(col("text")))
      .sortWithinPartitions(col("source"), col("rank"))

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

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._
import graft.operators.{FinetunePrep, NearestEvent, TrainTestSplit}

/** Bonus surface beyond SURVEY §2's 45 rows: the reference pipeline's
  * FINAL output — prompt/completion finetuning pairs assembled from
  * the distilled triples, with the deterministic split attached
  * (reference: finetune_prep.py:30-35,172-176). A reference user's
  * end-to-end run lands here.
  */
object FinetuneOps extends QueryModule {

  // q50: distill chain → per-command (prompt, completion, split).
  // Utterances are represented portably as "u<user>#<msg_id>" (no
  // float formatting in strings) and joined chronologically.
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val assoc = NearestEvent.assoc(norm(Tables.events(s, dir)),
        "instance_id", "ts_us", "event_id", sourcePred = isMsg, targetPred = isCmd)
      .filter(col("value") >= 5)
    val utt = concat(lit("u"), col("user_id").cast("string"),
      lit("#"), col("event_id").cast("string"))
    TrainTestSplit(
      FinetunePrep.pairs(assoc, utt, col("ts_us"), col("event_id"),
        coKeys = Seq(col("instance_id"))),
      idCol = "cmd_id")
      .select(col("cmd_id"), col("prompt"), col("completion"), col("split"))
      .orderBy(col("cmd_id"))
  }

  private val q50Sql =
    s"""WITH $NormSql, $NearestAssocSql,
       |p AS (SELECT cmd_id,
       |  COALESCE(string_agg(CASE WHEN side='before' THEN 'u' || CAST(user_id AS VARCHAR) || '#' || CAST(msg_id AS VARCHAR) END, ' | ' ORDER BY ts_us, msg_id), '') AS prompt,
       |  COALESCE(string_agg(CASE WHEN side='after' THEN 'u' || CAST(user_id AS VARCHAR) || '#' || CAST(msg_id AS VARCHAR) END, ' | ' ORDER BY ts_us, msg_id), '') AS completion
       |FROM assoc WHERE value >= 5 GROUP BY cmd_id)
       |SELECT cmd_id, prompt, completion,
       |  CASE WHEN CAST(('0x' || substr(md5('split' || CAST(cmd_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 THEN 'train'
       |       WHEN CAST(('0x' || substr(md5('split' || CAST(cmd_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 = 8 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM p WHERE length(prompt) > 0 AND length(completion) > 0
       |ORDER BY cmd_id""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q50_finetune_pairs", q50, Some(q50Sql)))
}

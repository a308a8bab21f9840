package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Finetuning-pair assembly (reference: finetune_prep.py:30-35
  * _prompt_and_completion — each distilled triple becomes a
  * {prompt, completion} record, rows with an empty side dropped; plus
  * the deterministic split of finetune_prep.py:172-176, re-expressed
  * as a salted-hash bucket).
  *
  * Shape: one keyed aggregation over the associated utterances —
  * ordered string concatenation is done with
  * array_sort(collect_list(struct(orderKeys..., text))) → the sort
  * happens per group on bounded session-sized data, never a global
  * sort, and the result is deterministic under any partitioning.
  */
object FinetunePrep {

  /** Assembles per-command prompt/completion pairs from nearest-assoc
    * rows (columns: cmd_id, side, plus caller-provided utterance and
    * order columns). Prompt = chronological "before" utterances;
    * completion = chronological "after" utterances; pairs with an
    * empty side are dropped (reference: finetune_prep.py:33-34).
    *
    * `coKeys`: columns that functionally determine no finer grouping
    * than cmd_id (each cmd_id lives inside one coKey partition, e.g.
    * the instance the command belongs to). They ride along in the
    * grouping key solely so an upstream HashPartitioning on them
    * satisfies the aggregation's distribution — no re-shuffle on
    * cmd_id — and are then dropped. */
  def pairs(assoc: DataFrame, utterance: Column, orderKey1: Column,
            orderKey2: Column, sep: String = " | ",
            coKeys: Seq[Column] = Nil): DataFrame = {
    def joined(listCol: String): Column =
      concat_ws(sep, expr(s"transform(array_sort($listCol), s -> s.utt)"))
    assoc
      .withColumn("o1", orderKey1)
      .withColumn("o2", orderKey2)
      .withColumn("utt", utterance)
      .groupBy(coKeys :+ col("cmd_id"): _*)
      .agg(
        collect_list(when(col("side") === "before",
          struct(col("o1"), col("o2"), col("utt")))).as("before_list"),
        collect_list(when(col("side") === "after",
          struct(col("o1"), col("o2"), col("utt")))).as("after_list"))
      .withColumn("prompt", joined("before_list"))
      .withColumn("completion", joined("after_list"))
      .filter(length(col("prompt")) > 0 && length(col("completion")) > 0)
      .select(col("cmd_id"), col("prompt"), col("completion"))
  }
}

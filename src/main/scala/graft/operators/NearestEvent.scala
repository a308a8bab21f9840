package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of-both-directions nearest-event association (the reference's
  * distill1 nearest-automation-run assignment — reference:
  * distill1_time_group.py:48-68: each utterance attaches to the
  * chronologically nearest automation run by |ts delta|, earlier run
  * winning ties → side "before").
  *
  * Spark-first shape: instead of a time-range self-join (quadratic per
  * key), ONE shuffle on the partition key and two ignore-nulls window
  * scans give every row its previous and next target event; the
  * nearest pick is then a per-row expression inside whole-stage
  * codegen. Scales linearly and shares its shuffle with any other
  * window keyed the same way.
  */
object NearestEvent {

  /** Adds prev_ts/prev_id/next_ts/next_id of the nearest rows matching
    * `targetPred` (strictly before / strictly after in
    * (tsCol, tieCol) order) within each partition. */
  def withPrevNext(ev: DataFrame, partitionCol: String, tsCol: String,
                   tieCol: String, targetPred: Column): DataFrame = {
    val base = Window.partitionBy(partitionCol).orderBy(col(tsCol), col(tieCol))
    val wp = base.rowsBetween(Window.unboundedPreceding, -1)
    val wn = base.rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("prev_ts", last(when(targetPred, col(tsCol)), ignoreNulls = true).over(wp))
      .withColumn("prev_id", last(when(targetPred, col(tieCol)), ignoreNulls = true).over(wp))
      .withColumn("next_ts", first(when(targetPred, col(tsCol)), ignoreNulls = true).over(wn))
      .withColumn("next_id", first(when(targetPred, col(tieCol)), ignoreNulls = true).over(wn))
  }

  /** Nearest-association for rows matching `sourcePred`: picks the
    * closer of prev/next target (ties → before), emitting
    * (msg_id, cmd_id, side, delta_us) plus passthrough columns. */
  def assoc(ev: DataFrame, partitionCol: String, tsCol: String,
            tieCol: String, sourcePred: Column, targetPred: Column): DataFrame = {
    val df = withPrevNext(ev, partitionCol, tsCol, tieCol, targetPred)
    val before = col("next_ts").isNull ||
      (col("prev_ts").isNotNull &&
        col(tsCol) - col("prev_ts") <= col("next_ts") - col(tsCol))
    df.filter(sourcePred && (col("prev_ts").isNotNull || col("next_ts").isNotNull))
      .withColumn("cmd_id", when(before, col("prev_id")).otherwise(col("next_id")))
      .withColumn("side", when(before, lit("before")).otherwise(lit("after")))
      .withColumn("delta_us",
        when(before, col(tsCol) - col("prev_ts")).otherwise(col("next_ts") - col(tsCol)))
  }
}

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
    * (tsCol, tieCol) order) within each partition.
    *
    * ONE ascending sort serves both directions (round 19; guide §2.4
    * — establish the ordering once): the "prev" side is a growing
    * (unbounded-preceding) frame, which Spark evaluates incrementally
    * (O(n) per partition), and the "next" side is
    * `lead(…, 1, ignoreNulls = true)` — the first non-null value
    * STRICTLY AFTER the current row, exactly what the former
    * descending-sorted growing frame computed, evaluated by the
    * offset frame's forward-only cursor (O(n), no second sort).
    * UNBOUNDED FOLLOWING aggregate frames stay banned: Spark
    * recomputes those from scratch per row (O(n²) per partition).
    * All four columns land in ONE Window operator (same partition and
    * order spec; WindowExec evaluates multiple frames per operator),
    * so the event stream is shuffled once and sorted once.
    */
  def withPrevNext(ev: DataFrame, partitionCol: String, tsCol: String,
                   tieCol: String, targetPred: Column): DataFrame = {
    val ascOrd = Window.partitionBy(partitionCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val asc = ascOrd.rowsBetween(Window.unboundedPreceding, -1)
    // One select, not chained withColumn: same-spec window functions
    // land in ONE Window operator (chained withColumn interleaves
    // Projects that block CollapseWindow).
    ev.select(
      col("*"),
      last(when(targetPred, col(tsCol)), ignoreNulls = true).over(asc).as("prev_ts"),
      last(when(targetPred, col(tieCol)), ignoreNulls = true).over(asc).as("prev_id"),
      lead(when(targetPred, col(tsCol)), 1, null, ignoreNulls = true)
        .over(ascOrd).as("next_ts"),
      lead(when(targetPred, col(tieCol)), 1, null, ignoreNulls = true)
        .over(ascOrd).as("next_id"))
  }

  /** Nearest-association for rows matching `sourcePred`: picks the
    * closer of prev/next target (ties → before), emitting
    * (msg_id, cmd_id, side, delta_us) plus passthrough columns. */
  def assoc(ev: DataFrame, partitionCol: String, tsCol: String,
            tieCol: String, sourcePred: Column, targetPred: Column): DataFrame = {
    // Rows that are neither source nor target cannot influence the
    // result: they are never emitted (source filter below) and never
    // feed prev/next (the ignore-nulls window columns are null for
    // non-targets). Dropping them BEFORE the window pushes the filter
    // under the hash exchange and both window sorts — on the event
    // mix here that is ~40% less shuffled/sorted data, and the
    // predicate reaches the parquet scan.
    val df = withPrevNext(ev.filter(sourcePred || targetPred),
      partitionCol, tsCol, tieCol, targetPred)
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

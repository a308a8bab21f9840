package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, the latest right row at or
  * before it in event time, per key — the reference's "state as of
  * this command" lookup (reference: distill4_normalize.py extracts the
  * combat state preceding each command; distill1_time_group.py:48-68
  * associates streams by time the same way) generalized to any pair of
  * DataFrames.
  *
  * Spark-first shape: NOT a range self-join (quadratic per key) and
  * NOT an inequality join (Spark would execute that as broadcast
  * nested-loop). The two inputs are union'd with a side tag, shuffled
  * ONCE on the key, and a growing-frame ignore-nulls window hands each
  * left row the last right row at or before it — one sort per
  * partition, linear scan, no join operator at all. This is the
  * canonical distributed as-of shape (the trades/quotes pattern): at
  * 100 TB each side is shuffled exactly once and nothing is ever
  * broadcast or replicated.
  */
object AsOfJoin {

  /** Left rows plus `asof_<c>` for each requested right column (null
    * when no right row is at or before the left row).
    *
    * Tie rules (deterministic): at equal timestamps the right row
    * counts (at-OR-before); among right rows sharing a timestamp the
    * greatest `tieCol` wins. Right values travel under `_rv_`-prefixed
    * temporaries, so overlapping column names between left and right
    * are fine.
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, tieCol: String,
                     rightCols: Seq[String]): DataFrame = {
    // ONE struct per right row (never null on right rows, null on
    // left rows): last(ignoreNulls) then selects the whole as-of ROW
    // atomically — per-column lasts would mix fields across right
    // rows whenever the latest row carries a null in one column
    val rightSlim = right.select(
      col(keyCol), col(tsCol), col(tieCol), lit(1).as("_r"),
      struct(rightCols.map(c => col(c).as(c)): _*).as("_rv"))
    val u = left.withColumn("_r", lit(0))
      .unionByName(rightSlim, allowMissingColumns = true)
    // right rows (_r=1) sort BEFORE left rows at the same timestamp,
    // so the growing frame ending at the previous row sees them
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_r").desc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRow = u.withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
    rightCols.foldLeft(withRow) { (df, c) =>
        df.withColumn(s"asof_$c", col("_asof").getField(c))
      }
      .filter(col("_r") === 0)
      .drop("_r", "_rv", "_asof")
  }
}

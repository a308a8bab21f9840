package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (the batch analog of the reference's
  * Kinesis instance grouping — reference: dataset/utils.py:16-50 reads
  * a combat's event stream as one unit; here sessions are derived from
  * inactivity gaps instead of file layout).
  *
  * Scale design: ONE shuffle on the partition key, then a single sort
  * + two window passes over the same (partition, order) — never a
  * self-join, never driver-side state. At 100 TB this hash-partitions
  * by the high-cardinality key and each executor sessionizes its
  * partitions independently.
  */
object Sessionize {

  /** Adds `session_id` (1-based, per partition key) to `df`.
    *
    * @param partitionCol high-cardinality session scope (e.g. user_id)
    * @param tsCol        exact integer timestamp column (µs)
    * @param tieCol       unique tie-break column for deterministic order
    * @param gapUs        inactivity gap that starts a new session
    */
  def apply(df: DataFrame, partitionCol: String, tsCol: String,
            tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(col(tsCol), col(tieCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(w)
    df.withColumn("brk",
        when(prevTs.isNull || col(tsCol) - prevTs > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(wRun))
      .drop("brk")
  }
}

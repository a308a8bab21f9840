package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the standard pretraining data
  * prep step (concatenate the corpus into one token stream, cut it
  * into fixed `capacity`-token context windows): each document is
  * assigned to the chunk where its FIRST token lands,
  * `bin = floor(tokens_before / capacity)` over a TOTAL document
  * order. Deterministic, exactly reproducible in SQL (one window
  * cumsum), and — unlike greedy first-fit bin packing, whose
  * bin-reset recurrence is inherently sequential — expressible as a
  * prefix sum, which is why production packers chunk the concatenated
  * stream rather than bin-pack.
  *
  * Scale shape (the [[GlobalRank]] discipline): a bare
  * `Window.orderBy(...)` cumsum plans a SinglePartition exchange —
  * every row through one task. Here:
  *
  *  1. range-repartition + sort on the order key (the same shuffle a
  *     protocol ORDER BY would pay anyway);
  *  2. per-partition running sums via a window PARTITIONED on the
  *     physical partition id (no cross-partition data movement);
  *  3. per-partition token totals — O(#partitions) longs — collected
  *     to the driver, prefix-summed, and rejoined as a literal-map
  *     offset lookup, exactly like RDD zipWithIndex.
  *
  * The input is pinned so the totals job and the final plan share one
  * computation of the upstream pipeline.
  */
object SequencePack {

  /** Adds `out` = 0-based chunk id of each row in `sortCols` total
    * order, packing `tokenCol` tokens per `capacity`-token chunk.
    * `sortCols` must be tie-free (callers sort on a key). */
  def withBin(df: DataFrame, tokenCol: Column, sortCols: Seq[Column],
              capacity: Long, out: String = "bin"): DataFrame = {
    require(capacity > 0, "pack: capacity must be positive")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__tok", tokenCol.cast("long"))
      .withColumn("__pid", spark_partition_id())
      .transform(Pin(_, eager = true)) // one upstream pass feeds totals + result
    val totals = parted.groupBy(col("__pid")).agg(sum(col("__tok")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.keys.toSeq.sorted.map { p =>
        val o = p -> acc; acc += totals(p); o
      }.toMap
    }
    val lookup =
      if (offsets.isEmpty) lit(0L) else element_at(typedlit(offsets), col("__pid"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    parted
      .withColumn("__before", coalesce(sum(col("__tok")).over(wLocal), lit(0L)) + lookup)
      .withColumn(out, floor(col("__before") / capacity).cast("bigint"))
      .drop("__tok", "__pid", "__before")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range (interval) self-join: all pairs of same-key rows
  * within a time width of each other, found by an EQUI-join on
  * (key, time-bin) instead of an inequality join (which Spark executes
  * as a nested-loop — quadratic per key and a non-starter at scale).
  *
  * Each row lands in one bin of size `width`; the left side explodes
  * to bin−1/bin/bin+1 and hash-joins the right side's single bin.
  * Any pair within `width` differs by at most one bin, so it is found;
  * each pair matches exactly once (the partner's single bin appears
  * exactly once in the exploded candidate set). Shuffle volume is 3×
  * the input — linear, AQE-balanced — versus the unbounded blowup of
  * a per-key cross join.
  */
object RangeJoin {

  /** Pairs (id_a < id_b, same key) with |ts_a − ts_b| ≤ width.
    * Output columns: keyCol, ts_a, id_a, ts_b, id_b. */
  def pairsWithin(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val a = df.select(col(keyCol), col(tsCol).as("ts_a"), col(tieCol).as("id_a"))
      .withColumn("_bin",
        explode(array((-1 to 1).map(d => (col("ts_a") / width).cast("long") + d): _*)))
    val b = df.select(col(keyCol), col(tsCol).as("ts_b"), col(tieCol).as("id_b"))
      .withColumn("_bin", (col("ts_b") / width).cast("long"))
    // SHUFFLE_HASH pin: both sides are the CORPUS — broadcasting either
    // is wrong at any real scale, but the static planner estimates the
    // exploded side off the parquet file size (compressed, sorted data
    // deflates it further) and happily broadcasts 3x the table
    // (measured: the BHJ build cost ~1 s of q54's 2 s at sf1). A
    // shuffle hash join on (key, bin) is the scale shape: linear,
    // partition-local builds over near-uniform bounded bins, no sort.
    a.join(b.hint("shuffle_hash"), Seq(keyCol, "_bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("ts_a") - col("ts_b")) <= width)
      .drop("_bin")
  }
}

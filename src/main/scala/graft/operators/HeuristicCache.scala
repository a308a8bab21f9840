package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checksum-gated incremental result store — the reference's
  * heuristic-results cache (reference: dataset/dataset.py:24-60 loads
  * per-heuristic CSVs and silently discards any whose recorded
  * checksum no longer matches the dataset; heuristic_worker.py stamps
  * results with dataset/utils.py:65-68's dirhash).
  *
  * Spark-native shape: the gate is a CONTENT checksum (one md5 per
  * canonical row, bit_xor-folded with the row count — commutative, so
  * partitioning/row order can't flip it), computed in one scan + a
  * 1-row aggregate; results persist as parquet next to a `_checksum`
  * marker. A stale marker means recompute-and-overwrite; a matching
  * one means the expensive pipeline is skipped entirely. At 100 TB
  * the checksum pass is a single cheap column scan versus re-running
  * every heuristic.
  */
object HeuristicCache {

  /** Order-independent content checksum of `df` over all columns
    * (count ^ bit_xor of per-row md5). Driver receives one row. */
  def checksumOf(df: DataFrame): String = {
    val canon = md5(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*))
    val row = df
      .select(conv(substring(canon, 1, 15), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .collect().head
    s"${row.getLong(0)}-${if (row.isNullAt(1)) 0L else row.getLong(1)}"
  }

  /** Returns `compute(input)`'s result from `cacheDir` when the
    * stored checksum matches `input`'s current content; otherwise
    * recomputes, overwrites the cache, and stamps the new checksum. */
  def computeOrLoad(input: DataFrame, cacheDir: String)
                   (compute: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    val sum = checksumOf(input)
    val marker = Paths.get(cacheDir, "_checksum")
    val data = s"$cacheDir/data"
    val fresh = Files.exists(marker) && Files.readString(marker).trim == sum &&
      Files.exists(Paths.get(data))
    if (!fresh) {
      compute(input).write.mode("overwrite").parquet(data)
      Files.createDirectories(Paths.get(cacheDir))
      Files.writeString(marker, sum)
    }
    spark.read.parquet(data)
  }
}

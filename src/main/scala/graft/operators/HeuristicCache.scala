package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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
    val canon = md5(concat_ws("|",
      df.columns.toIndexedSeq.map(c => col(c).cast("string")): _*))
    val row = df
      .select(conv(substring(canon, 1, 15), 16, 10).cast("long").as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .collect().head
    s"${row.getLong(0)}-${if (row.isNullAt(1)) 0L else row.getLong(1)}"
  }

  /** Returns `compute(input)`'s result from `cacheDir` when the
    * stored checksum matches `input`'s current content; otherwise
    * recomputes, overwrites the cache, and stamps the new checksum.
    *
    * All marker I/O goes through the Hadoop FileSystem API resolved
    * from `cacheDir`'s scheme — the cache works identically on
    * local fs, HDFS, or s3a://; a java.nio marker would silently
    * never match on an object store and recompute forever. */
  def computeOrLoad(input: DataFrame, cacheDir: String)
                   (compute: DataFrame => DataFrame): DataFrame = {
    val spark = input.sparkSession
    val sum = checksumOf(input)
    val dir = new Path(cacheDir)
    val fs: FileSystem =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, "_checksum")
    val data = new Path(dir, "data")
    val fresh = fs.exists(marker) && readUtf8(fs, marker).trim == sum &&
      fs.exists(data)
    if (!fresh) {
      // Invalidate BEFORE touching the data: a crash mid-overwrite must
      // leave a missing marker (next run recomputes), never the old
      // marker next to new/partial data (false-fresh hit on an input
      // that reverts to the old checksum).
      if (fs.exists(marker)) fs.delete(marker, false)
      compute(input).write.mode("overwrite").parquet(data.toString)
      fs.mkdirs(dir)
      writeUtf8(fs, marker, sum)
    }
    spark.read.parquet(data.toString)
  }

  private def readUtf8(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0)
        .foreach(n => out.write(buf, 0, n))
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeUtf8(fs: FileSystem, p: Path, s: String): Unit = {
    // overwrite=true: a torn previous marker must not wedge the cache
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}

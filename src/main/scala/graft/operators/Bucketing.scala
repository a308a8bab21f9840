package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing: pay a table's shuffle ONCE at write time,
  * then join/aggregate on the bucket key with zero exchanges forever
  * after. At 100 TB this is the difference between re-shuffling the
  * fact table on every pipeline run and a shuffle-free sort-merge join
  * against any same-bucketed dimension — the batch analog of the
  * reference's per-instance file layout (reference: dataset/utils.py
  * combat_dir_iterator reads one instance's events co-located in one
  * file; bucketing by instance key reproduces that locality inside
  * Spark's catalog).
  */
object Bucketing {

  /** Persist `df` as a parquet table bucketed AND sorted on `keyCol`.
    * Joins between tables written with the same bucket count on their
    * bucket keys plan with no ShuffleExchange on either side (see
    * ScaleJoinSpec for the plan assertion). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCol: String, buckets: Int): Unit =
    writeBucketed(df, table, path, Seq(keyCol), buckets)

  /** Multi-column variant: bucketed + sorted on `keyCols` (the table's
    * scan reports HashPartitioning(keyCols, buckets), so a join whose
    * keys contain the bucket columns plans with NO exchange on this
    * side — the probe side alone shuffles, with `buckets` partitions).
    * Used by the persisted incremental-capstone indexes (rawFp on fp,
    * deconBands on (b, bkey) — PipelineOps.persistBaseIndexes). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keyCols: Seq[String], buckets: Int): Unit = {
    require(keyCols.nonEmpty, "at least one bucket column")
    // repartition on the bucket keys FIRST: Spark's bucket id is
    // pmod(murmur3(keys), buckets) — exactly HashPartitioning's
    // partition id — so after this shuffle every task holds exactly
    // one bucket and the writer emits ONE file per bucket. Without it
    // each task writes a file for every bucket present in it: up to
    // tasks × buckets files (measured: a 4M-row compaction emitted
    // 809 band files instead of 32), which taxes every later scan
    // with file-open overhead and defeats compaction's purpose.
    df.repartition(buckets, keyCols.map(df.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }
}

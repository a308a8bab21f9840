package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch source for Kinesis-Firehose-layout event logs: a root
  * directory of nested `yyyy/MM/dd/HH/` folders holding gzipped JSONL
  * part files (reference: dataset/utils.py:16-50 — read_gzipped_file +
  * combat_dir_iterator walk exactly this layout one file at a time;
  * here the whole tree is a single distributed scan).
  *
  * Spark-first: .gz decompression is native to the text/json readers,
  * the explicit schema avoids a schema-inference pre-pass over 100 TB,
  * and recursiveFileLookup walks the hour tree without globbing. Each
  * gzip member is one task (gzip is unsplittable — at scale the
  * upstream writer sizes files to ~100-500 MB so tasks stay balanced).
  */
object EventLogSource {

  /** Wire schema of one JSONL event record. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),         // ISO-8601 instant
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Reads every .jsonl.gz under `root` (any depth). Malformed lines
    * land in `_corrupt_record` instead of failing the scan. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("recursiveFileLookup", "true")
      // matches both firehose-style *.jsonl.gz and this module's own
      // sink output (Spark names gzip JSON parts part-*.json.gz)
      .option("pathGlobFilter", "*.json*.gz")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(root)

  /** Streaming counterpart of [[read]]: tails the firehose tree as a
    * file stream — the Spark-native stand-in for the reference's
    * Kinesis consumer (the Firehose delivery stream lands exactly
    * these files; tailing the landing tree gives the same event flow
    * without a Kinesis SDK). New .gz files are picked up per
    * micro-batch, `maxFilesPerTrigger` bounds batch size, and the
    * explicit schema avoids an inference pass. Compose with
    * graft.streaming.SessionStream for stateful processing. */
  def readStream(spark: SparkSession, root: String,
                 maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json*.gz")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(root)

  /** Shard-aware, rate-limited streaming read — the Kinesis-consumer
    * stand-in over a sharded landing tree (no network in this sandbox;
    * the reference itself processes Firehose *dumps* of the stream,
    * dataset/utils.py:16-50). Layout contract, mirroring what a
    * Firehose delivery stream partitioned by shard writes:
    *
    * {{{ root/shardId=NNN/.../seq-<k>.jsonl.gz }}}
    *
    * Kinesis semantics reproduced here:
    *  - `shard_id` / `shard_seq` columns (from the path) are the
    *    (shardId, sequenceNumber) pair: `shard_seq` totally orders
    *    each shard's records.
    *  - Delivery is oldest-file-first (`latestFirst=false`), so the
    *    per-shard sequence is nondecreasing ACROSS micro-batches —
    *    with `maxFilesPerTrigger = 1` delivery order IS shard order;
    *    at higher rates a micro-batch may interleave files, and a
    *    consumer needing strict order sorts the batch by
    *    (shard_id, shard_seq), exactly as a KCL worker processes its
    *    per-shard record batches.
    *  - The checkpointed shard iterator is the file-source commit log:
    *    restarting a query on the same checkpoint resumes AFTER the
    *    last processed file per shard, never re-emitting (asserted by
    *    SourceSpec's replay test).
    *  - `maxFilesPerTrigger` (+ optional `maxBytesPerTrigger`) is the
    *    consumer's rate limit — the stand-in for Kinesis's
    *    2 MB/s/shard read cap; it bounds every micro-batch so an
    *    hours-deep backlog drains at a controlled pace instead of as
    *    one giant batch.
    */
  def readShardedStream(spark: SparkSession, root: String,
                        maxFilesPerTrigger: Int = 64,
                        maxBytesPerTrigger: Option[String] = None): DataFrame = {
    val reader = spark.readStream
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.json*.gz")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("latestFirst", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    maxBytesPerTrigger.foreach(b => reader.option("maxBytesPerTrigger", b))
    reader.json(root)
      .withColumn("shard_id",
        regexp_extract(input_file_name(), "shardId=(\\d+)", 1).cast("int"))
      .withColumn("shard_seq",
        regexp_extract(input_file_name(), "seq-(\\d+)", 1).cast("long"))
  }

  /** Gzipped-JSONL sink — the reference's stage-output format (every
    * distill stage writes .jsonl.gz; reference: distill1_time_group.py
    * et al. write gzip JSON lines). One file per partition; callers
    * control parallelism/file count via the DataFrame's partitioning
    * (never coalesce(1) a 100 TB result). */
  def writeJsonlGz(df: DataFrame, root: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(root)

  /** Same records normalized to the engine's event layout: exact
    * epoch-µs bigint timestamps, corrupt rows dropped. */
  def readNormalized(spark: SparkSession, root: String): DataFrame =
    read(spark, root)
      .filter(col("_corrupt_record").isNull && col("event_id").isNotNull)
      .select(
        col("event_id"),
        unix_micros(to_timestamp(col("ts"))).as("ts_us"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props"))
}

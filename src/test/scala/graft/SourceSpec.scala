package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.EventLogSource

/** Drives the Firehose-layout gzipped-JSONL source end-to-end against
  * a generated yyyy/MM/dd/HH tree. */
class SourceSpec extends SparkTestBase {

  private def writeGz(path: Path, lines: Seq[String]): Unit = {
    Files.createDirectories(path.getParent)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(path)), "UTF-8"))
    try lines.foreach { l => w.write(l); w.newLine() }
    finally w.close()
  }

  private def rec(id: Long, ts: String, user: Long, et: String, v: Double): String =
    s"""{"event_id":$id,"ts":"$ts","user_id":$user,"event_type":"$et","value":$v,"props":"{\\"k\\": 1}"}"""

  test("reads nested firehose tree, normalizes to epoch-us, isolates corrupt lines") {
    val root = Files.createTempDirectory("firehose")
    writeGz(root.resolve("2024/01/01/00/part-0.jsonl.gz"), Seq(
      rec(1, "2024-01-01T00:00:01.500Z", 10, "message", 7.5),
      rec(2, "2024-01-01T00:10:00.000Z", 10, "command", 1.0),
      "this is not json at all"))
    writeGz(root.resolve("2024/01/01/01/part-0.jsonl.gz"), Seq(
      rec(3, "2024-01-01T01:00:00.250Z", 11, "message", 3.0)))
    // non-matching file name must be ignored by the glob
    Files.writeString(root.resolve("2024/01/01/00/ignore.txt"), "junk")

    // cache: Spark refuses filtering solely on _corrupt_record of an
    // uncached raw-file scan (SPARK-21610 guard)
    val raw = EventLogSource.read(spark, root.toString).cache()
    assert(raw.count() == 4)
    assert(raw.filter(col("_corrupt_record").isNotNull).count() == 1)

    val norm = EventLogSource.readNormalized(spark, root.toString)
    val rows = norm.orderBy("event_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // 2024-01-01T00:00:01.500Z == 1704067201500000 µs
    assert(rows(0).getLong(1) == 1704067201500000L)
    assert(rows(2).getLong(1) == 1704070800250000L)
    assert(norm.columns.toSeq ==
      Seq("event_id", "ts_us", "user_id", "event_type", "value", "props"))
  }

  test("streaming source tails the firehose tree and picks up new files") {
    val root = Files.createTempDirectory("firehose_stream")
    writeGz(root.resolve("2024/01/01/00/part-0.jsonl.gz"), Seq(
      rec(1, "2024-01-01T00:00:01Z", 10, "message", 1.0),
      rec(2, "2024-01-01T00:00:02Z", 10, "command", 2.0)))
    val query = EventLogSource.readStream(spark, root.toString)
      .filter(col("_corrupt_record").isNull)
      .select("event_id", "event_type")
      .writeStream.format("memory").queryName("firehose_out").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("firehose_out").count() == 2)
      // a NEW hour-partition file lands mid-stream -> next micro-batch
      writeGz(root.resolve("2024/01/01/01/part-0.jsonl.gz"), Seq(
        rec(3, "2024-01-01T01:00:00Z", 11, "message", 3.0)))
      query.processAllAvailable()
      val ids = spark.table("firehose_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("sharded stream: per-shard order, rate limit, and replay-free checkpoint restart") {
    import scala.collection.mutable
    val root = Files.createTempDirectory("kinesis_standin")
    val ckpt = Files.createTempDirectory("kinesis_ckpt").toString
    // two shards, two seq files each; mod times force the global
    // oldest-first pickup to interleave shards while preserving each
    // shard's internal order (the Kinesis guarantee under test)
    def land(shard: Int, seq: Int, ids: Seq[Long], mtMillis: Long): Unit = {
      val p = root.resolve(f"shardId=$shard%03d/2024/01/01/00/seq-$seq%06d.jsonl.gz")
      writeGz(p, ids.map(i => rec(i, "2024-01-01T00:00:01Z", shard, "message", i.toDouble)))
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(mtMillis))
    }
    land(0, 0, Seq(1L, 2L), 1000000)
    land(1, 0, Seq(10L), 2000000)
    land(0, 1, Seq(3L), 3000000)
    land(1, 1, Seq(11L, 12L), 4000000)

    val delivered = mutable.ArrayBuffer.empty[(Long, Int, Long, Long)] // (batch, shard, seq, id)
    def start(buf: mutable.ArrayBuffer[(Long, Int, Long, Long)]) =
      graft.sources.EventLogSource.readShardedStream(spark, root.toString, maxFilesPerTrigger = 1)
        .filter(col("_corrupt_record").isNull)
        .select("shard_id", "shard_seq", "event_id")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val rows = df.collect().map(r => (batchId, r.getInt(0), r.getLong(1), r.getLong(2)))
          buf.synchronized { buf ++= rows }
          ()
        }.start()

    val q1 = start(delivered)
    try q1.processAllAvailable() finally q1.stop()
    val got = delivered.sortBy(_._1)
    assert(got.map(_._4).sorted == Seq(1L, 2L, 3L, 10L, 11L, 12L))
    // rate limit: maxFilesPerTrigger=1 -> one file (one shard_seq) per batch
    assert(got.groupBy(_._1).forall { case (_, rows) =>
      rows.map(r => (r._2, r._3)).distinct.size == 1 }, s"batch mixed files: $got")
    // per-shard order: within each shard, seq nondecreasing in batch order
    for ((_, rows) <- got.groupBy(_._2)) {
      val seqs = rows.sortBy(_._1).map(_._3)
      assert(seqs == seqs.sorted, s"shard order violated: $got")
    }

    // checkpointed shard-iterator restart: old files never re-emitted,
    // new landings resume each shard AFTER its processed prefix
    land(0, 2, Seq(4L), 5000000)
    land(1, 2, Seq(13L), 6000000)
    val delivered2 = mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val q2 = start(delivered2)
    try q2.processAllAvailable() finally q2.stop()
    assert(delivered2.map(_._4).sorted == Seq(4L, 13L),
      s"restart must replay nothing and pick up only new files: $delivered2")
  }

  test("heuristic cache recomputes only when the dataset content changes") {
    import graft.operators.HeuristicCache
    import spark.implicits._
    val dir = Files.createTempDirectory("hcache").toString
    val v1 = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "k", "v")
    var computes = 0
    def profile(df: org.apache.spark.sql.DataFrame) = {
      computes += 1
      df.groupBy(col("k")).agg(sum(col("v")).as("sum_v"))
    }
    val r1 = HeuristicCache.computeOrLoad(v1, dir)(profile)
    assert(r1.count() == 2 && computes == 1)
    // identical content (different row order) -> cache hit, no recompute
    val v1b = Seq((2L, "b", 3.0), (1L, "a", 2.0)).toDF("id", "k", "v")
    val r2 = HeuristicCache.computeOrLoad(v1b, dir)(profile)
    assert(r2.count() == 2 && computes == 1, "cache must hit on identical content")
    // changed content -> recompute
    val v2 = Seq((1L, "a", 99.0), (2L, "b", 3.0)).toDF("id", "k", "v")
    val r3 = HeuristicCache.computeOrLoad(v2, dir)(profile)
    assert(computes == 2, "cache must miss on changed content")
    assert(r3.filter(col("k") === "a").collect().head.getDouble(1) == 99.0)
  }

  test("heuristic cache deletes the marker BEFORE recompute: a crash mid-recompute never serves stale") {
    // Regression pin for the crash-ordering fix: if the OLD marker
    // survived into the recompute window, a crash would leave
    // (old marker, old data) — and an input that reverts to the old
    // checksum would then false-fresh hit against data it never wrote.
    import graft.operators.HeuristicCache
    import spark.implicits._
    val dirPath = Files.createTempDirectory("hcache_crash")
    val dir = dirPath.toString
    val v1 = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "k", "v")
    var computes = 0
    def profile(df: org.apache.spark.sql.DataFrame) = {
      computes += 1
      df.groupBy(col("k")).agg(sum(col("v")).as("sum_v"))
    }
    HeuristicCache.computeOrLoad(v1, dir)(profile)
    assert(computes == 1)
    val marker = dirPath.resolve("_checksum")
    assert(Files.exists(marker))
    // changed input arrives, and the recompute CRASHES before writing
    val v2 = Seq((1L, "a", 99.0), (2L, "b", 3.0)).toDF("id", "k", "v")
    val boom = intercept[RuntimeException] {
      HeuristicCache.computeOrLoad(v2, dir)(_ => throw new RuntimeException("simulated crash"))
    }
    assert(boom.getMessage == "simulated crash")
    assert(!Files.exists(marker),
      "stale marker must be deleted before compute starts, not after")
    // the original input returns while the OLD data still sits on disk:
    // with no marker this must RECOMPUTE, never serve the stale parquet
    val r = HeuristicCache.computeOrLoad(v1, dir)(profile)
    assert(computes == 2, "post-crash run must recompute")
    assert(r.filter(col("k") === "a").collect().head.getDouble(1) == 2.0)
  }

  test("gzipped-JSONL sink round-trips through the reader") {
    import spark.implicits._
    val out = Files.createTempDirectory("sink").resolve("stage_out")
    val df = (1L to 100L).map(i =>
      (i, s"2024-02-0${i % 9 + 1}T00:00:00Z", i % 7, "message", i * 1.5, s"""{"k": ${i % 3}}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4)
    graft.sources.EventLogSource.writeJsonlGz(df, out.toString)
    val files = Files.list(out).toArray.map(_.toString).filter(_.endsWith(".json.gz"))
    assert(files.length == 4, "expected one gzip member per partition")
    // round-trip through the module's OWN reader (glob must accept the
    // sink's part-*.json.gz naming, not just firehose *.jsonl.gz)
    val back = graft.sources.EventLogSource.read(spark, out.toString)
    assert(back.count() == 100)
    assert(back.select("event_id").as[Long].collect().sorted.toSeq == (1L to 100L))
    val norm = graft.sources.EventLogSource.readNormalized(spark, out.toString)
    assert(norm.count() == 100)
  }
}

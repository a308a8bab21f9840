package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.PipelineOps

/** Dev soak probe (test scope): the FULL daily-ingest deployment at
  * decade scale — 5M-doc base (10x SoakIncr), PERSISTED bucketed
  * indexes, THREE 5k-doc daily deltas each appended to the tables,
  * the nightly compaction, and the streaming-capstone replay of the
  * same three deltas. Proves, with timings printed for BENCH_SF10.md:
  *
  *  - per-delta incremental cost stays FLAT as the index grows
  *    (each delta is delta-sized work + bucketed index probes — the
  *    base is never reshuffled);
  *  - index growth is delta-sized (row/file counts printed per append);
  *  - compaction preserves rows and restores one file set per bucket;
  *  - the streamed replay (MemoryStream micro-batches through
  *    StreamCapstone) emits EXACTLY the batch path's survivors.
  *
  * Delta mix per day: 50% exact dups of base, 10% near-dups of base,
  * 10% exact dups of the PREVIOUS delta's fresh docs (cross-delta
  * growth must catch these), 30% fresh.
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.SoakIncr5M
  * [baseDocs]"; results in BENCH_SF10.md.
  */
object SoakIncr5M {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val deltaSize = 5000L
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK5M time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def body(tag: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
      concat_ws(" ", (1 to 24).map(i =>
        concat(tag, lit(s"w$i"), id.cast("string"))): _*)

    val bench = spark.range(20).select(
      (-col("id") - 1).as("doc_id"),
      concat(lit("held out benchmark passage number "), col("id").cast("string"),
        lit(" with enough characters to carry forty char windows verbatim "),
        body(lit("bm"), col("id"))).as("text"))
    // NO Pin on base/bench: StreamCapstone owns the session's pin
    // hygiene while running (it unpersists everything outside its
    // keep-set), and a dropped localCheckpoint pin is UNRECOMPUTABLE;
    // both frames are cheap range arithmetic anyway.
    val base = spark.range(n).select(col("id").as("doc_id"),
      body(lit("b"), col("id")).as("text"))

    // day k's delta (ids strictly above everything before it): the
    // previous-delta dups reference day k-1's FRESH band (id%10>=7),
    // which survives, so day k's dup must drop against the APPENDED
    // index rows, not the base's
    def deltaRows(k: Int): Seq[(Long, String)] = {
      val off = n + (k - 1) * deltaSize
      val prevOff = n + (k - 2) * deltaSize
      spark.range(deltaSize).select((col("id") + off).as("doc_id"),
        when(col("id") % 10 < 5, body(lit("b"), col("id") * 97L % n))
          .when(col("id") % 10 < 6,
            concat(body(lit("b"), col("id") * 31L % n), lit(" xtra1 xtra2")))
          .when(col("id") % 10 < 7 && lit(k) > 1,
            body(lit("f"), lit(prevOff - n) + col("id") - (col("id") % 10) + 7))
          .otherwise(body(lit("f"), lit(off - n) + col("id"))).as("text"))
        .as[(Long, String)].collect().toSeq
    }
    val deltas = (1 to 3).map(k => k -> deltaRows(k))
    println(s"SOAK5M base ${base.count()} deltas ${deltas.map(_._2.size).mkString("/")}")

    val tmp = java.nio.file.Files.createTempDirectory("graft_soak5m").toString
    val prefix = "graft_soak5m"
    val idx0 = timed("base index build + persist (one-time)") {
      PipelineOps.persistBaseIndexes(
        PipelineOps.baseIndexes(base, bench), s"$tmp/v0", prefix = prefix)
    }
    println(s"SOAK5M index fp ${idx0.rawFp.count()} bands ${idx0.deconBands.count()}")

    def parquetFiles(dir: String): Int =
      new java.io.File(dir).list().count(_.endsWith(".parquet"))

    // ---- streaming replay FIRST (reads the pristine tables; its
    // index growth is in-memory, so the batch path below starts from
    // the same base state) ----
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamCapstone.incrementalCapstoneStream(
      input.toDF().toDF("doc_id", "text"), idx0, bench,
      s"$tmp/out", s"$tmp/quarantine", s"$tmp/ckpt")
    val streamed = try {
      timed("streaming replay of all 3 deltas") {
        deltas.foreach { case (_, rows) =>
          input.addData(rows: _*); q.processAllAvailable()
        }
      }
      spark.read.parquet(s"$tmp/out")
        .select(col("doc_id"), col("clean_text"))
        .as[(Long, String)].collect().toSet
    } finally q.stop()

    // ---- batch deployment path: per-day incrementalStep + APPEND ----
    var batchSurvivors = Set.empty[(Long, String)]
    deltas.foreach { case (k, rows) =>
      val cur = PipelineOps.BaseIndexes(
        spark.table(s"${prefix}_rawfp"), spark.table(s"${prefix}_bands"))
      val (surv, dIdx) = PipelineOps.incrementalStep(cur, rows.toDF("doc_id", "text"), bench)
      val survRows = timed(s"day $k incremental (per-delta cost)")(
        surv.as[(Long, String)].collect().toSet)
      batchSurvivors ++= survRows
      timed(s"day $k append")(
        PipelineOps.appendBaseIndexes(dIdx, prefix = prefix))
      Verify.releaseQueryState(spark)
      println(s"SOAK5M day $k survivors ${survRows.size} " +
        s"fp ${spark.table(s"${prefix}_rawfp").count()} " +
        s"bands ${spark.table(s"${prefix}_bands").count()} " +
        s"fpFiles ${parquetFiles(s"$tmp/v0/rawfp")} " +
        s"bandFiles ${parquetFiles(s"$tmp/v0/bands")}")
    }

    println(s"SOAK5M stream==batch " +
      (if (streamed == batchSurvivors) "EXACT"
       else s"BROKEN only-stream=${(streamed -- batchSurvivors).take(5)} " +
         s"only-batch=${(batchSurvivors -- streamed).take(5)}"))

    // ---- nightly compaction ----
    val fpBefore = spark.table(s"${prefix}_rawfp").count()
    val bandsBefore = spark.table(s"${prefix}_bands").count()
    timed("nightly compaction")(
      PipelineOps.compactBaseIndexes(spark, s"$tmp/v1", prefix = prefix))
    val ok = spark.table(s"${prefix}_rawfp").count() == fpBefore &&
      spark.table(s"${prefix}_bands").count() == bandsBefore
    println(s"SOAK5M compaction rows ${if (ok) "EXACT" else "BROKEN"} " +
      s"fpFiles ${parquetFiles(s"$tmp/v1/rawfp")} " +
      s"bandFiles ${parquetFiles(s"$tmp/v1/bands")}")

    // ---- deployment stream: days 4-6 through the PERSISTED-table
    // variant (appends, no in-memory union re-pin) over the compacted
    // tables — the number the in-memory replay above is compared to ----
    val input2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamCapstone.incrementalCapstoneStreamPersisted(
      input2.toDF().toDF("doc_id", "text"), prefix, bench,
      s"$tmp/out2", s"$tmp/quarantine2", s"$tmp/ckpt2")
    try {
      (4 to 6).foreach { k =>
        val rows = deltaRows(k)
        timed(s"day $k persisted-stream batch") {
          input2.addData(rows: _*); q2.processAllAvailable()
        }
      }
    } finally q2.stop()
    val streamed2 = spark.read.parquet(s"$tmp/out2")
    println(s"SOAK5M persisted-stream days 4-6 survivors ${streamed2.count()} " +
      s"fp ${spark.table(s"${prefix}_rawfp").count()} " +
      s"bands ${spark.table(s"${prefix}_bands").count()}")

    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_rawfp")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_bands")
    spark.stop()
  }
}

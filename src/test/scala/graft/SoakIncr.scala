package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineOps

/** Dev soak probe (test scope): the INCREMENTAL capstone at the
  * daily-ingest decade — 500k-doc base, 5k-doc delta (half exact dups
  * of base, some near-dups, rest fresh). Records: the one-time base
  * index build, the per-delta incremental wall (the number a daily
  * job pays), the batch-rerun wall it replaces, and the equivalence
  * check (incremental == batch restricted to delta).
  *
  * Usage: sbt "Test/runMain graft.SoakIncr [baseDocs]"; results in
  * BENCH_SF10.md.
  */
object SoakIncr {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
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
      .transform(graft.operators.Pin(_, eager = true))
    val base = spark.range(n).select(col("id").as("doc_id"),
      body(lit("b"), col("id")).as("text"))
      .transform(graft.operators.Pin(_, eager = true))
    // delta ids above base: 50% exact base dups, 10% near-dups of a
    // base doc (same words, two swapped), 40% fresh
    val delta = spark.range(5000).select((col("id") + n).as("doc_id"),
      when(col("id") % 10 < 5, body(lit("b"), col("id") * 97L % n))
        .when(col("id") % 10 < 6,
          concat(body(lit("b"), col("id") * 31L % n), lit(" xtra1 xtra2")))
        .otherwise(body(lit("f"), col("id"))).as("text"))
      .transform(graft.operators.Pin(_, eager = true))
    println(s"SOAK incr base ${base.count()} delta ${delta.count()}")

    val idx = timed("base index build (one-time)") {
      val i = PipelineOps.baseIndexes(base, bench)
      val pinned = PipelineOps.BaseIndexes(
        graft.operators.Pin(i.rawFp, eager = true),
        graft.operators.Pin(i.deconBands, eager = true))
      println(s"SOAK incr index fp ${pinned.rawFp.count()} bands ${pinned.deconBands.count()}")
      pinned
    }
    val inc = timed("incremental capstone (per-delta cost)")(
      graft.operators.Pin(
        PipelineOps.incrementalCapstone(idx, delta, bench), eager = true))
    val nInc = inc.count()
    val batch = timed("batch front rerun on base+delta (what it replaces)")(
      graft.operators.Pin(PipelineOps.frontSurvivors(
        base.unionByName(delta), bench)
        .filter(col("doc_id") >= n), eager = true))
    val nBatch = batch.count()
    val mism = inc.unionAll(batch)
      .groupBy(col("doc_id"), col("clean_text"))
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"SOAK incr survivors $nInc batch-restricted $nBatch mismatches $mism " +
      (if (mism == 0 && nInc == nBatch) "EXACT" else "BROKEN"))

    spark.stop()
  }
}

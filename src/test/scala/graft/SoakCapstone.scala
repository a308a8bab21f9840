package graft

import org.apache.spark.sql.functions._

/** Dev soak probe (test scope): the q96 pretraining capstone at the
  * 500k-doc decade — the whole corpus → training-stream path under
  * 10x replication of sf1's documents (id-shifted, text kept, the
  * SoakCorpusOps convention). The capstone composes six
  * already-soaked stages; this run proves the COMPOSITION holds at
  * scale: one wall number for the full path plus the per-stage
  * cardinalities (what survived cleaning, what the decontamination
  * touched, how the split cut, what got packed).
  *
  * Usage: sbt "Test/runMain graft.SoakCapstone [srcSfDir] [copies]";
  * results recorded in BENCH_SF10.md.
  */
object SoakCapstone {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    val base = Tables.documents(spark, src)
      .select("doc_id", "text", "source")
    val stride = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val out = "/tmp/soak_capstone_docs"
    (0 until copies).map(k =>
      base.select((col("doc_id") + lit(k * stride)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"SOAK capstone corpus $n docs (=$copies x $stride)")

    val t0 = System.nanoTime()
    val bins = SparkEntry.queries("q96_pretrain_capstone")(spark, out)
      .collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = bins.map(_.getLong(1)).sum
    val toks = bins.map(_.getLong(2)).sum
    println(f"SOAK capstone wall $wall%.1f s bins ${bins.length} " +
      s"packed_rows $rows packed_tokens $toks")
    // structural invariants at scale (the OrderPipelineSpec checks)
    val binIds = bins.map(_.getLong(0)).sorted.toSeq
    val contiguous = binIds == (0L until bins.length)
    val minDoc = bins.map(_.getLong(3)).min
    println(s"SOAK capstone bins contiguous ${if (contiguous) "EXACT" else "BROKEN"} " +
      s"min_doc $minDoc (bench excluded: ${minDoc >= graft.queries.PipelineOps.BenchDocs})")

    spark.stop()
  }
}

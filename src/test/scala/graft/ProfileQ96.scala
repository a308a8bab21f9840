package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 19): q96 capstone stage split at sf1.
  * Usage: Test/runMain graft.ProfileQ96 [sfDir] [spread]
  */
object ProfileQ96 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val useSpread = args.lift(1).contains("spread")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.{Dedup, Pin, TrainTestSplit}
    import graft.queries.PipelineOps
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val raw0 = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val raw = if (useSpread) graft.operators.Spread(raw0) else raw0
    for (round <- 1 to 2) {
      val unioned = time("pin_clean")(
        Pin(PipelineOps.cleanPlusBench(raw), eager = true))
      val decon = time("pin_decon")(Pin(
        Dedup.decontaminateStrip(unioned, col("doc_id") < 20L, 40)
          .select(col("doc_id"), col("clean_text")), eager = true))
      val sig = time("pin_sig")(Pin(Dedup.withSignatureFromHashes(
        Dedup.shingleHashRows(
          decon.select(col("doc_id"), col("clean_text").as("text")))), eager = true))
      val pairs = Dedup.minhashPairsOwned(sig)
      time("split_noop")(TrainTestSplit.leakageFree(
        decon.select(col("doc_id")), pairs)
        .write.format("noop").mode("overwrite").save())
      time("full_q96")(SparkEntry.queries("q96_pretrain_capstone")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

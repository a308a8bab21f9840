package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 19): q96 capstone pinned-intermediate partition
  * counts + fine stage split at sf1.
  * Usage: Test/runMain graft.ProfileQ96Parts [sfDir]
  */
object ProfileQ96Parts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.{Dedup, Pin, TrainTestSplit}
    import graft.queries.PipelineOps
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val raw = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    for (round <- 1 to 2) {
      val unioned = time("pin_clean")(
        Pin(PipelineOps.cleanPlusBench(raw), eager = true))
      println(s"  unioned partitions = ${unioned.rdd.getNumPartitions}")
      val benchW = time("benchW")(
        Pin(unioned.filter(col("doc_id") < 20L)
          .select(col("doc_id"), col("text"),
            posexplode(graft.plans.RollingHashes(col("text"), 40)))
          .select(col("col").as("h"),
            expr("substring(text, pos + 1, 40)").as("bslice"))
          .distinct(), eager = true))
      val trainHash = time("train_rollinghash_noop")(
        unioned.filter(!(col("doc_id") < 20L))
          .select(col("doc_id"), col("text"),
            posexplode(graft.plans.RollingHashes(col("text"), 40)))
          .select(col("doc_id"), col("pos"), col("col"))
          .write.format("noop").mode("overwrite").save())
      val decon = time("pin_decon")(Pin(
        Dedup.decontaminateStrip(unioned, col("doc_id") < 20L, 40)
          .select(col("doc_id"), col("clean_text")), eager = true))
      println(s"  decon partitions = ${decon.rdd.getNumPartitions}")
      val sig = time("pin_sig")(Pin(Dedup.withSignatureFromHashes(
        Dedup.shingleHashRows(
          decon.select(col("doc_id"), col("clean_text").as("text")))), eager = true))
      println(s"  sig partitions = ${sig.rdd.getNumPartitions}")
      val pairs = time("pairs_noop") {
        val p = Dedup.minhashPairsOwned(sig)
        p.write.format("noop").mode("overwrite").save(); p
      }
      time("cc_noop")(graft.operators.ConnectedComponents.clusters(pairs)
        .write.format("noop").mode("overwrite").save())
      time("split_noop")(TrainTestSplit.leakageFree(
        decon.select(col("doc_id")), pairs)
        .write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the q105 unigram-seed pipeline.
  * Usage: Test/runMain graft.ProfileQ105 [sfDir] */
object ProfileQ105 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.{BpeTrain, UnigramLm}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    for (_ <- 1 to 2) {
      time("vocab_only")(BpeTrain.vocab(docs).write.format("noop")
        .mode("overwrite").save())
      time("seed_native")(UnigramLm.seedCounts(BpeTrain.vocab(docs), 6)
        .write.format("noop").mode("overwrite").save())
      time("full_q105")(SparkEntry.queries("q105_unigram_seed")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

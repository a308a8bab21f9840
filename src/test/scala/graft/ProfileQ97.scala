package graft

/** Dev probe: q97 design-matrix wall-clock (round 14 — the sf10 pair
  * flagged q97 as the one ratio-degrading row; the global orderBy's
  * range sampler was re-executing the explode+agg child).
  */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("q97_quality_classifier")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PASS $i (local sort) ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Verify.releaseQueryState(spark)
      // A/B: the pre-round-14 global-orderBy shape, same JVM/heap
      val st = graft.functions.TextFunctions.textStats(col("text"))
      val enPred = (st.getField("n_stop") / st.getField("n_words")) >= 0.05
      val docs = Tables.documents(spark, dir)
      val t1 = System.nanoTime()
      operators.Quality.classifierDesign(docs, enPred)
        .orderBy(col("doc_id"), col("bucket"))
        .write.format("noop").mode("overwrite").save()
      println(f"PASS $i (global sort) ${(System.nanoTime() - t1) / 1e9}%.2f s")
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

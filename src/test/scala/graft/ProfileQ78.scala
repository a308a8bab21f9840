package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: q78 stage shapes at sf1 —
  * `sbt "Test/runMain graft.ProfileQ78 [sfDir]"`. Compares the
  * window-based exact-dedup survivor stage against a
  * min_by-aggregate variant (map-side partial combine, no
  * within-partition sort), with the rest of the pipeline identical.
  */
object ProfileQ78 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    // copies > 1 replicates the corpus VERBATIM (same doc_ids shifted,
    // same text): every document becomes a `copies`-member exact-dup
    // family — the adversarial case for the survivor stage, where the
    // window funnels whole families through single partitions and the
    // min_by aggregate collapses them map-side
    val copies = if (args.length > 1) args(1).toInt else 1
    import graft.functions.TextFunctions

    def rest(surv: DataFrame): DataFrame = {
      val st = graft.plans.RepetitionStats(trim(col("text")))
      surv
        .withColumn("st", st)
        .filter(col("st.top2_cov") * 5 <= col("st.tot") &&
          col("st.dup5_cov") * 20 <= col("st.tot") * 3)
        .withColumn("red_text",
          graft.plans.PiiScan(col("text"), withCounts = false)
            .getField("red_text"))
        .select(col("doc_id"), col("red_text"),
          TextFunctions.bpeTokenCount(col("red_text")).as("n_tokens"))
        .repartition(col("doc_id"))
        .orderBy(col("doc_id"))
    }

    // hotCopies > 0 additionally plants ONE document duplicated that
    // many times — the single-mega-family case where the window's
    // fp partition receives every copy's full text on one reducer
    val hotCopies = if (args.length > 2) args(2).toLong else 0L

    def corpus(): DataFrame = {
      val base = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val replicated =
        if (copies == 1) base
        else {
          val stride = 10000000L
          (0 until copies).map(k =>
            base.select((col("doc_id") + lit(k * stride)).as("doc_id"), col("text")))
            .reduce(_.unionAll(_))
        }
      if (hotCopies == 0) replicated
      else {
        val one = base.orderBy(col("doc_id")).limit(1)
        val hot = spark.range(hotCopies).toDF("i")
          .crossJoin(one)
          .select((col("i") + 900000000L).as("doc_id"), col("text"))
        replicated.unionAll(hot).repartition(32)
      }
    }

    def windowShape(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      rest(corpus()
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
        .withColumn("canon_id", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("canon_id"))
        .select("doc_id", "text"))
    }

    def aggShape(): DataFrame =
      rest(corpus()
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text")))

    // shuffle-byte accounting: local[32] shuffles at memory speed, so
    // wall time hides the exchange-volume difference a network
    // cluster pays — count the bytes instead
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    for (round <- 1 to 4; (name, mk) <- Seq("window" -> windowShape _, "min_by" -> aggShape _)) {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let stage-completed events drain
      println(f"$name round$round $dt%.2f s shuffleMB ${shuffleBytes.get / 1e6}%.1f")
    }
    spark.stop()
  }
}

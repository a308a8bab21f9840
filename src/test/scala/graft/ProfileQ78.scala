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

    def windowShape(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      rest(graft.Tables.documents(spark, dir)
        .withColumn("fp", TextFunctions.fingerprint(col("text")))
        .withColumn("canon_id", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("canon_id"))
        .select("doc_id", "text"))
    }

    def aggShape(): DataFrame =
      rest(graft.Tables.documents(spark, dir)
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text")))

    for (round <- 1 to 4; (name, mk) <- Seq("window" -> windowShape _, "min_by" -> aggShape _)) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

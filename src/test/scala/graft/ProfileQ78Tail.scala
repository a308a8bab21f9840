package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: q78's protocol-sort tail —
  * `sbt "Test/runMain graft.ProfileQ78Tail [sfDir]"`.
  * repart = the committed shape (hash repartition as the sampler's
  * re-read point, then orderBy); pin = localCheckpoint as the re-read
  * point; plain = bare orderBy (sampler re-executes the pipeline).
  */
object ProfileQ78Tail {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    import graft.functions.TextFunctions

    def body(): DataFrame = {
      val st = graft.plans.RepetitionStats(trim(col("text")))
      graft.Tables.documents(spark, dir).select("doc_id", "text")
        .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        .withColumn("st", st)
        .filter(col("st.top2_cov") * 5 <= col("st.tot") &&
          col("st.dup5_cov") * 20 <= col("st.tot") * 3)
        .withColumn("red_text",
          graft.plans.PiiScan(col("text"), withCounts = false).getField("red_text"))
        .select(col("doc_id"), col("red_text"),
          TextFunctions.bpeTokenCount(col("red_text")).as("n_tokens"))
    }
    def repart(): DataFrame = body().repartition(col("doc_id")).orderBy(col("doc_id"))
    def pin(): DataFrame = graft.operators.Pin(body()).orderBy(col("doc_id"))
    def plain(): DataFrame = body().orderBy(col("doc_id"))

    for (round <- 1 to 4; (name, mk) <- Seq(
        "repart" -> repart _, "pin" -> pin _, "plain" -> plain _)) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

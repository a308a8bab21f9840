package graft

import org.apache.spark.sql.functions._

/** Dev probe (round 18): does repartitioning the raw docs ahead of the
  * heavy scan-side projections (textStats / classifier design / LM
  * scoring) pay on an under-split file layout?
  * Usage: Test/runMain graft.ProfileSpread [sfDir]
  */
object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val docsRaw = Tables.documents(spark, dir)
    val docsSpread = docsRaw.repartition(32, col("doc_id"))
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred = (st.getField("n_stop") / st.getField("n_words")) >= 0.05

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-24s min=${ts.min}%.2f (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    noop(graft.operators.Quality.classifierDesign(docsRaw, enPred))
    time("q97_raw")(noop(graft.operators.Quality.classifierDesign(docsRaw, enPred)))
    time("q97_spread")(noop(graft.operators.Quality.classifierDesign(docsSpread, enPred)))
    time("q76_raw")(noop(graft.operators.Dsir.bucketModel(docsRaw, enPred).orderBy(col("bucket"))))
    time("q76_spread")(noop(graft.operators.Dsir.bucketModel(docsSpread, enPred).orderBy(col("bucket"))))
    time("q85_raw")(noop(graft.operators.LangModel.pplFeatures(docsRaw, col("doc_id") < 20)))
    time("q85_spread")(noop(graft.operators.LangModel.pplFeatures(docsSpread, col("doc_id") < 20)))
    spark.stop()
  }
}

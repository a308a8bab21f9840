package graft

import org.apache.spark.sql.functions._

/** Dev probe: floor decomposition of the four sf10 borderline rows
  * (q15, q56, q83, q90) + a slim-shuffle q90 variant. */
object ProfileBorderline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.functions.TextFunctions
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val ev = graft.functions.EventFunctions.norm(Tables.events(spark, dir))
    val docs = Tables.documents(spark, dir)
    for (_ <- 1 to 2) {
      // shared event floors
      time("F_ev_scan")(ev.select(col("instance_id")).write.format("noop").mode("overwrite").save())
      time("F_ev_agg1")(noop(ev.groupBy(col("instance_id")).agg(count(lit(1)))))
      time("q15")(noop(SparkEntry.queries("q15_author_filter")(spark, dir)))
      time("q56")(noop(SparkEntry.queries("q56_heuristic_profile")(spark, dir)))
      // doc fingerprint floor
      time("F_doc_fp")(noop(docs.select(TextFunctions.fingerprint(col("text")).as("fp"))))
      time("q90")(noop(SparkEntry.queries("q90_incremental_dedup")(spark, dir)))
      // q90 slim variant: drop text BEFORE the min_by shuffle
      time("q90_slim") {
        val all = docs.select(col("doc_id"), col("text"), col("source"))
        val fp = TextFunctions.fingerprint(col("text"))
        val baseFp = all.filter(col("doc_id") % 2 === 0).select(fp.as("fp")).distinct()
        val delta = all.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source"), fp.as("fp"))
        noop(delta.groupBy(col("fp"))
          .agg(min_by(struct(col("doc_id"), col("source")), col("doc_id")).as("r"))
          .join(baseFp.hint("shuffle_hash"), Seq("fp"), "left_anti")
          .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"))
          .orderBy(col("doc_id")))
      }
      time("q83")(noop(SparkEntry.queries("q83_knn_graph")(spark, dir)))
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

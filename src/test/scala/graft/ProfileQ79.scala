package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 19): stage split of q79 stripDupSpans at sf1.
  * Usage: Test/runMain graft.ProfileQ79 [sfDir]
  */
object ProfileQ79 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val l = 40
    def docs = graft.operators.Spread(Tables.documents(spark, dir))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def occ = docs.select(col("doc_id"),
      posexplode(graft.plans.RollingHashes(col("text"), l)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("h"))
    for (round <- 1 to 2) {
      time("occ_noop")(occ.write.format("noop").mode("overwrite").save())
      val dupH = occ.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("h"))
      time("dupH_noop")(dupH.write.format("noop").mode("overwrite").save())
      val candS = occ.join(dupH, Seq("h"))
        .join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("pos"), col("h"),
          expr(s"substring(text, pos + 1, $l)").as("slice"))
      time("candS_noop")(candS.write.format("noop").mode("overwrite").save())
      val groups = candS.groupBy(col("h"), col("slice")).agg(
        countDistinct(col("doc_id")).as("nd2"),
        min(struct(col("doc_id"), col("pos"))).as("owner"))
        .filter(col("nd2") >= 2)
        .select(col("h"), col("slice"),
          col("owner.doc_id").as("odoc"), col("owner.pos").as("opos"))
      val removals = candS.join(groups, Seq("h", "slice"))
        .filter(!(col("doc_id") === col("odoc") && col("pos") === col("opos")))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("pos"))).as("ps"))
      time("removals_noop")(removals.write.format("noop").mode("overwrite").save())
      time("full_q79")(SparkEntry.queries("q79_strip_dup_spans")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: q77 exchange shapes at sf1 —
  * `sbt "Test/runMain graft.ProfileQ77 [sfDir]"`.
  *
  *   current — groupBy(h,doc) / groupBy(h) / join: each step re-keys,
  *             3 logical exchanges of the slim stream (exchange reuse
  *             dedups some);
  *   oneex   — repartition(h) FIRST: the (h,doc) aggregate, the per-h
  *             count, and the join-back all reuse HashPartitioning(h)
  *             (subset-key clustering), so the slim stream crosses
  *             the wire once;
  *   window  — same single exchange, nd via count() OVER (PARTITION
  *             BY h) instead of agg+join (adds a per-partition sort).
  */
object ProfileQ77 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val l = 40

    def finish(dups: DataFrame): DataFrame = {
      val nw = greatest(length(col("text")) - (l - 1), lit(0)).cast("long")
      docs.select(col("doc_id"), nw.as("n_windows"))
        .join(dups, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
        .orderBy(col("doc_id"))
    }
    def occ = docs.select(col("doc_id"),
      explode(graft.plans.RollingHashes(col("text"), l)).as("h"))

    def current(): DataFrame = {
      val perDoc = occ.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      val multi = perDoc.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("h"))
      finish(perDoc.join(multi, Seq("h"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_windows")))
    }
    def oneex(): DataFrame = {
      val perDoc = occ.repartition(col("h"))
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      val multi = perDoc.groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("h"))
      finish(perDoc.join(multi, Seq("h"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_windows")))
    }
    def windowed(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val perDoc = occ.repartition(col("h"))
        .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      finish(perDoc.withColumn("nd", count(lit(1)).over(w))
        .filter(col("nd") >= 2)
        .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_windows")))
    }

    def windowB(): DataFrame = {
      // keeps the (h,doc) map-side combine (within-doc repetition
      // collapses BEFORE any exchange), then one h-exchange feeds the
      // window and the join-free family count
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      val perDoc = occ.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
        .repartition(col("h"))
      finish(perDoc.withColumn("nd", count(lit(1)).over(w))
        .filter(col("nd") >= 2)
        .groupBy(col("doc_id")).agg(sum(col("c")).as("dup_windows")))
    }

    for (round <- 1 to 4; (name, mk) <- Seq(
        "current" -> current _, "oneex" -> oneex _, "window" -> windowed _,
        "windowB" -> windowB _)) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"$name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 18): does AQE's 1 MiB coalesce floor serialize the
  * event-family window stages at bench scale? Times a query set under
  * several spark.sql.adaptive.coalescePartitions.minPartitionSize
  * values (fresh session per value — the conf is read at plan time).
  * Usage: Test/runMain graft.ProfileCoalesce [sfDir] [names...]
  */
object ProfileCoalesce {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q62_sta_nar_assembly", "q12_message_groups",
        "q20_words_between_cmds", "q50_finetune_pairs", "q87_tfidf_keywords",
        "q77_dup_substrings")

    for (minSize <- sys.env.get("GRAFT_COALESCE_SWEEP").map(_.split(",").toSeq).getOrElse(Seq("1MB", "256KB", "64KB", "16KB"))) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minSize)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val queries = SparkEntry.queries
      names.foreach(n => queries(n)(spark, dir).write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
      names.foreach { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
          Verify.releaseQueryState(spark)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"minSize=$minSize%-6s $n%-28s min=${ts.min}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

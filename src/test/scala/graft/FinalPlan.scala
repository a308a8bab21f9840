package graft
/** Dev probe: execute a query, then dump the FINAL adaptive plan
  * (post stage-reuse) — the initial plan string can show duplicate
  * scan subtrees that AQE dedupes at runtime. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8", "8", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (name <- args.drop(1)) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"===== $name (final) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

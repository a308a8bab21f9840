package graft

import org.apache.spark.sql.SparkSession

/** Canonical local SparkSession for every graft entry point: UTC,
  * nanos-as-long parquet timestamps, graft extensions (SQL-registered
  * native expressions), no UI. One definition so the mains and the
  * test session can't drift apart on the configs correctness depends
  * on. */
object GraftSession {
  def local(cores: String, shufflePartitions: String,
            logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // The whole-stage-codegen class cache holds 100 entries by
      // default; a 47-query workload evicts earlier queries' compiled
      // classes and pays the multi-second Janino recompile on every
      // re-run (measured: q37's 60-aggregate stage is 0.3 s warm,
      // 4 s when recompiled). Size it to the workload.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}

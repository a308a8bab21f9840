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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated synthetic tables
  * (TPC-H-ish star schema + `events` stream + `documents`/`embeddings`).
  *
  * Mirrors the reference's ingest layer (reference:
  * dataset/utils.py:combat_dir_iterator — a directory of event files is
  * the unit of input), re-expressed as parquet scans so Catalyst gets
  * predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects outright; this legacy conf surfaces it as BIGINT
      // epoch-nanos instead (runtime-settable, idempotent). All event
      // queries then work on exact int64 microseconds (ts DIV 1000 ==
      // DuckDB epoch_us(ts), which truncates ns the same way).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

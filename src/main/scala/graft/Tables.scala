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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across data drops. Spark rejects NANOS
      // outright unless this legacy conf surfaces it as BIGINT
      // epoch-nanos (runtime-settable, idempotent, no effect on
      // MICROS files). EventFunctions.norm then branches on the read
      // schema so either encoding yields identical int64 µs.
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
  // Embedding vectors are consumed as array<float> by the native
  // vector expressions (QuantizedDotProduct/LshBucketKeys). The
  // driver's drops have already silently changed one physical type
  // between rounds (events.ts); if `embedding` ever arrives as
  // array<double>, cast it back at the scan boundary rather than
  // letting every vector operator fail type-check. (Quantization
  // floors to 1e-7 resolution, so a float-generated double column
  // round-trips exactly.)
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case at @ ArrayType(DoubleType, _) =>
        // Loud, not silent: a genuinely double-precision drop loses
        // bits here, and the oracle hash gate would flag it — surface
        // the detected physical type so that failure is diagnosable.
        org.slf4j.LoggerFactory.getLogger("graft.Tables").warn(
          s"embeddings.embedding read as $at; casting to array<float>. " +
          "Exact round-trip holds only for float-originated values — " +
          "a true double-precision drop will lose precision.")
        df.withColumn("embedding",
          org.apache.spark.sql.functions.col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalStateException(
          s"embeddings.embedding has unsupported physical type $other " +
          "(expected array<float> or array<double>)")
    }
  }
}

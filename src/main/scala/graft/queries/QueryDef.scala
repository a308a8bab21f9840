package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit: a Spark query plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. Column
  * aliases MUST match between the two — the driver sorts columns by
  * name before hashing.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def all: Seq[QueryDef]

  /** Names of this module's queries included in the bench headline set
    * (default: all of them — override to trim expensive baselines). */
  def headline: Seq[String] = all.map(_.name)
}

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
}

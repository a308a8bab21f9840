package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset anonymization (reference: scripts/anonymize.py — md5-hash
  * every id, rename authors to "Player N" in order of appearance).
  *
  * Scale design: the "Player N" numbering is a global rank over the
  * DISTINCT author values, ordered by each author's FIRST appearance
  * (min of orderCol) with the author value as tie-break — two authors
  * whose first appearances tie still get distinct player numbers in a
  * deterministic order. The author universe is unbounded on real data
  * (10⁶–10⁸ distinct authors), so the rank is computed by
  * [[GlobalRank]] (range-partitioned two-phase numbering — no
  * single-partition window) and joined back UN-hinted: AQE broadcasts
  * it while it is small and falls back to a shuffled hash join once
  * it outgrows the broadcast threshold, instead of a forced broadcast
  * OOMing the driver. The join is null-safe: a NULL author value is
  * kept and ranked like any other (an inner equi-join would silently
  * drop those rows).
  */
object Anonymize {

  /** Adds anon_id (salted md5 of idCol), anon_<authorCol>, and a
    * "Player N" alias per distinct author value, numbered by first
    * appearance in `orderCol` order. */
  def apply(df: DataFrame, idCol: String, authorCol: String,
            orderCol: String): DataFrame = {
    val authors = df.groupBy(col(authorCol).as("author_key"))
      .agg(min(col(orderCol)).as("first_seen"))
    val ranks = GlobalRank
      .withRowNumber(authors, Seq(col("first_seen"), col("author_key")), "rn")
      .withColumn("player", concat(lit("Player "), col("rn").cast("string")))
      .select(col("author_key"), col("player"))
    df.withColumn("anon_id", TextFunctions.anonId(col(idCol), "doc"))
      .withColumn(s"anon_$authorCol",
        concat(lit("src_"), substring(md5(col(authorCol)), 1, 8)))
      .join(ranks, col(authorCol) <=> col("author_key"), "left")
      .drop("author_key")
  }
}

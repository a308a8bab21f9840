package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset anonymization (reference: scripts/anonymize.py — md5-hash
  * every id, rename authors to "Player N" in order of appearance).
  *
  * Scale design: the "Player N" numbering needs a global rank over the
  * DISTINCT author values — computed on the per-author aggregate
  * (small: the author universe, not the row count) ordered by each
  * author's FIRST appearance (min of orderCol), then broadcast-joined
  * back, so the big table is never pulled through a single-partition
  * window. The join is null-safe: a NULL author value is kept and
  * ranked like any other (an inner equi-join would silently drop those
  * rows).
  */
object Anonymize {

  /** Adds anon_id (salted md5 of idCol), anon_<authorCol>, and a
    * "Player N" alias per distinct author value, numbered by first
    * appearance in `orderCol` order. */
  def apply(df: DataFrame, idCol: String, authorCol: String,
            orderCol: String): DataFrame = {
    // row_number with the author value as tie-break: two authors whose
    // first appearances tie on orderCol still get DISTINCT player
    // numbers in a deterministic order (dense_rank would alias them).
    val ranks = df.groupBy(col(authorCol).as("author_key"))
      .agg(min(col(orderCol)).as("first_seen"))
      .withColumn("player",
        concat(lit("Player "),
          row_number().over(
            Window.orderBy(col("first_seen"), col("author_key"))).cast("string")))
      .select(col("author_key"), col("player"))
    df.withColumn("anon_id", TextFunctions.anonId(col(idCol), "doc"))
      .withColumn(s"anon_$authorCol",
        concat(lit("src_"), substring(md5(col(authorCol)), 1, 8)))
      .join(broadcast(ranks), col(authorCol) <=> col("author_key"), "left")
      .drop("author_key")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dataset anonymization (reference: scripts/anonymize.py — md5-hash
  * every id, rename authors to "Player N" in order of appearance).
  *
  * Scale design: the "Player N" numbering needs a global rank over the
  * DISTINCT author values — computed on the distinct set (small: the
  * author universe, not the row count) and broadcast-joined back, so
  * the big table is never pulled through a single-partition window.
  */
object Anonymize {

  /** Adds anon_id (salted md5 of idCol) and anon_<authorCol> plus a
    * "Player N" alias per distinct author value. */
  def apply(df: DataFrame, idCol: String, authorCol: String): DataFrame = {
    val ranks = df.select(col(authorCol)).distinct()
      .withColumn("player",
        concat(lit("Player "),
          dense_rank().over(Window.orderBy(col(authorCol))).cast("string")))
    df.withColumn("anon_id", TextFunctions.anonId(col(idCol), "doc"))
      .withColumn(s"anon_$authorCol",
        concat(lit("src_"), substring(md5(col(authorCol)), 1, 8)))
      .join(broadcast(ranks), authorCol)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Qualtrics survey-export ingest — the WIDE rank/matrix export →
  * (rater, item, rating) long matrix the agreement analytics consume
  * (reference: human_eval/qualtrics_rank_to_matrix.py converts the
  * survey's rank questions to matrix/slider questions "because
  * ranking is hard to analyze"; human_eval/results_analysis.py:52-74
  * `User.from_qualtrics_row` then reads the export's wide row per
  * rater — `seen{q}` page flags, `Sense{q}_{m}` / `Specific{q}_{m}`
  * binary matrix answers (RecodeValues "1"/"0"), `Interesting{q}_{m}`
  * 1–10 slider answers — into per-scenario response objects).
  *
  * [[rankToMatrix]] is that read as a relational UNPIVOT: one explode
  * over a LITERAL (scenario × model) column map — a pure projection
  * (no shuffle, no join; the wide schema is a survey-design constant,
  * never data-sized), emitting one (r, q, m, sense, specific,
  * interesting) row per seen scenario-model cell. Rows whose page
  * flag is not 1 are dropped exactly like the reference's
  * `seen(\\d+)` scan keeps only flagged pages.
  *
  * [[withInterestNormalized]] ports the per-rater StandardScaler
  * z-normalization of the slider scores (results_analysis.py:76-84):
  * population mean/std over ALL the rater's interest answers, a
  * per-rater window — float tail, spec-gated like every transcendental
  * surface (sqrt); an all-equal rater (scale 0) maps to 0.0, matching
  * sklearn's zero-variance convention (scale_ replaced by 1, values
  * centered to 0).
  */
object QualtricsIngest {

  /** Melt a wide Qualtrics export into the long ratings matrix.
    * `wide` must carry `raterCol`, `seen{q}`, `Sense{q}_{m}`,
    * `Specific{q}_{m}`, `Interesting{q}_{m}` for every q in
    * `scenarios`, m in `models`. */
  def rankToMatrix(wide: DataFrame, scenarios: Seq[Int], models: Seq[Int],
                   raterCol: String = "r"): DataFrame = {
    val cells: Seq[Column] = for (q <- scenarios; m <- models) yield struct(
      lit(q.toLong).as("q"), lit(m.toLong).as("m"),
      col(s"seen$q").cast("bigint").as("seen"),
      col(s"Sense${q}_$m").cast("bigint").as("sense"),
      col(s"Specific${q}_$m").cast("bigint").as("specific"),
      col(s"Interesting${q}_$m").cast("bigint").as("interesting"))
    wide
      .select(col(raterCol).as("r"), explode(array(cells: _*)).as("c"))
      .filter(col("c.seen") === 1)
      .select(col("r"), col("c.q").as("q"), col("c.m").as("m"),
        col("c.sense").as("sense"), col("c.specific").as("specific"),
        col("c.interesting").as("interesting"))
  }

  /** Per-rater z-normalized interest (population std, the sklearn
    * StandardScaler defaults): adds `interesting_norm`. */
  def withInterestNormalized(long: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("r"))
    val mu = avg(col("interesting")).over(w)
    val sd = stddev_pop(col("interesting")).over(w)
    long.withColumn("interesting_norm",
      when(sd === 0.0, 0.0).otherwise((col("interesting") - mu) / sd))
  }
}

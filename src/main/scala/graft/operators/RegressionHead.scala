package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Logistic-regression head over the per-instance heuristic features
  * joined with labels — the reference's regression stage (reference:
  * regression/log_reg.py:35-60 fits sklearn
  * `LogisticRegression(class_weight='balanced', penalty='l2')` on
  * `StandardScaler`'d features; the feature⋈label table it loads via
  * regression/load_data.py:19 is exactly q57's output).
  *
  * Spark-first shape: spark.ml's LogisticRegression IS the
  * distributed analog — each LBFGS iteration computes the loss
  * gradient with one `treeAggregate` pass over the executors (a
  * map-side-combined aggregation, no shuffle of rows), so the fit
  * scales with the feature table the same way every other aggregate
  * here does. The reference's preprocessing maps 1:1:
  *  - StandardScaler        → `setStandardization(true)` (fit-internal,
  *    coefficients are reported back in original feature units);
  *  - class_weight=balanced → an explicit weight column
  *    w(c) = n / (2·n_c), the sklearn "balanced" formula;
  *  - penalty='l2'          → `setElasticNetParam(0)` + `setRegParam`.
  *
  * Determinism: LBFGS from a fixed zero initial point with
  * deterministic partial-sum aggregation — run-to-run identical
  * coefficients for identical input (pinned by RegressionHeadSpec).
  *
  * NULL features (e.g. `msg_cmd_ratio` for zero-command instances)
  * are imputed to 0.0 before assembly — sklearn would reject NaN
  * rows outright; 0 keeps them with a neutral value.
  */
object RegressionHead {

  /** Fitted head: coefficients in ORIGINAL feature units (index-aligned
    * with the `featureCols` passed to [[fit]]), intercept, per-row
    * predictions `(idCol, labelCol, y, p_pos, prediction)` ordered by
    * id, and training accuracy. */
  final case class Fit(
      coefficients: Array[Double],
      intercept: Double,
      predictions: DataFrame,
      trainAccuracy: Double) {

    /** IDs predicted positive, ordered — the reference's
      * predictions→ids extraction (regression/predictions_to_ids.py:
      * 12-16: keep rows whose prediction == 1, emit the index ids). */
    def positiveIds(idCol: String): DataFrame =
      predictions.filter(col("prediction") === 1.0)
        .select(col(idCol)).orderBy(col(idCol))
  }

  /** The deterministic training table the fit consumes — everything up
    * to (but not including) the LBFGS iterations: label mapped to
    * y∈{0,1}, NULL features imputed to 0, and the sklearn "balanced"
    * class weight w(c) = n / (2·n_c) attached per row. Exposed
    * separately because this half of the stage IS SQL-expressible and
    * therefore oracle-checkable (q58), while the iterative fit is
    * gated by RegressionHeadSpec instead.
    *
    * Scale shape: the class counts are a 1-row aggregate broadcast
    * back onto the rows (no unpartitioned window, no driver round
    * trip in the data path). The training table is PINNED first:
    * the stats branch and the row branch otherwise each recompute the
    * full upstream pipeline (Catalyst does not dedupe common
    * subplans across a crossJoin's two sides, and AQE's broadcast
    * conversion breaks exchange reuse) — one row per labeled
    * instance is bounded and far smaller than the corpus it
    * aggregates, so materializing it once is the scale-correct
    * trade on a cluster too (Pin is reliable-checkpoint-aware). */
  def designMatrix(
      data: DataFrame,
      featureCols: Seq[String],
      labelCol: String = "label",
      posLabel: String = "pos"): DataFrame = {
    val base = Pin(data
      .withColumn("y", when(col(labelCol) === posLabel, 1.0).otherwise(0.0))
      .na.fill(0.0, featureCols))
    val stats = base.agg(
      count(lit(1)).cast("double").as("_n"),
      sum(col("y")).as("_np"))
    base.crossJoin(broadcast(stats))
      .withColumn("w",
        when(col("y") === 1.0, col("_n") / (lit(2.0) * col("_np")))
          .otherwise(col("_n") / (lit(2.0) * (col("_n") - col("_np")))))
      .drop("_n", "_np")
  }

  /** Fit the head on `data` (one row per instance). `posLabel` maps the
    * string label to y=1. The two driver-side actions are 1-row
    * aggregates (class counts, accuracy) — scalars, not data. */
  def fit(
      data: DataFrame,
      featureCols: Seq[String],
      idCol: String,
      labelCol: String = "label",
      posLabel: String = "pos",
      regParam: Double = 0.01): Fit = {

    val weighted = designMatrix(data, featureCols, labelCol, posLabel)

    val cnt = weighted.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("y")).as("np")).collect().head
    val (n, nPos) = (cnt.getDouble(0), cnt.getDouble(1))
    val nNeg = n - nPos
    require(nPos > 0 && nNeg > 0,
      s"regression head needs both classes, got pos=$nPos neg=$nNeg")
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(weighted)

    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setWeightCol("w")
      .setRegParam(regParam).setElasticNetParam(0.0)
      .setStandardization(true)
      .setMaxIter(100).setTol(1e-9)
      .fit(assembled)

    val predictions = model.transform(assembled)
      .withColumn("p_pos", vector_to_array(col("probability")).getItem(1))
      .select(col(idCol), col(labelCol), col("y"), col("p_pos"), col("prediction"))
      .orderBy(col(idCol))

    val acc = predictions
      .agg(avg(when(col("prediction") === col("y"), 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)

    Fit(model.coefficients.toArray, model.intercept, predictions, acc)
  }

  /** The q57 feature set (everything numeric in the profile). */
  val ProfileFeatures: Seq[String] = Seq(
    "n_events", "n_messages", "n_commands", "n_participants", "n_actors",
    "msg_cmd_ratio", "avg_msg_len")
}

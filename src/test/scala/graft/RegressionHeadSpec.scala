package graft

import org.apache.spark.sql.functions._

import graft.operators.RegressionHead

/** Semantic gate for the regression head (no DuckDB oracle — an
  * iterative LBFGS fit is not SQL-expressible): a planted linear
  * decision boundary must be recovered with the right coefficient
  * signs and >90% accuracy, refits must be bit-deterministic, the
  * balanced class weights must keep a 9:1 skewed minority predictable,
  * and the q57 end-to-end path must produce well-formed predictions.
  */
class RegressionHeadSpec extends SparkTestBase {

  private def planted(n: Int, posFrac: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // shift the boundary's intercept to hit the requested class balance
    val rnd = new scala.util.Random(11)
    val cut = {
      // z = 2x1 - 1.5x2 + 0.5x3, x ~ U(-2,2): quantile by sampling the
      // same deterministic stream the rows use
      val zs = Seq.fill(4000) {
        2.0 * (rnd.nextDouble() * 4 - 2) - 1.5 * (rnd.nextDouble() * 4 - 2) +
          0.5 * (rnd.nextDouble() * 4 - 2)
      }.sorted
      zs(((1.0 - posFrac) * (zs.size - 1)).toInt)
    }
    val rows = (1L to n.toLong).map { i =>
      val r = new scala.util.Random(1000 + i)
      val x1 = r.nextDouble() * 4 - 2
      val x2 = r.nextDouble() * 4 - 2
      val x3 = r.nextDouble() * 4 - 2
      val z = 2.0 * x1 - 1.5 * x2 + 0.5 * x3
      (i, x1, x2, x3, if (z > cut) "pos" else "neg")
    }
    rows.toDF("id", "x1", "x2", "x3", "label")
  }

  test("recovers a planted linear boundary: >90% accuracy, correct signs, deterministic refit") {
    val df = planted(400)
    val f1 = RegressionHead.fit(df, Seq("x1", "x2", "x3"), "id")
    assert(f1.trainAccuracy > 0.9, s"accuracy ${f1.trainAccuracy}")
    assert(f1.coefficients(0) > 0 && f1.coefficients(1) < 0 && f1.coefficients(2) > 0,
      s"coefficient signs should mirror the planted (+2, -1.5, +0.5): ${f1.coefficients.toSeq}")
    // |w1| > |w3| in standardized space (uniform features, same scale)
    assert(math.abs(f1.coefficients(0)) > math.abs(f1.coefficients(2)))
    val f2 = RegressionHead.fit(df, Seq("x1", "x2", "x3"), "id")
    assert(f1.coefficients.toSeq == f2.coefficients.toSeq && f1.intercept == f2.intercept,
      "refit on identical input must reproduce identical coefficients")
  }

  test("balanced class weights keep a 9:1 minority class predictable") {
    val df = planted(400, posFrac = 0.1)
    val fit = RegressionHead.fit(df, Seq("x1", "x2", "x3"), "id")
    assert(fit.trainAccuracy > 0.9, s"accuracy ${fit.trainAccuracy}")
    // an unweighted fit under skew drifts toward all-majority; the
    // balanced head must still PREDICT pos for most true-pos rows
    val posRecall = fit.predictions
      .agg(avg(when(col("y") === 1.0, when(col("prediction") === 1.0, 1.0).otherwise(0.0))))
      .collect().head.getDouble(0)
    assert(posRecall > 0.8, s"minority recall $posRecall")
  }

  test("end-to-end on q57 features+labels: one prediction per labeled instance, well-formed") {
    val q57 = SparkEntry.queries("q57_label_join")(spark, sfDir)
    val fit = RegressionHead.fit(q57, RegressionHead.ProfileFeatures, "instance_id")
    val preds = fit.predictions
    assert(preds.count() == q57.count(), "one prediction row per labeled instance")
    assert(preds.filter(col("p_pos") < 0.0 || col("p_pos") > 1.0).isEmpty)
    assert(preds.filter(col("prediction") =!= 0.0 && col("prediction") =!= 1.0).isEmpty)
    assert(fit.coefficients.length == RegressionHead.ProfileFeatures.length)
    // deterministic across refits on the real table too
    val again = RegressionHead.fit(q57, RegressionHead.ProfileFeatures, "instance_id")
    assert(fit.coefficients.toSeq == again.coefficients.toSeq)
    // q58 is the registered form of this path
    assert(SparkEntry.queries("q58_regression_head")(spark, sfDir).count() == q57.count())
    // predictions -> positive-id extraction (predictions_to_ids.py):
    // exactly the prediction==1 rows' ids, in order
    val posIds = fit.positiveIds("instance_id").collect().map(_.getInt(0)).toSeq
    val expected = preds.filter(col("prediction") === 1.0)
      .select("instance_id").collect().map(_.getInt(0)).toSeq.sorted
    assert(posIds == expected)
    assert(posIds.nonEmpty && posIds.size < q57.count())
  }
}

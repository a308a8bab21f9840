package graft

import org.apache.spark.sql.functions._

import graft.queries.AgreementOps

/** Range/consistency pins for the agreement statistics (the exact
  * arithmetic is oracle-gated; these catch formula-sign regressions
  * the hash gate would only report as an opaque mismatch). */
class AgreementSpec extends SparkTestBase {

  private def q(name: String) =
    AgreementOps.all.find(_.name == name).get.run(spark, sfDir)

  test("pairwise kappa and tau stay in [-1, 1]; n_items positive") {
    val p = q("q64_annotator_agreement").cache()
    assert(p.filter(col("n_items") <= 0).isEmpty)
    assert(p.filter(abs(col("kappa")) > 1.0).isEmpty, "kappa out of range")
    assert(p.filter(col("tau").isNotNull && abs(col("tau")) > 1.0).isEmpty,
      "tau out of range")
  }

  test("qualtrics rankToMatrix: hand-built wide export melts exactly; seen=0 dropped") {
    import spark.implicits._
    import graft.operators.QualtricsIngest
    // 2 raters × 2 scenarios × 1 model, scenario 2 unseen for rater 9
    val wide = Seq(
      (7L, 1, 1, 0, 9L, 1, 1, 0, 3L),
      (9L, 1, 0, 1, 5L, 0, 1, 1, 8L))
      .toDF("r", "seen1", "Sense1_1", "Specific1_1", "Interesting1_1",
        "seen2", "Sense2_1", "Specific2_1", "Interesting2_1")
    val long = QualtricsIngest.rankToMatrix(wide, Seq(1, 2), Seq(1))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSet
    assert(long == Set(
      (7L, 1L, 1L, 1L, 0L, 9L), (7L, 2L, 1L, 1L, 0L, 3L),
      (9L, 1L, 1L, 0L, 1L, 5L)),
      s"melted rows wrong: $long")
    // interest normalization: per-rater population z-scores
    val norm = QualtricsIngest.withInterestNormalized(
      QualtricsIngest.rankToMatrix(wide, Seq(1, 2), Seq(1)))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(6)).toMap
    // rater 7: values (9, 3) -> mean 6, pop std 3 -> z = +1, -1
    assert(math.abs(norm((7L, 1L)) - 1.0) < 1e-12 &&
      math.abs(norm((7L, 2L)) + 1.0) < 1e-12, s"z-scores: $norm")
    // rater 9: single value -> zero variance -> 0.0 (sklearn convention)
    assert(norm((9L, 1L)) == 0.0)
  }

  test("q64's computation consumes the ingested qualtrics matrix unchanged") {
    val panel = q("q102_qualtrics_matrix")
    val pairs = AgreementOps.pairAgreementOf(panel)
    val rows = pairs.collect()
    assert(rows.nonEmpty, "the melted export panel must produce rater pairs")
    assert(rows.forall(r => r.getLong(2) > 0), "pair overlap must be positive")
    assert(rows.forall(r => math.abs(r.getLong(3)) <= 100000L),
      "kappa_s out of [-1,1] scale on the export panel")
  }

  test("krippendorff alpha: one row, alpha in [-1, 1], counts consistent") {
    val a = q("q69_krippendorff_alpha").collect()
    assert(a.length == 1)
    val r = a.head
    val (nItems, nRatings) = (r.getLong(0), r.getLong(1))
    // binary metrics over (scenario, model) pairs: sense + spec items
    assert(nItems > 0 && nRatings >= 2 * nItems,
      s"pairable items need >=2 ratings each: $r")
    assert(!r.isNullAt(2) && math.abs(r.getDouble(2)) <= 1.0,
      s"alpha out of range on the hash panel: $r")
  }
}

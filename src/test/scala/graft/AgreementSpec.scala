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

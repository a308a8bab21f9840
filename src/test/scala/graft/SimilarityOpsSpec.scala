package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityOps

/** ANN quality pinned against the exact brute-force baseline. The
  * synthetic embeddings are near-orthogonal random vectors (hardest
  * case for LSH); on real near-duplicate vectors (cos >= 0.9) the
  * sign-bucket collision probability per table is far higher.
  */
class SimilarityOpsSpec extends SparkTestBase {

  private def q(name: String) =
    SimilarityOps.all.find(_.name == name).get.run(spark, sfDir)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id")

  test("brute-force knn: 5 ranked neighbors per query, sims descending, no self") {
    val b = q("q39_knn_brute")
    assert(b.count() == 50)
    assert(b.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val badOrder = b.groupBy("query_id")
      .agg(max(when(col("rank") === 1, col("sim"))).as("s1"),
        max(when(col("rank") === 5, col("sim"))).as("s5"))
      .filter(col("s1") < col("s5"))
    assert(badOrder.isEmpty)
  }

  test("multi-table LSH ANN recalls a useful fraction of true neighbors") {
    val b = pairs(q("q39_knn_brute"))
    val l = pairs(q("q40_ann_lsh"))
    assert(b.intersect(l).count() >= 15, "LSH recall collapsed (< 30%)")
  }

  test("IVF 2-probe recalls most true neighbors") {
    val b = pairs(q("q39_knn_brute"))
    val i = pairs(q("q41_ivf_centroids"))
    assert(b.intersect(i).count() >= 30, "IVF recall collapsed (< 60%)")
  }

  test("ANN outputs are well-formed top-k lists") {
    for (name <- Seq("q40_ann_lsh", "q41_ivf_centroids")) {
      val df = q(name)
      assert(df.filter(col("rank") < 1 || col("rank") > 5).isEmpty, name)
      assert(df.groupBy("query_id", "neighbor_id").count().filter(col("count") > 1).isEmpty,
        s"$name duplicated a neighbor")
    }
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Opq, Pq}

/** OPQ rotation (operators/Opq — Ge et al. 2013 OPQ-P): on an
  * ANISOTROPIC corpus (exponentially decaying per-dimension scales —
  * the PCA-ordered shape real embedding models emit) the balanced
  * eigenbasis rotation must cut the reconstruction radius, and with it
  * the auto shortlist's admitted-candidate volume, at recall >= 0.95.
  * Isotropic planted clusters would show nothing — PQ's subspace split
  * is already balanced there; the decay is what concentrates variance
  * into the first subspace and starves the rest. */
class OpqSpec extends SparkTestBase {

  private val Dim = VectorFunctions.Dim

  /** Clustered corpus with per-dimension scale exp(-j/10): dimension 0
    * carries ~600x the variance of dimension 63. `noise` relative to
    * the center spread: 0.05 = tight planted clusters (recall
    * fixtures), ~0.3 = partially overlapping (the admitted-volume
    * fixture — the error band must spill past the home cluster for
    * the margin to be the thing measured; at 0.05 the band saturates
    * at the whole cluster for any radius and measures nothing). */
  private def anisoCorpus(nVec: Int, nClusters: Int,
                          noise: Float = 0.05f): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(202)
    val scales = Array.tabulate(Dim)(j => math.exp(-j / 10.0).toFloat)
    val centers = Array.fill(nClusters)(
      Array.tabulate(Dim)(j => rnd.nextGaussian().toFloat * scales(j)))
    (0 until nVec).map { i =>
      val r2 = new scala.util.Random(i * 6007L + 17)
      val c = centers(i % nClusters)
      (i.toLong, Array.tabulate(Dim)(j =>
        c(j) + noise * scales(j) * r2.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def exactTopK(corpus: DataFrame, qPred: Column, k: Int): Map[Long, Set[Long]] = {
    val q = VectorFunctions.quantizeQ(col("embedding"))
    val base = corpus.select(col("vec_id"), q.as("qv"))
    val queries = base.filter(qPred)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"))
    broadcast(queries).join(base, col("vec_id") =!= col("query_id"))
      .withColumn("d2", aggregate(zip_with(col("qq"), col("qv"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("rotation is orthogonal: row dot products form the identity") {
    val corpus = anisoCorpus(600, 8)
    val rot = Opq.learnRotation(corpus, m = 8)
    val r = rot.map(_.toDouble).toArray
    for (i <- 0 until Dim; j <- i until Dim) {
      val dot = (0 until Dim).map(t => r(i * Dim + t) * r(j * Dim + t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-4,
        f"row $i · row $j = $dot%.6f, expected $expect")
    }
  }

  test("rotation preserves the metric: rotated exact top-k == original exact top-k") {
    val corpus = anisoCorpus(600, 8)
    val rot = Opq.learnRotation(corpus, m = 8)
    val k = 5
    val qPred = col("vec_id") < 6
    val orig = exactTopK(corpus, qPred, k)
    val rotd = exactTopK(Opq.rotate(corpus, rot), qPred, k)
    // overlap, not equality: float rounding of rotated coordinates can
    // flip genuinely-tied pairs
    val overlap = orig.map { case (q, t) =>
      rotd.getOrElse(q, Set.empty).intersect(t).size.toDouble / k
    }
    assert(overlap.sum / overlap.size >= 0.95,
      s"rotation distorted the metric: mean overlap ${overlap.sum / overlap.size}")
  }

  test("OPQ cuts reconErrMax and admitted volume at recall >= 0.95") {
    // partially-overlapping anisotropic clusters: the radius shrinks
    // under the rotation (residual structure is cluster noise ⊙
    // scales — measured NOT true of a single pure exp-decay cloud,
    // where the MAX error is a tail statistic the mean-optimizing
    // rotation can slightly worsen) AND the band spills past the home
    // cluster, so admitted volume responds to the margin
    val corpus = anisoCorpus(2000, 16, noise = 0.3f)
    val m = 8; val ksub = 64; val cells = 8
    val plain = Pq.train(corpus, cells, m, ksub, seed = 42L)
    val opq = Opq.train(corpus, cells, m, ksub, seed = 42L)

    val rPlain = Pq.reconErrMax(corpus, plain)
    val rOpq = Opq.reconErrMax(corpus, opq)
    assert(rOpq < rPlain,
      s"OPQ did not cut the reconstruction radius: $rOpq vs $rPlain")

    val k = 10
    val qPred = col("vec_id") < 16
    def admitted(c: DataFrame, model: Pq.PqModel, rmax2: Long): Long = {
      val idx = Pq.encode(c, model).select(col("vec_id"), col("cell"), col("pq"))
      Pq.autoAdmittedCounts(idx, c, model, qPred, k, probes = cells, rmax2 = rmax2)
        .agg(sum(col("n_admitted"))).collect()(0).getLong(0)
    }
    val volPlain = admitted(corpus, plain, rPlain)
    val volOpq = admitted(Opq.rotate(corpus, opq.rot), opq.pq, rOpq)
    info(s"admitted volume: plain $volPlain, opq $volOpq " +
      s"(radius $rPlain -> $rOpq)")
    assert(volOpq < volPlain,
      s"OPQ did not shrink the admitted volume: $volOpq vs $volPlain")

    val got = Opq.searchAdcRerank(corpus, opq, qPred, k, probes = cells)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = exactTopK(corpus, qPred, k)
    val recalls = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.95, f"OPQ recall $mean%.3f < 0.95")
  }
}

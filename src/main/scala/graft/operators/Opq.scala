package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.Dim
import graft.plans.MatVecF

/** OPQ: an orthogonal pre-rotation in front of IVF-PQ (Ge et al.,
  * CVPR 2013, "Optimized Product Quantization" — the parametric
  * OPQ-P variant: PCA eigenbasis + eigenvalue-balanced allocation of
  * principal directions to the m subspaces). PQ quantizes each
  * subspace independently, so its error is worst when variance is
  * concentrated in a few correlated dimensions that land in one
  * subspace; rotating into the eigenbasis decorrelates, and balancing
  * the per-subspace variance products equalizes what each 256-entry
  * codebook must cover. A smaller reconstruction error feeds straight
  * into the auto shortlist: the error band's margin is 2·√reconErrMax,
  * so a tighter rotation admits fewer candidates at the same provable
  * recall ([[Pq.autoAdmittedCounts]] is the measurement surface).
  *
  * Spark shape: the rotation is LEARNED in one covariance pass
  * (treeAggregate via RowMatrix — a 64×64 grammian, driver-side
  * eigendecomposition of a tiny matrix) and APPLIED as one native
  * codegen expression per row ([[graft.plans.MatVecF]] — the matrix
  * rides as a referenced float[], the loop is constant-size generated
  * code). Everything downstream — train, encode, persisted index,
  * streaming ingest, ADC search — is unchanged [[Pq]] machinery over
  * the rotated vectors: an orthogonal rotation preserves L2 exactly,
  * so the quantized-metric search semantics carry over (up to float
  * rounding of the rotated coordinates).
  */
object Opq {

  /** A rotation + the PQ model trained in the rotated space. */
  final case class OpqModel(rot: Seq[Float], pq: Pq.PqModel)

  /** Rotate the corpus's embedding column (vec_id and the rest pass
    * through). One codegen'd matrix-vector product per row. */
  def rotate(corpus: DataFrame, rot: Seq[Float]): DataFrame =
    corpus.withColumn("embedding", MatVecF(col("embedding"), rot, Dim))

  /** Learn the OPQ-P rotation: eigen-decompose the corpus covariance
    * (one distributed pass; the 64×64 solve is driver arithmetic),
    * then deal the principal directions — largest eigenvalue first —
    * onto the subspace with the smallest accumulated log-variance
    * product that still has a free slot (the greedy balanced
    * allocation from the paper). Row-major Dim×Dim, orthogonal by
    * construction (rows are eigenvectors of a symmetric matrix). */
  def learnRotation(corpus: DataFrame, m: Int): Seq[Float] = {
    require(Dim % m == 0, s"m=$m must divide Dim=$Dim")
    import org.apache.spark.mllib.linalg.Vectors
    import org.apache.spark.mllib.linalg.distributed.RowMatrix
    val rm = new RowMatrix(corpus.select(col("embedding")).rdd
      .map(r => Vectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray)))
    val cov = rm.computeCovariance()
    val bm = breeze.linalg.DenseMatrix.tabulate(Dim, Dim)((i, j) => cov(i, j))
    val es = breeze.linalg.eigSym(bm)
    val byVar = (0 until Dim)
      .map(i => (es.eigenvalues(i), es.eigenvectors(::, i).toArray))
      .sortBy { case (v, _) => -v }
    val dsub = Dim / m
    val binLog = Array.fill(m)(0.0)
    val binN = Array.fill(m)(0)
    val rows = Array.ofDim[Array[Double]](Dim)
    byVar.foreach { case (v, vec) =>
      val b = (0 until m).filter(binN(_) < dsub).minBy(binLog)
      rows(b * dsub + binN(b)) = vec
      binN(b) += 1
      // log-product balancing; clamp so a zero/negative-noise
      // eigenvalue can't produce -inf and pin every later direction
      // to one bin
      binLog(b) += math.log(math.max(v, 1e-12))
    }
    rows.flatMap(_.map(_.toFloat)).toSeq
  }

  /** Learn rotation + train PQ in the rotated space. */
  def train(corpus: DataFrame, cells: Int, m: Int = 8, ksub: Int = 256,
            seed: Long = 42L): OpqModel = {
    val rot = learnRotation(corpus, m)
    OpqModel(rot, Pq.train(rotate(corpus, rot), cells, m, ksub, seed))
  }

  /** The auto-shortlist rerank search in the rotated space: exact
    * same guarantees as [[Pq.searchAdcRerank]], against the rotated
    * metric (== the original L2 metric, rotation being orthogonal). */
  def searchAdcRerank(corpus: DataFrame, model: OpqModel, queryPred: Column,
                      k: Int, probes: Int = 2, shortlist: Int = 0): DataFrame =
    Pq.searchAdcRerank(rotate(corpus, model.rot), model.pq, queryPred, k,
      probes, shortlist)

  /** [[Pq.reconErrMax]] of the rotated corpus — the statistic the OPQ
    * rotation exists to shrink. */
  def reconErrMax(corpus: DataFrame, model: OpqModel): Long =
    Pq.reconErrMax(rotate(corpus, model.rot), model.pq)
}

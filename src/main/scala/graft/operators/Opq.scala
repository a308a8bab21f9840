package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  // ── Persisted index (round 18) ────────────────────────────────────
  //
  // The round-17 composition gap: OPQ wrapped only the in-memory
  // paths, so a deployment wanting the tighter error band had to
  // hand-rotate the corpus, the stream AND the queries while keeping
  // `rot` out-of-band — exactly the statistic-staleness shape the
  // radius sidecar fixed for reconErrMax. Mirror it: the index itself
  // carries its model. `<prefix>_model` is a third sidecar table (one
  // row: rotation + coarse centroids + codebook — bounded by the same
  // literal-inlinable contract that lets them broadcast), written at
  // build time, so a search session needs NOTHING out-of-band: codes,
  // radius and model all come off the catalog, and every reader/writer
  // surface below rotates internally against the PERSISTED rotation.

  /** A persisted OPQ'd IVF-PQ index: the (rotated-space) bucketed
    * codes table + radius sidecar of [[Pq.PqIndex]], plus the frozen
    * model that defines the rotated space. */
  final case class OpqIndex(codes: DataFrame, rmax2: Long, model: OpqModel)

  private def modelTable(prefix: String) = s"${prefix}_model"

  /** BUILD the deployment index in the rotated space: persist the
    * model sidecar, then delegate the rotated corpus to
    * [[Pq.buildIndex]] (bucketed codes + radius sidecar — the radius
    * is the ROTATED-space [[Pq.reconErrMax]], which is the bound the
    * error band needs because search scores in that space too). */
  def buildIndex(corpus: DataFrame, model: OpqModel, basePath: String,
                 prefix: String = "graft_opqidx", buckets: Int = 32): OpqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS ${modelTable(prefix)}")
    // overwrite: a REBUILD's DROP leaves the external files behind
    // (the Pq.buildIndex meta lesson)
    Seq((model.rot, model.pq.m, model.pq.ksub, model.pq.codebook, model.pq.coarse))
      .toDF("rot", "m", "ksub", "codebook", "coarse")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$basePath/model").saveAsTable(modelTable(prefix))
    val p = Pq.buildIndex(rotate(corpus, model.rot), model.pq,
      basePath, prefix, buckets)
    OpqIndex(p.codes, p.rmax2, model)
  }

  /** The persisted index re-resolved through the catalog — codes +
    * radius via [[Pq.readIndex]], the model off its sidecar. A search
    * session holding only the prefix gets everything. */
  def readIndex(spark: SparkSession, prefix: String = "graft_opqidx"): OpqIndex = {
    spark.catalog.refreshTable(modelTable(prefix))
    val r = spark.table(modelTable(prefix)).collect()(0)
    val model = OpqModel(
      r.getSeq[Float](0),
      Pq.PqModel(r.getInt(1), r.getInt(2),
        r.getSeq[Row](4).map(cr => (cr.getLong(0), cr.getSeq[Float](1))).toSeq,
        r.getSeq[Long](3)))
    val p = Pq.readIndex(spark, prefix)
    OpqIndex(p.codes, p.rmax2, model)
  }

  /** INDEX GROWTH: rotate the delta against the PERSISTED rotation and
    * delegate to [[Pq.appendIndex]] (same at-least-once contract; the
    * appended radius row is the delta's rotated-space reconErrMax).
    * The caller's model must BE the persisted model — PQ code words are
    * meaningless under any other codebook/rotation, and a mismatched
    * append corrupts the index permanently — so this verifies against
    * the sidecar (one bounded single-row read per call) instead of
    * trusting the argument. */
  def appendIndex(delta: DataFrame, model: OpqModel,
                  prefix: String = "graft_opqidx", buckets: Int = 32): Unit = {
    val persisted = readIndex(delta.sparkSession, prefix).model
    require(persisted == model,
      s"appendIndex model mismatch: the persisted ${modelTable(prefix)} sidecar " +
        "disagrees with the caller's model — appending under a different " +
        "rotation/codebook would corrupt the index (rebuild under a new " +
        "prefix instead, the blue/green retrain contract)")
    Pq.appendIndex(rotate(delta, model.rot), model.pq, prefix, buckets)
  }

  /** NIGHTLY COMPACTION — [[Pq.compactIndex]] verbatim (codes rows are
    * opaque to the rotation; the model sidecar is already one row). */
  def compactIndex(spark: SparkSession, compactPath: String,
                   prefix: String = "graft_opqidx", buckets: Int = 32): OpqIndex = {
    Pq.compactIndex(spark, compactPath, prefix, buckets)
    readIndex(spark, prefix)
  }

  /** DEPLOYMENT SEARCH: rotate the query/rerank corpus against the
    * index's own rotation, then [[Pq.searchIndex]] — bucket-pruned
    * probe scan, sidecar radius, candidate dedup, exact refine (in the
    * rotated metric == the original L2 metric, rotation being
    * orthogonal). No model argument: the index is self-describing. */
  def searchIndex(idx: OpqIndex, corpus: DataFrame, queryPred: Column,
                  k: Int, probes: Int = 2): DataFrame =
    Pq.searchIndex(Pq.PqIndex(idx.codes, idx.rmax2),
      rotate(corpus, idx.model.rot), idx.model.pq, queryPred, k, probes)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): fit hashed-n-gram bag models of a TARGET subset and
  * the RAW corpus, weight every raw document by the log-likelihood
  * ratio of its features, and draw a deterministic Gumbel top-m
  * sample — the standard recipe for skewing a 100 TB crawl toward a
  * high-quality target distribution without training a classifier.
  *
  * House split (the q58 regression-head precedent): the MODEL — the
  * per-bucket integer occurrence counts, i.e. everything data-shaped
  * — is the oracle-checked surface (q76: exact int64 counts on the
  * 48-bit-md5 hash stream, byte-reproducible in DuckDB); the float
  * tail (log-ratio weights + Gumbel keys, transcendental and
  * therefore not cross-engine hash-stable) is spec-gated:
  * hand-computed weights, run-to-run determinism, and the
  * planted-preference property.
  *
  * Scale shape: model fitting is explode → one bucket-keyed hash
  * aggregation (map-side combine over NumBuckets=1024 keys — the
  * shuffle is at most partitions × 1024 rows regardless of corpus
  * size); scoring re-derives the feature stream (scans are cheap,
  * state is not), joins the BROADCAST 1024-row model, and sums
  * per-doc — one doc_id-keyed exchange with partial aggregation.
  * Selection is TakeOrdered top-m, no global sort. Nothing driver-
  * side except the two model-total scalars (bounded by construction).
  */
object Dsir {

  /** Feature-bucket count: hashed word unigrams + bigrams, the DSIR
    * paper's feature map at k = 1024 buckets. */
  val NumBuckets = 1024L

  /** The per-document feature-bucket stream: 48-bit md5 of each word
    * 1-gram and 2-gram mod [[NumBuckets]] (duplicates kept — bag,
    * not set, semantics). Input must be trim'd. Round 13: ONE native
    * byte pass ([[graft.plans.UniBiBuckets]] — the previous
    * concat-of-two-ShingleHashes form scanned the text twice);
    * property-pinned equal to the composed form. */
  def featureBuckets(trimmed: Column): Column =
    graft.plans.UniBiBuckets(trimmed, NumBuckets)

  /** The fitted DSIR model — q76's oracle surface. One row per
    * occupied bucket: occurrences in the target subset and in the
    * whole raw corpus (target ⊆ raw, the paper's setting when the
    * target is an in-corpus exemplar slice). */
  def bucketModel(docs: DataFrame, targetPred: Column): DataFrame =
    docs
      .select(targetPred.as("is_t"),
        explode(featureBuckets(trim(col("text")))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("n_target"),
        count(lit(1)).as("n_raw"))

  /** Importance-weight every document: logw = Σ_occurrences
    * [ln(n_t[b]+1) − ln(D_t+k) − ln(n_r[b]+1) + ln(D_r+k)] — the
    * add-one-smoothed multinomial log-likelihood ratio. The
    * normalizer terms stay INSIDE the per-occurrence sum (they scale
    * with the document's own feature count, so they do affect
    * cross-document ranking — dropping them as "constants" is the
    * classic bug). Documents with no features (empty text still
    * yields the empty-string unigram, so only NULL text) keep
    * logw = 0. */
  def logWeights(docs: DataFrame, targetPred: Column): DataFrame = {
    // the model is ≤ NumBuckets rows by construction — collect it
    // ONCE and re-emit as a local relation, so the fit pays one
    // corpus scan, not two (one for the totals, one recomputed
    // lazily under the scoring join)
    val rows = bucketModel(docs, targetPred).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(rows.nonEmpty,
      "Dsir.logWeights: empty bucket model (empty corpus or all-NULL text)")
    val dt = rows.map(_._2).sum.toDouble + NumBuckets
    val dr = rows.map(_._3).sum.toDouble + NumBuckets
    val spark = docs.sparkSession
    import spark.implicits._
    val lr = rows.toSeq.map { case (b, nt, nr) =>
      (b, math.log(nt + 1.0) - math.log(dt) - math.log(nr + 1.0) + math.log(dr))
    }.toDF("bucket", "lr")
    docs.select(col("doc_id"))
      .join(
        docs.select(col("doc_id"),
          explode(featureBuckets(trim(col("text")))).as("bucket"))
          .join(broadcast(lr), Seq("bucket"))
          .groupBy(col("doc_id")).agg(sum(col("lr")).as("logw")),
        Seq("doc_id"), "left")
      .na.fill(0.0, Seq("logw"))
  }

  /** Deterministic Gumbel top-m sample ∝ exp(logw): g = logw −
    * ln(−ln(u)) with u a seeded md5 uniform in (0,1) — the
    * [[TrainTestSplit]] discipline, reproducible across runs and
    * partitionings. Returns the selected docs ordered by the Gumbel
    * key (desc), doc_id breaking exact ties. */
  def select(docs: DataFrame, targetPred: Column, m: Int,
             seed: Long = 42L): DataFrame = {
    val u = (conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 12), 16, 10).cast("double") + 1.0) /
      (math.pow(2, 48) + 2.0)
    logWeights(docs, targetPred)
      .withColumn("gumbel", col("logw") - log(-log(u)))
      .orderBy(col("gumbel").desc, col("doc_id"))
      .limit(m)
  }
}

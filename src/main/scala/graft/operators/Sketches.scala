package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based distinct counting — the cardinality-estimation tier
  * a 100 TB pipeline uses where exactness isn't worth the shuffle.
  *
  * The house split, applied to sketches: the EXACT per-group
  * distinct count is the oracle surface (q91 — both engines compute
  * the same integers); the HyperLogLog++ variant cannot be
  * cross-engine (sketch layouts differ), so it is SPEC-GATED against
  * the exact counts with the estimator's error contract.
  *
  * Why the sketch exists at all: an exact count-distinct is a
  * two-phase aggregation whose exchange carries EVERY distinct key
  * (at 10^11 docs, the fingerprint universe itself); the HLL++
  * aggregate is a fixed-size mergeable buffer per group, combined
  * map-side like any partial aggregate, so the exchange carries
  * #groups × sketch-bytes regardless of corpus size. The same
  * trade-off and the same buffer Spark exposes as
  * `approx_count_distinct` — no custom expression needed, which is
  * the point: the declarative form IS the scale form.
  */
object Sketches {

  private def fp: Column =
    graft.functions.TextFunctions.fingerprint(col("text"))

  /** EXACT distinct normalized fingerprints per source — q91's
    * oracle surface (plus the total row count for the dup-rate
    * denominator). */
  def distinctBySource(docs: DataFrame): DataFrame =
    docs.select(col("source"), fp.as("fpv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fpv")).as("n_distinct"))

  /** HLL++ estimate of the same table at the given relative standard
    * deviation. Spec-gated ([[graft]] DedupOpsSpec): per-source
    * estimates within a few rsd of the exact counts, deterministic
    * across partitionings (the sketch merge is commutative). */
  def approxDistinctBySource(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs.select(col("source"), fp.as("fpv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fpv"), rsd).as("n_distinct_est"))
}

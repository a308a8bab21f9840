package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic train/valid/test split (reference:
  * finetune_prep.py:172-176 — a seeded shuffle; re-expressed as a
  * salted-hash bucket so the assignment is a pure per-row function:
  * no shuffle, no global sort, stable under any partitioning and any
  * cluster size — the property that actually matters at 100 TB).
  */
object TrainTestSplit {

  /** Adds `bucket` (0..9) and `split` (8/1/1 train/valid/test). */
  def apply(df: DataFrame, idCol: String, salt: String = "split"): DataFrame =
    df.withColumn("bucket", TextFunctions.hashBucket(col(idCol), salt, 10))
      .withColumn("split",
        when(col("bucket") < 8, "train")
          .when(col("bucket") === 8, "valid")
          .otherwise("test"))

  /** LEAKAGE-FREE split (q95): the per-row hash split applied to the
    * near-dup CLUSTER id instead of the document id, so every member
    * of a duplicate family lands on the SAME side — the dedup-aware
    * split a benchmark needs (a per-doc split puts one copy of a
    * near-dup pair in train and its twin in test, and the eval
    * silently measures memorization; the cross-validation
    * group-split discipline applied to corpora). `group_key` =
    * cluster id for clustered docs ([[ConnectedComponents.clusters]]
    * over any pair source), the doc's own id otherwise; the split
    * stays a pure function of the key (no shuffle beyond the
    * cluster join, stable under any partitioning). */
  def leakageFree(docs: DataFrame, pairs: DataFrame,
                  idCol: String = "doc_id",
                  salt: String = "split"): DataFrame = {
    val cl = ConnectedComponents.clusters(pairs)
    val keyed = docs.join(cl, docs(idCol) === cl("node"), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col(idCol)))
      .drop("node", "cluster_id")
    TrainTestSplit(keyed, "group_key", salt)
  }
}

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
}

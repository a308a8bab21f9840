package graft

import org.apache.spark.sql.functions._

import graft.queries.EvalOps

/** EvalOps.mergePredictions — the REAL-file q63 path (reference:
  * results/merge_results.py:62-112): variant tables whose values are
  * NOT derivable from the canonical side, drop-if-any-missing, and
  * the broadcast-while-small / shuffle-when-large join planning.
  */
class MergePredictionsSpec extends SparkTestBase {
  import spark.implicits._

  // Arbitrary predictions — NOT functions of cmd_id (the q63 stand-in
  // collapse must not apply here).
  private def canonical = Seq(
    (1L, "gold-a"), (2L, "gold-b"), (3L, "gold-c"), (4L, "gold-d"), (5L, "gold-e")
  ).toDF("cmd_id", "gold")

  private def variants = Seq(
    // covers 1,2,3,4 (misses 5)
    "prediction_full" -> Seq((1L, "pf-one"), (2L, "pf-two"), (3L, "pf-three"), (4L, "pf-four"))
      .toDF("cmd_id", "prediction_full"),
    // covers 1,3,4,5 (misses 2), plus a key 9 absent from canonical
    "prediction_nostate" -> Seq((1L, "pn-x"), (3L, "pn-y"), (4L, "pn-z"), (5L, "pn-w"), (9L, "pn-orphan"))
      .toDF("cmd_id", "prediction_nostate"),
    // covers 1,2,3,4,5 and carries an extra column that must be dropped
    "prediction_fewshot_full" -> Seq(
      (1L, "ff-1", "junk"), (2L, "ff-2", "junk"), (3L, "ff-3", "junk"),
      (4L, "ff-4", "junk"), (5L, "ff-5", "junk"))
      .toDF("cmd_id", "prediction_fewshot_full", "debug_info"))

  test("drop-if-any-missing inner merge attaches every variant column") {
    val out = EvalOps.mergePredictions(canonical, variants)
      .orderBy("cmd_id")
    // rows 2 (missing nostate) and 5 (missing full) drop; 9 never appears
    assert(out.columns.toSeq === Seq("cmd_id", "gold",
      "prediction_full", "prediction_nostate", "prediction_fewshot_full"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.toSeq === Seq(
      (1L, "gold-a", "pf-one", "pn-x", "ff-1"),
      (3L, "gold-c", "pf-three", "pn-y", "ff-3"),
      (4L, "gold-d", "pf-four", "pn-z", "ff-4")))
  }

  test("small variants broadcast; a corpus-scale variant falls back to a shuffled join") {
    val smallPlan = EvalOps.mergePredictions(canonical, variants)
      .queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"),
      s"small variant tables should broadcast:\n$smallPlan")
    assert(!smallPlan.contains("NestedLoop") && !smallPlan.contains("Cartesian"),
      s"merge planned a nested-loop/cartesian join:\n$smallPlan")

    val bigCanonical = spark.range(0, 3000000)
      .select(col("id").as("cmd_id"), concat(lit("g"), col("id")).as("gold"))
    val bigVariant = spark.range(0, 3000000)
      .select(col("id").as("cmd_id"),
        concat(lit("p"), sha2(col("id").cast("string"), 256)).as("prediction_full"))
    val bigPlan = EvalOps.mergePredictions(bigCanonical, Seq("prediction_full" -> bigVariant))
      .queryExecution.executedPlan.toString
    assert(bigPlan.contains("SortMergeJoin") || bigPlan.contains("ShuffledHashJoin"),
      s"corpus-scale variant should shuffle, not broadcast/BNL:\n$bigPlan")
  }
}

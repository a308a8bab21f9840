package graft

import graft.queries.{DatasetOps, EventOps}

/** Round-17 fused single-exchange candidates for the two argued band
  * rows (q15 author-filter, q56 heuristic-profile): the
  * plans.UserFlagFold object aggregate folds the per-user level into
  * the instance aggregation. Gates: bit-identical output vs the
  * shipping two-level forms, and the plan really does drop one
  * exchange (that being the entire point — the A/B in BENCH_SF10.md
  * decides which ships). */
class FusedAggSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** Exchange count of a FRESHLY-BUILT plan under AQE off: a
    * DataFrame whose queryExecution already materialized under AQE
    * shows an AdaptiveSparkPlanExec wrapper with zero walkable
    * exchanges — the plan must be constructed inside the conf
    * window. */
  private def exchanges(mk: => org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      mk.queryExecution.executedPlan.collect {
        case _: ShuffleExchangeExec => 1
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q15 fused: output identical, one exchange fewer") {
    val base = SparkEntry.queries("q15_author_filter")(spark, sfDir)
    val fused = EventOps.q15Fused(spark, sfDir)
    assert(rows(fused) == rows(base), "q15 fused output diverged")
    // names+types, not nullability: count/struct-field aggregates are
    // non-nullable where sum is nullable — values are identical and
    // the oracle compare reads (name, type, value)
    assert(fused.schema.map(f => (f.name, f.dataType)) ==
      base.schema.map(f => (f.name, f.dataType)), "q15 fused schema diverged")
    val eb = exchanges(SparkEntry.queries("q15_author_filter")(spark, sfDir))
    val ef = exchanges(EventOps.q15Fused(spark, sfDir))
    assert(ef == eb - 1, s"q15 fused should drop one exchange: base $eb fused $ef")
  }

  test("q56 fused: output identical, one exchange fewer") {
    val base = SparkEntry.queries("q56_heuristic_profile")(spark, sfDir)
    val fused = DatasetOps.q56Fused(spark, sfDir)
    assert(rows(fused) == rows(base), "q56 fused output diverged")
    assert(fused.schema.map(f => (f.name, f.dataType)) ==
      base.schema.map(f => (f.name, f.dataType)), "q56 fused schema diverged")
    val eb = exchanges(SparkEntry.queries("q56_heuristic_profile")(spark, sfDir))
    val ef = exchanges(DatasetOps.q56Fused(spark, sfDir))
    assert(ef == eb - 1, s"q56 fused should drop one exchange: base $eb fused $ef")
  }

  test("UserFlagFold: null users counted into flagged messages, not distincts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: flagged (bit2) with 2 msgs; user 2: unflagged, 1 msg;
    // null user: flagged (bit1) with 3 msgs
    val df = Seq[(java.lang.Long, Int, Boolean)](
      (1L, 2, false), (1L, 0, true), (1L, 0, true),
      (2L, 0, true),
      (null, 1, false), (null, 0, true), (null, 0, true), (null, 0, true))
      .toDF("u", "b", "m")
    val r = df.agg(graft.plans.UserFlagFold.fold(col("u"), col("b"), col("m")).as("f"))
      .select("f.n_users", "f.n_flag1", "f.n_flag2", "f.msgs_flagged")
      .collect()(0)
    assert(r.getLong(0) == 2, "distinct users must skip null")
    assert(r.getLong(1) == 0)
    assert(r.getLong(2) == 1)
    assert(r.getLong(3) == 5, "flagged msgs = user1's 2 + null user's 3")
  }
}

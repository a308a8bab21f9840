package graft

/** q03's broadcast-vs-co-shuffle dial (Relational.scala): the probe
  * (year-filtered orders ⋈ customer/nation/region, 3 slim columns) is
  * broadcast into lineitem only while its Catalyst size estimate is
  * under `spark.graft.q03.probeBroadcastMaxBytes`. This spec pins BOTH
  * sides of the dial:
  *   - default gate (sf0.001 probe ≪ 256 MiB): the lineitem join is a
  *     broadcast join — zero fact-table exchanges before the 25-row
  *     aggregate;
  *   - gate forced to 0 (the cluster-scale posture where one year of
  *     orders exceeds the driver): the same tree plans as ONE lineitem
  *     co-shuffle (a shuffle join on l_orderkey = o_orderkey), NOT the
  *     3-exchange left-deep chain the inside-out rewrite replaced;
  *   - the two paths return IDENTICAL rows, so flipping the dial at
  *     deployment can never change an answer.
  */
class Q03DialSpec extends SparkTestBase {

  private val GateKey = "spark.graft.q03.probeBroadcastMaxBytes"
  private def q03 = SparkEntry.queries("q03_regional_revenue")

  test("under the gate the probe broadcasts: zero lineitem shuffles") {
    spark.conf.unset(GateKey)
    val plan = q03(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the probe broadcast into lineitem:\n$plan")
    // the only exchange allowed below the aggregate is the 25-row
    // aggregate's own; the fact stream itself must not shuffle
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"fact-side shuffle join planned under the gate:\n$plan")
  }

  test("over the gate the same tree plans as ONE lineitem co-shuffle") {
    // gate=0 says "the probe exceeds the driver"; at sf0.001 the
    // PLANNER would still broadcast the toy-sized fact side on its
    // own, so disable auto-broadcast to reproduce the cluster-scale
    // posture the dial exists for — the EXPLICITLY hinted dimension
    // joins (nation/region/cAsia/supplier) are unaffected.
    spark.conf.set(GateKey, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = q03(spark, sfDir).queryExecution.executedPlan.toString
      assert(exec.contains("SortMergeJoin") || exec.contains("ShuffledHashJoin"),
        s"expected a shuffle join on l_orderkey with the gate at 0:\n$exec")
      // exactly ONE shuffle join: lineitem ⋈ probe on l_orderkey — the
      // dimension collapse and the supplier join stay broadcast
      val shuffleJoins =
        "SortMergeJoin|ShuffledHashJoin".r.findAllIn(exec).size
      assert(shuffleJoins == 1,
        s"expected exactly 1 shuffle join, found $shuffleJoins:\n$exec")
    } finally {
      spark.conf.unset(GateKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("both dial positions return identical rows") {
    spark.conf.unset(GateKey)
    val bc = q03(spark, sfDir).collect().toSeq
    spark.conf.set(GateKey, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sh = q03(spark, sfDir).collect().toSeq
      assert(bc == sh, "dial changed the answer")
      assert(bc.nonEmpty, "q03 returned no rows at sf0.001")
    } finally {
      spark.conf.unset(GateKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

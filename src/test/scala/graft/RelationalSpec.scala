package graft

import graft.queries.Relational

class RelationalSpec extends SparkTestBase {

  test("all relational queries execute and are non-empty") {
    for (q <- Relational.all) {
      val df = q.run(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q01 pricing summary groups by (returnflag, linestatus)") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "count_order"))
  }

  test("q02 top revenue returns at most 10 ordered rows") {
    val rows = SparkEntry.queries("q02_top_revenue")(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("every oracle query name has a run entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() smoke") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

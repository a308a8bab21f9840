package graft

import org.apache.spark.sql.functions._

import graft.queries.{OrderOps, PipelineOps}

/** Composition invariants for the round-12 ordering/selection tier
  * and the q96 capstone — the properties the oracles verify only
  * implicitly (the oracle checks the VALUES; these check the
  * structural claims a consumer relies on). */
class OrderPipelineSpec extends SparkTestBase {

  private def q(name: String) =
    (OrderOps.all ++ PipelineOps.all).find(_.name == name).get.run(spark, sfDir)

  test("q98: pos is a permutation of 1..N, phases non-decreasing, in-phase order") {
    val rows = q("q98_curriculum_order")
      .orderBy(col("pos")).collect()
    val n = rows.length
    assert(rows.map(_.getLong(3)).toSeq == (1L to n).toSeq,
      "pos is not the dense 1..N numbering")
    val phases = rows.map(_.getLong(1))
    assert(phases.zip(phases.tail).forall { case (a, b) => a <= b },
      "curriculum phases must be non-decreasing along the stream")
    rows.groupBy(_.getLong(1)).values.foreach { g =>
      val keys = g.sortBy(_.getLong(3)).map(r => (r.getLong(2), r.getLong(0)))
      assert(keys.sameElements(keys.sortBy(identity)),
        "within a phase the order must be (skey, doc_id)")
    }
  }

  test("q99: per-source ranks are the kept prefix and the budget is a floor") {
    val rows = q("q99_token_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val byRank = g.sortBy(_._4)
      // kept set is exactly ranks 1..k (a PREFIX of the quality order)
      assert(byRank.map(_._4).toSeq == (1L to g.length).toSeq,
        s"$src kept a non-prefix of the quality ranking")
      // running sum is consistent and every kept doc started under budget
      var cum = 0L
      byRank.foreach { case (_, _, tok, _, cumBefore) =>
        assert(cumBefore == cum, s"$src cum_before drifted")
        assert(cumBefore < OrderOps.Budget)
        cum += tok
      }
      // floor semantics: the kept prefix reaches the budget (unless
      // the source ran out of documents entirely — then everything
      // is kept and the total may sit under it)
      assert(cum >= OrderOps.Budget || byRank.length == g.length)
    }
  }

  test("q96: bins are contiguous, bench docs excluded, fill bounded by capacity+straddle") {
    val rows = q("q96_pretrain_capstone").orderBy(col("bin")).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq,
      "bins must be the contiguous 0..B-1 sequence")
    // the clean stage unions the RAW bench sliver only for window
    // extraction — no benchmark doc may reach the packed stream
    assert(rows.map(_.getLong(3)).min >= PipelineOps.BenchDocs,
      "a benchmark doc id leaked into the packed training stream")
    // concat-and-chunk: every bin except the last holds >= Capacity
    // tokens only via a straddling doc; a bin's sum can't exceed
    // capacity + the straddling doc's own tokens. Weak but real
    // bound: no bin is empty and every non-final bin's cumulative
    // fill reaches its boundary.
    assert(rows.forall(_.getLong(1) > 0), "empty bin in the packed stream")
    val cums = rows.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    cums.dropRight(1).zipWithIndex.foreach { case (c, i) =>
      assert(c >= (i + 1) * PipelineOps.Capacity,
        s"bin $i closed before its token boundary")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack
import graft.queries.PackOps

/** Sequence packing + mixture sampling semantics beyond the oracle. */
class PackSpec extends SparkTestBase {

  test("withBin == the sequential prefix-sum reference, incl. zero-token docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, if (i % 17 == 0) 0L else rnd.nextInt(900).toLong + 1))
    val df = rows.toDF("doc_id", "tok").repartition(8) // scattered input
    val got = SequencePack.withBin(df, col("tok"), Seq(col("doc_id")), capacity = 1000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.map { case (id, t) =>
      val bin = acc / 1000L; acc += t; id -> bin
    }.toMap
    assert(got == want, "bin assignment diverged from the sequential reference")
  }

  test("packing never plans a SinglePartition exchange") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 50)).toDF("doc_id", "tok")
    val out = SequencePack.withBin(df, col("tok"), Seq(col("doc_id")), 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global cumsum fell back to a single partition:\n$plan")
  }

  test("mixture copies respect the per-language weights and are deterministic") {
    val q = PackOps.all.find(_.name == "q68_mixture_sample").get
    val out = q.run(spark, sfDir).cache()
    val per = out.groupBy("doc_id", "lang_pred").agg(max(col("copy")).as("n"))
    assert(per.filter(col("lang_pred") === "en" && (col("n") < 1 || col("n") > 2)).isEmpty,
      "en docs must get 1 or 2 copies (w=1.5)")
    assert(per.filter(col("lang_pred") === "other" && col("n") =!= 1).isEmpty,
      "surviving other docs carry exactly 1 copy (w=0.25)")
    // the fractional gates actually bite: some en doc has 2 copies and
    // the other-language survivor rate is well under 100%
    assert(per.filter(col("lang_pred") === "en" && col("n") === 2).count() > 0)
    val a = out.collect().map(_.toString).sorted.toSeq
    val b = q.run(spark, sfDir).collect().map(_.toString).sorted.toSeq
    assert(a == b, "mixture sample must be run-to-run deterministic")
  }
}

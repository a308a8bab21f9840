package graft

import org.apache.spark.sql.functions._

import graft.operators.Curriculum

/** Dev soak probe (test scope): the q99 token-budget PRE-PRUNE at the
  * 5M decade — the round-12 verdict's one `weak` row, closed in round
  * 13. One deliberately GIANT source (90% of the corpus) plus a tail
  * of small ones: without the prune the giant source's exact
  * running-sum window sorts 4.5M docs on one task chain; with it the
  * window input must be bounded near the budget (the sliver), and the
  * kept set must equal the exact form's row for row.
  *
  * Usage: sbt "Test/runMain graft.SoakOrder [docs]"; results recorded
  * in BENCH_SF10.md.
  */
object SoakOrder {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 90% giant source, 10% across 64 small sources; score is a
    // salted-hash double (spread out — the prune's favorable regime,
    // and the honest one: a real quality score is near-continuous),
    // token counts 1..40
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 9, lit("giant"))
        .otherwise(concat(lit("s"), (col("id") % 64).cast("string"))).as("source"),
      (conv(substring(md5(concat(lit("q:"), col("id").cast("string"))), 1, 12),
        16, 10).cast("long") % 1000000L).cast("double").as("qs"),
      (col("id") % 40 + 1).as("tok"))
      .transform(graft.operators.Pin(_, eager = true))
    println(s"SOAK order docs ${docs.count()}")

    val budget = 100000L // ~5k docs of the giant source at avg tok ~20

    val sliver = timed("pruneSliver (histogram + cut)")(
      Curriculum.pruneSliver(docs, budget, "source", 4096))
    val sliverBySrc = sliver.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("tok")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val giant = sliverBySrc("giant")
    println(s"SOAK order giant-source sliver ${giant._1} docs / ${giant._2} tokens " +
      s"(budget $budget; source holds ${n * 9 / 10} docs) -> " +
      f"window input is ${giant._2.toDouble / budget}%.2fx budget")

    val pruned = timed("tokenBudget prePrune=true")(
      Curriculum.tokenBudget(docs, budget, col("qs"), col("tok"),
        prePrune = true).transform(graft.operators.Pin(_, eager = true)))
    val exact = timed("tokenBudget prePrune=false (exact window)")(
      Curriculum.tokenBudget(docs, budget, col("qs"), col("tok"),
        prePrune = false).transform(graft.operators.Pin(_, eager = true)))
    val nPruned = pruned.count()
    val diff = pruned.unionAll(exact)
      .groupBy(col("source"), col("doc_id"), col("tok"), col("rank"),
        col("cum_before"))
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"SOAK order kept $nPruned rows, pruned-vs-exact mismatches $diff " +
      (if (diff == 0) "EXACT" else "BROKEN"))

    spark.stop()
  }
}

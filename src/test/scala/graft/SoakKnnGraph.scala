package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev soak probe (test scope): q83's kNN graph under exact-dup
  * replication — the invariance the dedup-first design buys: the
  * graph over N base vectors replicated C times must cost and return
  * EXACTLY the single-copy graph (reps don't grow with C), where a
  * raw-row graph would pay C² more candidates for neighbor lists
  * that are all equal. Usage:
  *   sbt "Test/runMain graft.SoakKnnGraph [srcSfDir] [copies]"
  * Results recorded in BENCH_SF10.md.
  */
object SoakKnnGraph {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = Tables.embeddings(spark, src).select("vec_id", "embedding")
    val stride = base.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("vec_id") + lit(k * stride)).as("vec_id"), col("embedding")))
      .reduce(_.unionAll(_))
      .repartition(32).cache()
    println(s"SOAK vectors ${corpus.count()} (=$copies x $stride)")

    val single = timed("graph on 1 copy")(
      Similarity.knnGraph(base, 5).collect())
    val replicated = timed(s"graph on $copies copies")(
      Similarity.knnGraph(corpus, 5).collect())
    println(s"SOAK edges single ${single.length} replicated ${replicated.length}")
    val s1 = single.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sC = replicated.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"SOAK identical_graph ${s1 == sC}")
    require(s1 == sC,
      "replication changed the rep-level graph — dedup-first invariance broken")
    spark.stop()
  }
}

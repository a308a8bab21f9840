package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Dev soak probe (test scope): the q70 label-propagation loop at the
  * 5M-node decade, structure controlled so the claims under test are
  * isolated from pair-generation:
  *
  *   - 1M five-node chain families (the realistic dense near-dup
  *     case: small components, diameter 4);
  *   - one planted 10,001-node PATH (diameter 10,000 — the
  *     pathological shape that pointer halving must close in
  *     O(log d) rounds where plain propagation needs 10,000);
  *   - storage check: persistent-RDD count after the run stays O(1)
  *     (superseded per-round pins released), not O(rounds).
  *
  * Usage: sbt "Test/runMain graft.SoakCC [nodes]"; results recorded
  * in BENCH_SF10.md.
  */
object SoakCC {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    // chains 5k+0 - 5k+1 - ... - 5k+4: 1M families of 5 at n=5M
    val fam = spark.range(n).toDF("id").filter(col("id") % 5 =!= 0)
      .select((col("id") - 1).as("a"), col("id").as("b"))
    val pathLen = 10000L
    val path = spark.range(n, n + pathLen).toDF("id")
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val pairs = fam.unionAll(path).repartition(32)
    val nEdges = pairs.count()
    println(s"SOAK nodes ~${n + pathLen} edges $nEdges (path diameter $pathLen)")

    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val t0 = System.nanoTime()
    val (labels, rounds) = ConnectedComponents.clustersWithRounds(pairs, "a", "b", maxIter = 40)
    val stats = labels.agg(
      count(lit(1)).as("nodes"),
      countDistinct(col("cluster_id")).as("clusters")).collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    println(f"SOAK cc rounds $rounds wall $wall%.1f s " +
      s"nodes ${stats.getLong(0)} clusters ${stats.getLong(1)} " +
      s"persisted $persistedBefore -> $persistedAfter")

    // correctness spot-checks: family labels are block bases, the
    // planted path all labels to its min node
    val famBad = labels.filter(col("node") < n &&
      col("cluster_id") =!= (col("node") - (col("node") % 5))).count()
    val pathBad = labels.filter(col("node") >= n && col("cluster_id") =!= n).count()
    println(s"SOAK cc fam_bad $famBad path_bad $pathBad")
    require(famBad == 0 && pathBad == 0, "cluster labels wrong")
    spark.stop()
  }
}

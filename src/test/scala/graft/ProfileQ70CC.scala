package graft

/** Dev probe (round 18): split q70 into its two phases — the MinHash
  * pair listing and the connected-components label loop — and report
  * the loop's round count, so optimization effort lands on the phase
  * that actually costs. Usage: Test/runMain graft.ProfileQ70CC [sfDir].
  */
object ProfileQ70CC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    val pairs = graft.queries.DedupOps.minhashPairsForProfile(spark, dir)
    val t0 = System.nanoTime()
    val pinned = pairs.localCheckpoint(true)
    println(f"pairs materialize: ${(System.nanoTime() - t0) / 1e9}%.2f s," +
      s" rows=${pinned.count()}")

    (1 to 3).foreach { i =>
      val t1 = System.nanoTime()
      val (cl, rounds) = graft.operators.ConnectedComponents.clustersWithRounds(pinned)
      cl.write.format("noop").mode("overwrite").save()
      println(f"CC loop pass $i: ${(System.nanoTime() - t1) / 1e9}%.2f s, rounds=$rounds")
    }
    spark.stop()
  }
}

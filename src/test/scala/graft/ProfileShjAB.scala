package graft

/** Dev probe (round 19): same-JVM interleaved A/B of AQE's
  * maxShuffledHashJoinLocalMapThreshold (0 = SMJ default vs 64MB =
  * runtime SMJ→SHJ rewrite) on the dedup band-join family. The conf is
  * read at execution time, so one session can alternate it per pass.
  * Usage: Test/runMain graft.ProfileShjAB [sfDir] [rounds] [names...]
  */
object ProfileShjAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q37_dedup_simhash", "q106_simhash_capped",
        "q36_dedup_minhash", "q35_dedup_jaccard", "q89_source_overlap")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val key = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    for (v <- Seq("0", "64MB"); n <- names) { // warm both shapes
      spark.conf.set(key, v)
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      Verify.releaseQueryState(spark)
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    for (r <- 1 to rounds; v <- Seq("0", "64MB"); n <- names) {
      spark.conf.set(key, v)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Verify.releaseQueryState(spark)
      acc((n, v)) = s :: acc.getOrElse((n, v), Nil)
    }
    for (((n, v), ts) <- acc.toSeq.sortBy(_._1.toString))
      println(f"$n%-24s thr=$v%-5s min=${ts.min}%.3f all=${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}

package graft

/** Dev probe: time any SparkEntry query by name under the Bench
  * per-pass protocol (noop sink + pin release outside the window).
  * Usage: Test/runMain graft.ProfileQuery <name> [sfDir] [passes]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/repo/.bench/sf10")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val q = SparkEntry.queries(name)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PASS $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

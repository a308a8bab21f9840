package graft
/** Dev timing probe (Test scope per the round-9 advice): `sbt "Test/runMain graft.TimeQ <sfDir> <query...>"`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    for (name <- args.drop(1)) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"$name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

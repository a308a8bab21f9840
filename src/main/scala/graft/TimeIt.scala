package graft

import org.apache.spark.sql.SparkSession

/** Dev perf probe: times named queries with repeats at a given SF dir.
  * Usage: runMain graft.TimeIt <sfDir> <iters> <name> [<name>...]
  * (sbt console can't be used for this: its classloader breaks
  * spark.implicits; this main runs forked like Bench/Verify.)
  */
object TimeIt {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, cpus, logLevel = "ERROR")
    val q = SparkEntry.queries
    for (n <- names; i <- 1 to iters) {
      val t0 = System.nanoTime()
      q(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println("PERF " + n + s" iter$i " + String.format(java.util.Locale.ROOT, "%.2f", Double.box((System.nanoTime() - t0) / 1e9)) + " s")
    }
    spark.stop()
  }
}

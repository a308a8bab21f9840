package graft

import graft.queries.{DatasetOps, EventOps}

/** Dev probe: interleaved A/B of the two-level vs fused (UserFlagFold)
  * shapes for q15/q56 — same JVM, alternating, so a host-contention
  * window hits both shapes equally. The committed numbers land in
  * BENCH_SF10.md next to the argued-row notes. */
object ProfileFusedAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, cpus, logLevel = "ERROR")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $label $dt%.2f s"); dt
    }
    val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "q15_two_level" -> (() => SparkEntry.queries("q15_author_filter")(spark, dir)),
      "q15_fused" -> (() => EventOps.q15Fused(spark, dir)),
      "q56_two_level" -> (() => SparkEntry.queries("q56_heuristic_profile")(spark, dir)),
      "q56_fused" -> (() => DatasetOps.q56Fused(spark, dir)))
    shapes.foreach { case (n, mk) => time(s"warm_$n")(mk()) }
    val results = (1 to 6).flatMap { i =>
      shapes.map { case (n, mk) => n -> time(s"$n i$i")(mk()) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    shapes.map(_._1).foreach { n =>
      println(f"MIN $n ${results(n)}%.2f s")
    }
    spark.stop()
  }
}

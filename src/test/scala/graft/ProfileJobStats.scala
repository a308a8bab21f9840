package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev probe (round 18): per-query job/stage/task accounting for the
  * headline set — separates genuine compute (sum of task run time)
  * from scheduler/planning overhead (wall − parallelizable compute) so
  * optimization effort lands on queries that are overhead-bound, not
  * data-bound. Usage: Test/runMain graft.ProfileJobStats [sfDir] [names...]
  */
object ProfileJobStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.headline
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (te.taskInfo != null) taskMs += te.taskInfo.duration
      }
    })

    val queries = SparkEntry.queries
    names.foreach(n => queries(n)(spark, dir).write.format("noop").mode("overwrite").save())
    Verify.releaseQueryState(spark)

    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSum_s"}%9s")
    names.foreach { n =>
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      val t0 = System.nanoTime()
      queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(150)
      println(f"$n%-28s $wall%7.2f $jobs%5d $stages%7d $tasks%6d ${taskMs / 1e3}%9.2f")
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

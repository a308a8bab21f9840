package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev probe (round 18): per-STAGE task-time split for one query —
  * names the stage (by its details/callsite line) that owns the CPU.
  * Usage: Test/runMain graft.ProfileStageSplit <query> [sfDir]
  */
object ProfileStageSplit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    val rows = mutable.ArrayBuffer.empty[(Int, Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.taskMetrics
        rows += ((si.stageId, si.numTasks,
          if (ms != null) ms.executorRunTime else -1L,
          if (ms != null) ms.shuffleReadMetrics.totalBytesRead else -1L,
          si.name.take(90)))
      }
    })

    val q = SparkEntry.queries(name)
    q(spark, dir).write.format("noop").mode("overwrite").save()
    Verify.releaseQueryState(spark)
    rows.clear()
    val t0 = System.nanoTime()
    q(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"WALL $wall%.2f s")
    rows.sortBy(-_._3).foreach { case (id, nt, run, sread, nm) =>
      println(f"stage $id%4d tasks=$nt%4d run=${run / 1e3}%8.2f s shufRead=${sread / 1e6}%8.1f MB  $nm")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 19): CC loop overhead A/B — current loop vs the
  * same loop under AQE-off / static broadcast variants, on the q70
  * pair graph. Usage: Test/runMain graft.ProfileCCAB [sfDir]
  */
object ProfileCCAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    val pairs = graft.queries.DedupOps.minhashPairsForProfile(spark, dir)
      .localCheckpoint(true)
    println(s"pairs rows=${pairs.count()}")

    def run(label: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    run("current")(graft.operators.ConnectedComponents.clusters(pairs))
    run("aqe_off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try graft.operators.ConnectedComponents.clusters(pairs)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // aqe off for the WHOLE action too (clusters builds the loop
    // eagerly inside; the returned plan's final noop also runs off)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe_off_full")(graft.operators.ConnectedComponents.clusters(pairs))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}

package graft

/** Dev probe: times q59/q62 at an sf dir (default .bench/sf1) — min of
  * N timed passes after one warm-up, with the Bench host-health probe
  * before/after. Test scope: not part of the shipped artifact.
  */
object ProfilePrompts {
  private def probeSec(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0
    while (i < 500000000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    if (x == 42L) System.err.println("")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/.bench/sf1"
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local("32", "32")
    val names = Seq("q59_prompt_assembly", "q62_sta_nar_assembly")
    def runOne(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"probe_before=${probeSec()}%.2f")
    names.foreach(runOne) // warm-up
    val timed = Seq.fill(passes)(names.map(n => n -> runOne(n)))
    timed.zipWithIndex.foreach { case (p, i) =>
      println(s"pass$i: " + p.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
    val mins = names.map(n => n -> timed.map(_.toMap.apply(n)).min)
    println("MIN: " + mins.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    println(f"probe_after=${probeSec()}%.2f")
    spark.stop()
  }
}

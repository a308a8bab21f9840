package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline query set twice — an untimed
  * warm-up pass (JVM JIT, parquet footer cache, catalog init) and then
  * the timed pass — so the reported seconds measure the query plans,
  * not Spark session startup. Any query failure aborts with exit 1:
  * a broken query must never contribute a fake timing.
  *
  * Emits exactly one JSON line on stdout (also written to
  * bench_out.json in the cwd for log-noise-proof parsing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, cpus)

    val names = SparkEntry.headline
    val queries = SparkEntry.queries

    // Warm-up: run every headline query once, untimed.
    names.foreach { name =>
      try queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] FATAL: warm-up of $name failed: $e")
          spark.stop()
          sys.exit(1)
      }
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      name -> (System.nanoTime() - t0) / 1e9
    }

    // String.format with an explicit ROOT locale: the f-interpolator
    // uses the default locale, which can emit comma decimals (invalid
    // JSON) on non-English JVMs.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line)
    println(line)
    spark.stop()
  }
}

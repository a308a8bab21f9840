package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline query set once untimed (JVM JIT,
  * parquet footer cache, catalog init) and then PROBE-GATED timed
  * passes until two are bracketed by healthy host probes (bounded
  * attempts), reporting each query's MINIMUM across all recorded
  * passes — the guard against transient interference: this host
  * exhibits multi-x CPU-contention windows from outside the guest
  * (round-5 bench measured 25x on queries that re-run at 1x minutes
  * later), and gate+min keeps a spike from being read as a plan
  * regression. Any query failure aborts with exit 1: a broken query
  * must never contribute a fake timing.
  *
  * The JSON line also carries `probe_sec_*`: wall seconds for a fixed
  * single-threaded arithmetic loop run before warm-up and after the
  * timed passes. Healthy-host baseline is ~0.6 s; a multiple of that
  * means the numbers were taken under external contention and measure
  * the host, not the plans.
  *
  * Emits exactly one JSON line on stdout (also written to
  * bench_out.json in the cwd for log-noise-proof parsing).
  */
object Bench {
  /** Fixed-work host-health probe: 500M-step LCG, single thread.
    * Shared with BenchGuardSpec so the guard gates on the identical
    * health signal the bench protocol uses. */
  private[graft] def probeSec(): Double = {
    val t0 = System.nanoTime()
    var x = 0L
    var i = 0
    while (i < 500000000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** THE cpu count for this bench process: SPARK_GRAFT_CPUS if it
    * parses, else the JVM's processor count. main sizes local[N] from
    * this and probeParThreads sizes the all-core probe from it, so the
    * probe always measures the parallelism the bench actually uses —
    * previously main fell back to "32" while the probe fell back to
    * availableProcessors(), and on a non-32-core host with the var
    * unset the two diverged (round-16 advice). */
  private[graft] def resolvedCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  /** Thread count for the all-core probe: one per vCPU the bench is
    * configured for (resolvedCpus — the same value main sizes local[N]
    * with). Sizing the probe to the HOST keeps the fixed per-thread
    * work (500M steps) the unit of measure on any core topology — with
    * the old hardcoded 32, a 16-core host would time-slice 2
    * threads/core and read ~2x the healthy bound while perfectly
    * idle. */
  private[graft] def probeParThreads: Int = resolvedCpus

  /** The env-overridable all-core probe bound. Healthy calibration on
    * an idle 32-vCPU host (round 15): 0.76-0.81 s with near-linear
    * core scaling, so the per-thread fixed work is ~core-count
    * independent and the 1.2 s default (1.5x healthy headroom) holds
    * wherever threads == cores. A malformed override falls back to
    * the default with a warning — a typo'd env var must not crash the
    * bench before any pass runs. */
  private[graft] def probeParMaxSec: Double =
    sys.env.get("GRAFT_PROBE_PAR_MAX").map { s =>
      s.toDoubleOption.getOrElse {
        System.err.println(
          s"[bench] WARNING: GRAFT_PROBE_PAR_MAX='$s' is not a number — using default 1.2")
        1.2
      }
    }.getOrElse(1.2)

  /** The same fixed work on EVERY core at once (one thread per vCPU x
    * 500M steps). The single-thread probe has a measured blind spot: a
    * round-15 guard run read healthy 0.69 s single-thread probes while
    * every multicore query stage ran 2-4x slow (an external contender
    * that loads most-but-not-all vCPUs leaves one core's worth of
    * single-thread throughput intact). All-core fixed work degrades
    * whenever AGGREGATE throughput does — the signal Spark stages
    * actually depend on. Healthy calibration on this 32-vCPU host
    * (idle, round 15): 0.76-0.81 s — near-linear core scaling vs the
    * 0.69-0.72 s solo probe. */
  private[graft] def probeParSec(threads: Int = probeParThreads): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { tid =>
      val t = new Thread(() => {
        var x = tid.toLong
        var i = 0
        while (i < 500000000) {
          x = x * 6364136223846793005L + 1442695040888963407L
          i += 1
        }
        if (x == 42L) System.err.println("")
      })
      t.start()
      t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = resolvedCpus.toString
    val spark = GraftSession.local(cpus, cpus)

    // SPARK_GRAFT_BENCH_EXTRA=1 appends the non-headline queries
    // (Spark-only floors — no DuckDB side; combine_pairs reports the
    // engine ratio over the common set and lists these as
    // "Spark-only extra"). Default OFF so the driver's per-round
    // sf0.1 bench stays comparable across rounds.
    // SPARK_GRAFT_BENCH_ONLY=q96_...,q35_... restricts the run to the
    // named queries (floor measurement for a few expensive extras
    // without paying the whole suite) — it overrides EXTRA.
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val known = SparkEntry.queries.keySet
        val bad = want.filterNot(known)
        if (bad.nonEmpty) {
          System.err.println(s"[bench] FATAL: unknown queries in SPARK_GRAFT_BENCH_ONLY: ${bad.mkString(",")}")
          sys.exit(1)
        }
        want
      case None =>
        if (sys.env.get("SPARK_GRAFT_BENCH_EXTRA").contains("1"))
          SparkEntry.headline ++ SparkEntry.benchExtra
        else SparkEntry.headline
    }
    val queries = SparkEntry.queries

    def runOne(name: String, phase: String): Double = {
      val t0 = System.nanoTime()
      try queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] FATAL: $phase of $name failed: $e")
          spark.stop()
          sys.exit(1)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // Per-query block-manager hygiene (round 12, OUTSIDE the timed
      // window): queries pin intermediates (signature tables, packed
      // streams) via localCheckpoint; each pass constructs its
      // DataFrames FRESH, so a finished query's pins are garbage —
      // but without an explicit release they accumulate across the
      // 80-query pass and tax every later query's memory (measured:
      // q85 read a steady +0.25 s inside the suite vs standalone).
      // Verify releases the same state per query (shared helper);
      // the DuckDB side has no cross-query state either, so this is
      // fairness, not a flatter. blocking=true: a deferred removal
      // would race into the NEXT query's timed window.
      Verify.releaseQueryState(spark)
      sec
    }

    val probeBefore = probeSec()
    names.foreach(runOne(_, "warm-up"))

    // Probe-gated timed passes (the round-9 sf1 protocol, now built
    // in): a pass only COUNTS when the fixed-work probe is healthy
    // (≤ 0.8 s — ~0.6 s on an idle host) both immediately before and
    // immediately after it; a hot before-probe skips the pass and
    // backs off, a hot after-probe keeps the pass as dirty (min-combine
    // still uses it if no clean pair materializes). Attempts are
    // bounded so a permanently contended host still emits numbers —
    // flagged by clean_passes < 2 — instead of hanging the driver.
    val ProbeHealthySec = 0.8
    // all-core probe bound: healthy calibration 0.76-0.81 s on this
    // idle 32-vCPU host (near-linear scaling); the sick window this
    // bound exists for degraded multicore throughput 2-4x while the
    // single-thread probe stayed at 0.69 s, so it would read >= 1.6 s
    // here. 1.2 s = 1.5x healthy headroom (thread count tracks the
    // host's cores, see probeParThreads). Env-overridable.
    val ProbeParHealthySec = probeParMaxSec
    val TargetCleanPasses = 2
    val MaxAttempts = 6
    val allPasses = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    val probePairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val parPairs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var cleanCount = 0
    var skippedProbes = 0
    var attempts = 0
    while (cleanCount < TargetCleanPasses && attempts < MaxAttempts) {
      attempts += 1
      val pb = probeSec()
      val pbPar = probeParSec()
      if (pb > ProbeHealthySec || pbPar > ProbeParHealthySec) {
        skippedProbes += 1
        System.err.println(
          f"[bench] probe $pb%.2f s (par $pbPar%.2f s) > " +
            f"($ProbeHealthySec, $ProbeParHealthySec%.1f) — host contended, re-queueing pass")
        Thread.sleep(10000)
      } else {
        val pass = names.map(n => n -> runOne(n, "timed"))
        val pa = probeSec()
        val paPar = probeParSec()
        allPasses += pass
        probePairs += ((pb, pa))
        parPairs += ((pbPar, paPar))
        if (pa <= ProbeHealthySec && paPar <= ProbeParHealthySec) cleanCount += 1
        else System.err.println(
          f"[bench] after-probe $pa%.2f s (par $paPar%.2f s) — pass kept as dirty")
      }
    }
    if (allPasses.isEmpty) {
      // every attempt was probe-skipped: measure once ungated rather
      // than emit nothing (clean_passes=0 flags the number as suspect)
      val pass = names.map(n => n -> runOne(n, "timed"))
      allPasses += pass
      probePairs += ((-1.0, probeSec()))
    }
    val passes = allPasses.toSeq
    val probeAfter = probeSec()

    // per-query minimum across the timed passes
    val results = names.map { n =>
      n -> passes.map(_.toMap.apply(n)).min
    }

    // String.format with an explicit ROOT locale: the f-interpolator
    // uses the default locale, which can emit comma decimals (invalid
    // JSON) on non-English JVMs.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def obj(kvs: Seq[(String, Double)]): String = kvs
      .map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val qs = obj(results)
    // every pass's raw numbers alongside the min: a pass-1 ≫ pass-2
    // spread tells the reader a number was taken under external
    // contention (this host's known failure mode) without re-running.
    // Emitted as its OWN stdout line BEFORE the headline: round 7
    // embedded the passes array inside the headline line and the
    // resulting length pushed it out of the driver's parse window
    // (BENCH_r07.json parsed: null). The headline stays compact and is
    // the LAST stdout line of the process.
    val passesJson = passes.map(obj).mkString("[", ",", "]")
    val pairJson = probePairs
      .map { case (b, a) => s"[${num(b)},${num(a)}]" }.mkString("[", ",", "]")
    val parJson = parPairs
      .map { case (b, a) => s"[${num(b)},${num(a)}]" }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val detailLine =
      s"""{"metric":"passes","timed_passes":${passes.size},""" +
        s""""clean_passes":$cleanCount,"skipped_probes":$skippedProbes,""" +
        s""""pass_probes":$pairJson,"pass_probes_par":$parJson,""" +
        s""""passes":$passesJson,""" +
        s""""probe_sec_before":${num(probeBefore)},""" +
        s""""probe_sec_after":${num(probeAfter)}}"""
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Atomic: write a temp file and move it over bench_out.json, so a
    // crash (or a reader racing the write) can never observe a
    // truncated artifact — the file is the noise-proof channel the
    // driver falls back to when its stdout capture clips the headline
    // (BENCH_r16.json "parsed": null).
    val out = java.nio.file.Paths.get("bench_out.json")
    val tmp = java.nio.file.Paths.get("bench_out.json.tmp")
    java.nio.file.Files.writeString(tmp, detailLine + "\n" + line + "\n")
    java.nio.file.Files.move(
      tmp, out,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(detailLine)
    spark.stop() // stop BEFORE the headline so no shutdown noise can follow it
    println(line)
  }
}

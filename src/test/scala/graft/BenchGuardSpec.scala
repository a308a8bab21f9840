package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Perf REGRESSION gate over the committed sf1 envelope
  * (`bench_envelope_sf1.conf`: `query=seconds` lines, the min-combined
  * protocol numbers of the round that last touched performance) —
  * PlanSpec catches shape regressions, this catches the silent
  * constant-factor ones (a Janino fallback, a codegen cache miss, an
  * accidental O(n²) inside one row) that leave the plan intact.
  *
  * Opt-in (`GRAFT_BENCH_GUARD=1 sbt "testOnly graft.BenchGuardSpec"` —
  * minutes of wall-clock and it needs the sf1 tables + an otherwise
  * idle JVM, so it must not run inside the ordinary suite). Probe-gated
  * like graft.Bench: a pass counts only when the fixed-work host probe
  * is healthy on both sides, because this host shows multi-x external
  * contention windows; with no clean pass the test CANCELS (no signal)
  * rather than failing on machine noise.
  *
  * A query fails the gate at > 2× its envelope. Calibration, measured
  * when this gate was built: envelope lines are BEST-EVER protocol
  * minimums (16-pair min-combine on an idle host), and probe-CLEAN
  * guard passes on this host still read 1.1–1.5× of those mins
  * (q11 1.11×, q36 1.37×, q59 1.47× same-session, no code change) —
  * the single-thread probe can't see the memory-bandwidth class of
  * contention that stretches the parallel queries. 1.5× slack over
  * best-ever mins would therefore fail on host drift; 2× stays
  * silent through drift while still catching the step-function
  * regressions this gate exists for (a Janino fallback is 3–10×, an
  * accidental quadratic worse). Refresh the envelope whenever a
  * round's final sf1 pair is produced (tools/combine_pairs prints the
  * per-query mins that become these lines).
  */
class BenchGuardSpec extends AnyFunSuite {

  private val Slack = 2.0

  test("sf1 headline queries stay within 2x of the committed envelope") {
    assume(sys.env.get("GRAFT_BENCH_GUARD").contains("1"),
      "opt-in: set GRAFT_BENCH_GUARD=1")
    guard("bench_envelope_sf1.conf",
      sys.env.get("GRAFT_BENCH_SF1_DIR")
        .orElse(sys.env.get("GRAFT_BENCH_SF_DIR"))
        .getOrElse("/root/repo/.bench/sf1"))
  }

  /** The sf10 envelope (round 14): same gate, 10x the data, the
    * full-suite headline floors from the sf10 bench pair
    * (BENCH_SF10.md). Separately opt-in — tens of minutes of
    * wall-clock — so the sf1 guard stays runnable alone. Uses the
    * sf10 canonical run config (SPARK_DRIVER_MEM=24g, see the conf
    * header): floors were measured at that heap, and gating an 8g
    * run against 24g floors would fail on spill, not regression. */
  test("sf10 headline queries stay within 2x of the committed envelope") {
    assume(sys.env.get("GRAFT_BENCH_GUARD_SF10").contains("1"),
      "opt-in: set GRAFT_BENCH_GUARD_SF10=1")
    // scale-specific var ONLY: honoring the generic GRAFT_BENCH_SF_DIR
    // here would run the sf10 gate over sf1 data when both guards are
    // enabled with the shared var set — a silent false-pass of the 2x
    // floors (round-14 advisory).
    guard("bench_envelope_sf10.conf",
      sys.env.getOrElse("GRAFT_BENCH_SF10_DIR", "/root/repo/.bench/sf10"))
  }

  private def guard(envelopeFile: String, sfDir: String): Unit = {
    val envPath = Paths.get(envelopeFile)
    assume(Files.exists(envPath), s"no committed envelope at $envPath")
    assume(Files.isDirectory(Paths.get(sfDir)), s"bench tables missing at $sfDir")

    val envelope: Map[String, Double] = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(envPath).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val Array(k, v) = l.split("=", 2)
          k.trim -> v.trim.toDouble
        }.toMap
    }
    // headline + the Spark-only extras (non-headline queries with a
    // committed floor — q96 etc.); an extra without an envelope line
    // is simply not gated yet
    val names =
      (SparkEntry.headline ++ SparkEntry.benchExtra).filter(envelope.contains)
    assert(names.nonEmpty, "envelope names none of the headline queries")

    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    try {
      val queries = SparkEntry.queries
      def runOne(n: String): Double = {
        val t0 = System.nanoTime()
        queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // same per-query pin hygiene as graft.Bench (outside the timed
        // window): floors are measured under the Bench protocol, so the
        // guard must not carry cross-query pinned blocks Bench doesn't
        Verify.releaseQueryState(spark)
        sec
      }
      names.foreach(runOne) // warm-up: JIT, footer cache, codegen cache

      val ProbeHealthySec = 0.8
      // all-core bound too: a round-15 guard run burned an hour and
      // FAILED 8 queries at 2-4x under an external contender the
      // single-thread probe could not see (0.69 s throughout); the
      // all-core probe (healthy 0.76-0.81 s idle) reads >= 1.6 s in
      // exactly that window, so sick passes are now skipped instead
      // of failing the gate with host noise.
      val ProbeParHealthySec = Bench.probeParMaxSec // shared default + safe parse
      def healthy(): Boolean =
        Bench.probeSec() <= ProbeHealthySec &&
          Bench.probeParSec() <= ProbeParHealthySec
      var passes = List.empty[Map[String, Double]]
      var attempts = 0
      while (passes.size < 2 && attempts < 5) {
        attempts += 1
        if (healthy()) {
          val pass = names.map(n => n -> runOne(n)).toMap
          if (healthy()) passes ::= pass
        } else Thread.sleep(5000)
      }
      assume(passes.nonEmpty, "no probe-clean pass in 5 attempts — host contended, no signal")

      // Isolated clean retry for over-limit rows: in-suite readings
      // inherit the heap/GC state of whatever ran before them (q70
      // directly after q37's 2.1B-pair stage read 52 s in a round-15
      // guard pass vs 16-18 s standalone-warm on the same host,
      // healthy probes throughout, code A/B-identical), so an
      // over-limit reading is re-taken after a full GC with nothing
      // else resident. A real step-function regression — the Janino
      // fallback / accidental quadratic this gate exists for — is
      // slow in isolation too and still fails. Protocol (round 16,
      // re-tuned after a live failure): each retry WAITS boundedly
      // for a probe-clean window (retrying under contention is
      // noise-vs-noise — the first gated version skipped instead,
      // which turned a contention window into a FAILED gate on q70
      // while the same query read 17.3 s standalone minutes later);
      // up to two clean retries per row (sub-second rows sit within
      // scheduler noise of a 2x-of-0.2 s limit — q55 missed by 1 ms
      // on a single retry); a row that never gets a clean window is
      // NO SIGNAL and cancels the test rather than failing it. Every
      // rescue is logged so reliance on the lenient path is visible.
      // this host's measured contention windows run MINUTES (round-16
      // log: two guard attempts starved at a 50 s bound), so the
      // per-retry wait budget is ~3.3 min — still bounded, and a
      // permanently contended host ends in the no-signal cancel below
      def waitClean(): Boolean = {
        var waits = 0
        while (!healthy() && waits < 20) { waits += 1; Thread.sleep(10000) }
        healthy()
      }
      val rescued = scala.collection.mutable.ArrayBuffer.empty[String]
      val noSignal = scala.collection.mutable.ArrayBuffer.empty[String]
      val over = names.flatMap { n =>
        val inSuite = passes.map(_(n)).min
        val limit = envelope(n) * Slack
        var best = inSuite
        var retries = 0
        var starved = false
        while (best > limit && retries < 2 && !starved) {
          System.gc()
          Thread.sleep(2000)
          if (waitClean()) {
            retries += 1
            val iso = runOne(n)
            if (math.min(best, iso) <= limit)
              rescued += f"$n (in-suite ${inSuite / envelope(n)}%.2fx -> isolated ${iso / envelope(n)}%.2fx)"
            best = math.min(best, iso)
          } else starved = true
        }
        if (best > limit && starved) {
          noSignal += n
          None // handled below: contaminated reading, cancel not fail
        } else if (best > limit)
          Some(f"$n: $best%.2f s > ${Slack}x envelope ${envelope(n)}%.2f s" +
            f" (in-suite $inSuite%.2f s)")
        else None
      }
      if (rescued.nonEmpty)
        info(s"isolated clean retry rescued ${rescued.size} row(s): ${rescued.mkString(", ")}")
      assert(over.isEmpty,
        s"perf regression vs committed $envelopeFile:\n  ${over.mkString("\n  ")}")
      assume(noSignal.isEmpty,
        s"over-limit rows with no probe-clean retry window (host contended " +
          s"throughout — no signal, not a verdict): ${noSignal.mkString(", ")}")
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Diversity}

/** Dev soak probe (test scope): the q92 Luby MIS loop, the q90
  * incremental dedup join, and the q93 CDC chunker at the 5M decade —
  * the round-11 VERDICT's remaining scale asks, structure-controlled
  * like SoakCC:
  *
  *   - MIS over 1M five-node path families + one planted 10,001-node
  *     path: fixed-priority Luby must converge in O(log n)-ish rounds
  *     (priorities are salted hashes, so the planted path is NOT the
  *     id-ordered worst case), the kept set must be verifiably
  *     maximal+independent by construction checks, and — the round-12
  *     fix under test — persistent-RDD storage after the run must be
  *     O(1) pins (the und chain AND the per-round sel pins released;
  *     one output-sized kept pin survives, owned by the caller).
  *   - q90 incremental dedup: 5M-doc base fingerprint index vs a
  *     5k-doc delta (the daily-ingest asymmetry): the join must plan
  *     SHUFFLE_HASH (no broadcast of either corpus-shaped side) and
  *     the delta-sized output must arrive in seconds.
  *   - q93 CDC chunking at 5M synthetic docs: linear wall, exact
  *     replica invariance is already covered by SoakCorpusOps; here
  *     the claim is absolute scale (boundaries computed in one pass,
  *     no blowup).
  *
  * Usage: sbt "Test/runMain graft.SoakMis [nodes]"; results recorded
  * in BENCH_SF10.md.
  */
object SoakMis {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- q92 MIS at 5M nodes ---
    val fam = spark.range(n).toDF("id").filter(col("id") % 5 =!= 0)
      .select((col("id") - 1).as("a"), col("id").as("b"))
    val pathLen = 10000L
    val path = spark.range(n, n + pathLen).toDF("id")
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val pairs = fam.unionAll(path).repartition(32)
    println(s"SOAK mis nodes ~${n + pathLen} edges ${pairs.count()}")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val (kept, rounds) = timed("mis independentSet 5M")(
      Diversity.independentSetWithRounds(pairs))
    val keptN = kept.count()
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    println(s"SOAK mis kept $keptN rounds $rounds " +
      s"persisted $persistedBefore -> $persistedAfter")
    // independence: no kept pair is an edge (exact anti check)
    val viol = pairs.join(kept.select(col("node").as("a")), Seq("a"))
      .join(kept.select(col("node").as("b")), Seq("b")).count()
    // maximality: every non-kept graph node has a kept neighbor
    val nodes = pairs.select(col("a").as("node"))
      .unionAll(pairs.select(col("b").as("node"))).distinct()
    val undominated = nodes.join(kept, Seq("node"), "left_anti")
      .join(
        pairs.join(kept.select(col("node").as("a")), Seq("a"))
          .select(col("b").as("node"))
        .unionAll(pairs.join(kept.select(col("node").as("b")), Seq("b"))
          .select(col("a").as("node"))).distinct(),
        Seq("node"), "left_anti").count()
    println(s"SOAK mis independence violations $viol undominated $undominated " +
      (if (viol == 0 && undominated == 0) "EXACT" else "BROKEN"))

    // --- q90 incremental dedup at 5M base / 5k delta ---
    val base = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("base text body number "), col("id").cast("string"),
        lit(" tail")).as("text"))
    // delta: half genuinely new, half exact dups of base rows
    val delta = spark.range(5000).select((col("id") + n).as("doc_id"),
      when(col("id") % 2 === 0,
        concat(lit("base text body number "),
          expr("id div 2").cast("string"), lit(" tail")))
        .otherwise(concat(lit("fresh delta doc "), col("id").cast("string")))
        .as("text"))
    val survivors = timed("incremental dedup 5M base / 5k delta")(
      Dedup.incrementalSurvivors(base, delta).count())
    println(s"SOAK incremental survivors $survivors (expect 2500)")

    // --- q93 CDC at 5M docs ---
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("lorem ipsum dolor sit amet consectetur adipiscing elit "),
        col("id").cast("string"),
        lit(" sed do eiusmod tempor incididunt ut labore et dolore")).as("text"))
    val cdc = timed("cdc chunk stats 5M docs")(
      Dedup.cdcChunkStats(docs).agg(
        count(lit(1)), sum(col("n_chunks"))).collect()(0))
    println(s"SOAK cdc docs ${cdc.getLong(0)} chunks ${cdc.getLong(1)}")

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev soak probe (test scope): q77's exact-substring signal at 10x
  * the bench scale — 500k documents built by replicating the sf1
  * corpus with doc_id shifts. Copies are VERBATIM (unlike GenSf's
  * marker-perturbed document replication), so every base window
  * becomes a 10-member cross-doc family: the adversarial
  * everything-is-duplicated case. The probe records the stage
  * cardinalities that must stay LINEAR (window rows, per-(h,doc)
  * rows, multi-doc hash count) and the wall time of the full signal;
  * results in BENCH_SF10.md. Usage:
  *   sbt "Test/runMain graft.SoakSubstring [srcSfDir] [copies]"
  */
object SoakSubstring {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = Tables.documents(spark, src).select("doc_id", "text")
    val stride = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("doc_id") + lit(k * stride)).as("doc_id"), col("text")))
      .reduce(_.unionAll(_))
      .repartition(32).cache()
    val nDocs = corpus.count()
    println(s"SOAK docs $nDocs (=$copies x $stride)")

    val occ = corpus.select(col("doc_id"),
      explode(graft.plans.RollingHashes(col("text"), 40)).as("h"))
    val nWindows = timed("windows")(occ.count())
    // beyond ~1M docs the un-anchored stages are exactly what the
    // anchorMod dial exists to avoid (the full 10x run is recorded in
    // BENCH_SF10.md); at the 5M-doc decade only the dialed path runs
    if (copies <= 20) {
      val perDoc = occ.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      val stats = timed("hash stats")(
        perDoc.groupBy(col("h")).agg(count(lit(1)).as("nd"))
          .agg(count(lit(1)).as("hashes"),
            sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("multi"),
            max(col("nd")).as("max_family")).collect()(0))
      println(s"SOAK windows $nWindows distinct_hashes ${stats.getLong(0)} " +
        s"multi_doc ${stats.getLong(1)} max_family ${stats.getLong(2)}")

      val out = timed("dupSubstringStats end-to-end")(
        Dedup.dupSubstringStats(corpus, 40)
          .agg(sum(col("dup_windows")), count(lit(1))).collect()(0))
      println(s"SOAK dup_windows_total ${out.getLong(0)} rows ${out.getLong(1)}")
    } else println(s"SOAK un-anchored stages skipped at $copies copies (dialed path only)")

    // the anchorMod scale dial: ~1/16 of windows, content-aligned
    val aOcc = occ.filter(col("h") % 16 === 0)
    val nAnchored = timed("anchored windows")(aOcc.count())
    val aStats = timed("anchored hash stats")(
      aOcc.groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
        .groupBy(col("h")).agg(count(lit(1)).as("nd"))
        .agg(count(lit(1)).as("hashes"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("multi"),
          max(col("nd")).as("max_family")).collect()(0))
    println(f"SOAK anchored_windows $nAnchored (1/${nWindows.toDouble / nAnchored}%.1f of all) " +
      s"anchored_hashes ${aStats.getLong(0)} multi ${aStats.getLong(1)} max_family ${aStats.getLong(2)}")
    val anchored = timed("dupSubstringStats anchorMod=16")(
      Dedup.dupSubstringStats(corpus, 40, anchorMod = 16)
        .agg(sum(col("dup_windows")), sum(when(col("dup_windows") > 0, 1L).otherwise(0L)))
        .collect()(0))
    println(s"SOAK anchored dup_windows ${anchored.getLong(0)} " +
      s"docs_flagged ${anchored.getLong(1)}")

    spark.stop()
  }
}

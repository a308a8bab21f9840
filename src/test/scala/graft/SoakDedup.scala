package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev soak probe (test scope): per-stage cardinalities and wall times
  * of the q36 (MinHash/LSH) and q37 (SimHash) dedup pipelines at a
  * large generated SF — the measured evidence that (a) the
  * stop-shingle guard's broadcast side stays bounded independent of
  * corpus size and (b) candidate pairs grow linearly with documents,
  * not quadratically. Results are recorded in BENCH_SF10.md.
  *
  * Bucket-pair counts are computed by aggregation (Σ pop·(pop−1)/2
  * over buckets) — the exact output size of the band self-join without
  * paying for the join twice.
  */
object SoakDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val nDocs = docs.count()
    println(s"SOAK docs $nDocs")

    // ---- q36 MinHash/LSH stages -----------------------------------
    val threshold = (nDocs / 10).max(1L)
    val raw = Dedup.shingleHashRows(docs)
    val nShingleRows = timed("q36.shingle_rows")(raw.count())
    println(s"SOAK q36 shingle_rows $nShingleRows (threshold df>$threshold)")
    // phase-1 guard sliver: per-hash ROW counts above the bound — this
    // is the set that must stay broadcastable at any corpus size
    // (bounded by rows/threshold, independent of nDocs)
    val rcHot = raw.groupBy(col("h")).agg(count(lit(1)).as("rc"))
      .filter(col("rc") > threshold).count()
    // phase-2 exact hot set (DF > threshold) — subset of phase 1
    val dfHot = raw.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df_"))
      .filter(col("df_") > threshold).count()
    println(s"SOAK q36 guard rc_hot $rcHot df_hot $dfHot bound ${nShingleRows / threshold}")

    val sig = Dedup.withSignatureFromHashes(
      Dedup.shingleHashRows(docs, maxDocFreq = Some(threshold)))
      .transform(graft.operators.Pin(_))
    val nSig = timed("q36.signatures")(sig.count())
    val bands = Dedup.lshBuckets(sig)
    val pops = bands.groupBy(col("b"), col("bkey")).agg(count(lit(1)).as("c"))
    val stats = pops.agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      sum(col("c") * (col("c") - 1) / 2).as("cand_pairs")).collect()(0)
    println(s"SOAK q36 signatures $nSig band_rows ${nSig * Dedup.Bands} " +
      s"buckets ${stats.getLong(0)} max_pop ${stats.getLong(1)} " +
      s"cand_pairs ${stats.getDouble(2).toLong}")
    val pairs36 = timed("q36.pairs")(Dedup.minhashPairsOwned(sig).count())
    println(s"SOAK q36 final_pairs $pairs36")
    // q70 tail at scale: pair list -> clusters (min-label propagation)
    val clusters = timed("q36.clusters")(
      graft.operators.ConnectedComponents.clusters(Dedup.minhashPairsOwned(sig))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("clusters"), max(col("sz")).as("max_sz"),
          sum(col("sz")).as("nodes")).collect()(0))
    println(s"SOAK q70 clusters ${clusters.getLong(0)} " +
      s"max_size ${clusters.getLong(1)} clustered_nodes ${clusters.getLong(2)}")

    // ---- q37 SimHash stages ---------------------------------------
    val base = docs
      .select(col("doc_id"), Dedup.simhash60(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
    val nBase = timed("q37.base")(base.count())
    val combos = Dedup.SimPairCombos.zipWithIndex.map { case ((i, j), c) =>
      val (s1, w1) = (Dedup.SimBlockShifts(i), Dedup.SimBlockWidths(i))
      val (s2, w2) = (Dedup.SimBlockShifts(j), Dedup.SimBlockWidths(j))
      struct(lit(c).as("b"), expr(
        s"(shiftright(simhash, $s1) % ${1L << w1}) * ${1L << w2}" +
          s" + (shiftright(simhash, $s2) % ${1L << w2})").as("bkey"))
    }
    val sbands = base
      .select(col("doc_id"), explode(array(combos: _*)).as("pc"))
      .select(col("pc.b").as("b"), col("pc.bkey").as("bkey"))
    val spops = sbands.groupBy(col("b"), col("bkey")).agg(count(lit(1)).as("c"))
    val sstats = spops.agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      sum(col("c") * (col("c") - 1) / 2).as("cand_pairs")).collect()(0)
    println(s"SOAK q37 base $nBase band_rows ${nBase * Dedup.SimPairCombos.size} " +
      s"buckets ${sstats.getLong(0)} max_pop ${sstats.getLong(1)} " +
      s"cand_pairs ${sstats.getDouble(2).toLong}")
    // the hot-bucket cap (sf10 lesson): candidates and pairs with
    // buckets > cap dropped, at the loose (12) and web-scale (3)
    // hamming dials
    val cap = 1000L
    val coldStats = spops.filter(col("c") <= cap).agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      sum(col("c") * (col("c") - 1) / 2).as("cand_pairs")).collect()(0)
    val hotBuckets = sstats.getLong(0) - coldStats.getLong(0)
    println(s"SOAK q37 cap=$cap hot_buckets $hotBuckets " +
      s"cold_cand_pairs ${coldStats.getDouble(2).toLong} " +
      s"cold_max_pop ${coldStats.getLong(1)}")
    val pairsCapped12 = timed("q37.pairs_cap1000_h12")(
      Dedup.simhashPairs(base, maxHamming = 12, maxBucketPop = Some(cap)).count())
    println(s"SOAK q37 capped_pairs_h12 $pairsCapped12")
    val pairsCapped3 = timed("q37.pairs_cap1000_h3")(
      Dedup.simhashPairs(base, maxHamming = 3, maxBucketPop = Some(cap)).count())
    println(s"SOAK q37 capped_pairs_h3 $pairsCapped3")

    // ---- end-to-end headline q36 at this SF (q37's headline output
    // is the uncapped pair listing — 2.1e9 rows at sf10, the measured
    // quadratic the cap exists to bound; not run end-to-end here) ----
    for (name <- Seq("q36_dedup_minhash")) {
      timed(s"$name.warm")(SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save())
      timed(s"$name.timed")(SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Dev soak probe (test scope): IVF-PQ at scale — the claim is the
  * MEMORY cut (m bytes per vector instead of Dim·4 float bytes) at
  * search quality the refine step restores. Clustered synthetic
  * corpus (SoakIvf2's generator); records train/encode/search walls,
  * the stored-index byte cut, ADC-shortlist+refine recall vs exact
  * brute force, and the uncompressed IVF baseline's wall for the same
  * queries. Results in BENCH_SF10.md.
  *
  * Usage: sbt "Test/runMain graft.SoakIvfPq [vectors] [cells]"
  */
object SoakIvfPq {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toInt).getOrElse(200000)
    val cells = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val Dim = graft.functions.VectorFunctions.Dim
    val nClusters = 512
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(nClusters)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    val docs = spark.range(nVec).mapPartitions { it =>
      it.map { i =>
        val r2 = new scala.util.Random(i * 7919L)
        val c = centers((i % nClusters).toInt)
        (i, c.map(x => x + 0.05f * r2.nextGaussian().toFloat).toSeq)
      }
    }.toDF("vec_id", "embedding")
      .transform(graft.operators.Pin(_, eager = true))
    println(s"SOAK ivfpq vectors ${docs.count()} cells $cells clusters $nClusters")

    val m = 8; val ksub = 256
    val model = timed(s"train coarse k-means($cells) + $m x k-means($ksub) on residuals")(
      Pq.train(docs, cells, m, ksub))
    val index = timed("encode (one corpus pass)")(
      graft.operators.Pin(
        Pq.encode(docs, model).select(col("vec_id"), col("cell"), col("pq")),
        eager = true))
    // stored-index cut: pq bytes vs raw float bytes (logical row size)
    val pqBytes = index.agg(sum(length(col("pq")))).collect()(0).getLong(0)
    val rawBytes = nVec.toLong * Dim * 4
    println(f"SOAK ivfpq index bytes $pqBytes (raw $rawBytes, " +
      f"${rawBytes.toDouble / pqBytes}%.1fx smaller)")

    val qPred = col("vec_id") % (nVec / 10) === 0 // 10 queries
    val k = 5
    val adc = timed("ADC shortlist(800) + exact refine, full probe")(
      graft.operators.Pin(Pq.searchAdcRerankIndex(index, docs, model, qPred, k,
        probes = cells, shortlist = 800), eager = true))
    val adcPartial = timed("ADC shortlist(800) + refine, 8-cell probe")(
      graft.operators.Pin(Pq.searchAdcRerankIndex(index, docs, model, qPred, k,
        probes = 8, shortlist = 800), eager = true))
    // AUTO shortlist (round 16): rank floor at k + tie extension +
    // the reconstruction-radius error band — the hand-tuned 800
    // replaced by the index's own statistic
    val rmax2 = timed("reconErrMax (one corpus pass)")(
      Pq.reconErrMax(docs, model))
    println(s"SOAK ivfpq reconErrMax $rmax2")
    val adcAuto = timed("ADC AUTO shortlist + refine, 8-cell probe")(
      graft.operators.Pin(Pq.searchAdcRerankIndex(index, docs, model, qPred, k,
        probes = 8, shortlist = 0, rmax2 = rmax2), eager = true))

    val brute = Similarity.knnBrute(docs, qPred, k)
      .select(col("query_id"), col("neighbor_id"))
      .transform(graft.operators.Pin(_, eager = true))
    val hitsFull = brute.intersect(
      adc.select(col("query_id"), col("neighbor_id"))).count()
    val hitsPart = brute.intersect(
      adcPartial.select(col("query_id"), col("neighbor_id"))).count()
    val hitsAuto = brute.intersect(
      adcAuto.select(col("query_id"), col("neighbor_id"))).count()
    println(s"SOAK ivfpq recall full-probe $hitsFull/${10 * k} " +
      s"8-probe $hitsPart/${10 * k} auto-8-probe $hitsAuto/${10 * k} " +
      "(vs exact cosine brute)")

    // uncompressed IVF baseline on the same codebook size
    import spark.implicits._
    val fine = model.coarse.toDF("cent_id", "cembedding")
    timed(s"uncompressed ivfSearchJoin baseline ($nVec x $cells floats)")(
      graft.operators.Pin(Similarity.ivfSearchJoin(
        Similarity.withNorm(docs), fine, qPred, k, probes = 2), eager = true))
    spark.stop()
  }
}

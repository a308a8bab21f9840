package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev soak probe (test scope): the TWO-LEVEL IVF coarse quantizer at
  * a large-codebook scale — the claim is the ASSIGNMENT product cut
  * (corpus × cells → corpus × coarseProbes·cells/coarseCells), so the
  * fine codebook is deterministic (first `cells` corpus vectors) and
  * both shapes run the identical rerank tail. Clustered synthetic
  * corpus (the regime IVF exists for); records single-level vs
  * two-level wall, full-coarse-probe equivalence, and partial-probe
  * recall vs brute force. Results in BENCH_SF10.md.
  *
  * Usage: sbt "Test/runMain graft.SoakIvf2 [vectors] [cells]"
  */
object SoakIvf2 {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toInt).getOrElse(200000)
    val cells = args.lift(1).map(_.toInt).getOrElse(2048)
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
    println(s"SOAK ivf2 vectors ${docs.count()} cells $cells clusters $nClusters")

    val n = Similarity.withNorm(docs)
    val fine = docs.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cembedding"))
      .transform(graft.operators.Pin(_, eager = true))
    val qPred = col("vec_id") % (nVec / 10) === 0 // 10 queries

    val single = timed(s"single-level ivfSearchJoin ($nVec x $cells product)")(
      graft.operators.Pin(Similarity.ivfSearchJoin(
        n, fine, qPred, k = 5, probes = 4), eager = true))
    val coarseCells = 64; val fullProbes = 64
    val twoFull = timed("two-level, FULL coarse probe (equivalence run)")(
      graft.operators.Pin(Similarity.ivfTwoLevelSearch(
        n, fine, qPred, k = 5, probes = 4,
        coarseCells = coarseCells, coarseProbes = fullProbes), eager = true))
    val mism = single.unionAll(twoFull)
      .groupBy(col("query_id"), col("neighbor_id"), col("rank"))
      .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    println(s"SOAK ivf2 full-probe mismatches $mism " +
      (if (mism == 0) "EXACT" else "BROKEN"))
    val two = timed(s"two-level, 8/$coarseCells coarse probes (the scale shape)")(
      graft.operators.Pin(Similarity.ivfTwoLevelSearch(
        n, fine, qPred, k = 5, probes = 4,
        coarseCells = coarseCells, coarseProbes = 8), eager = true))
    val brute = Similarity.knnBrute(docs, qPred, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = timed("recall check")(
      brute.intersect(two.select(col("query_id"), col("neighbor_id"))).count())
    println(s"SOAK ivf2 partial-probe recall $hits/50")
    spark.stop()
  }
}

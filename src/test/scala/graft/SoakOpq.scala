package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Opq, Pin, Pq}

/** Dev soak probe (test scope): OPQ rotation at scale — does the
  * eigenbasis rotation's tighter reconstruction radius shrink the auto
  * shortlist's admitted-candidate volume (and with it the refine-join
  * wall) beyond OpqSpec's 2k-row planted corpus? Two corpora at the
  * SoakIvfPq scale point:
  *   - ANISOTROPIC (exp(-j/10) per-dimension scales — the PCA-ordered
  *     decay real embedding models emit): the case OPQ exists for;
  *   - ISOTROPIC (SoakIvfPq's generator verbatim): the honest control
  *     — PQ's subspace split is already balanced there, so rotation
  *     should buy ~nothing.
  * Both run the PERSISTED index path (Opq.buildIndex/searchIndex vs
  * Pq.buildIndex/searchIndex) so the numbers describe the deployment
  * shape, not the in-memory convenience. Results in BENCH_SF10.md.
  *
  * Usage: sbt "Test/runMain graft.SoakOpq [vectors] [cells]"
  */
object SoakOpq {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toInt).getOrElse(200000)
    val cells = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SOAK time $label $sec%.2f s")
      (r, sec)
    }

    val Dim = graft.functions.VectorFunctions.Dim
    val nClusters = 512
    val m = 8; val ksub = 256
    val k = 5
    val probes = 8

    def corpus(aniso: Boolean): DataFrame = {
      val scales =
        if (aniso) Array.tabulate(Dim)(j => math.exp(-j / 10.0).toFloat)
        else Array.fill(Dim)(1.0f)
      val rnd = new scala.util.Random(19)
      val centers = Array.fill(nClusters)(
        Array.tabulate(Dim)(j => rnd.nextGaussian().toFloat * scales(j)))
      // noise 0.3 relative to the center spread: partially-overlapping
      // clusters, the OpqSpec admitted-volume fixture — at 0.05 the
      // band saturates at the home cluster and measures nothing
      spark.range(nVec).mapPartitions { it =>
        it.map { i =>
          val r2 = new scala.util.Random(i * 7919L)
          val c = centers((i % nClusters).toInt)
          (i, Array.tabulate(Dim)(j =>
            c(j) + 0.3f * scales(j) * r2.nextGaussian().toFloat).toSeq)
        }
      }.toDF("vec_id", "embedding").transform(Pin(_, eager = true))
    }

    def run(label: String, docs: DataFrame): Unit = {
      println(s"SOAK opq corpus=$label vectors $nVec cells $cells")
      val tmpP = java.nio.file.Files.createTempDirectory("graft_soakopq_p").toString
      val tmpO = java.nio.file.Files.createTempDirectory("graft_soakopq_o").toString
      val pPlain = s"soakopq_${label}_plain"
      val pOpq = s"soakopq_${label}_opq"
      val (plain, _) = timed(s"$label plain PQ train")(
        Pq.train(docs, cells, m, ksub))
      val (opq, _) = timed(s"$label OPQ learnRotation + train")(
        Opq.train(docs, cells, m, ksub))
      val (idxP, _) = timed(s"$label plain buildIndex")(
        Pq.buildIndex(docs, plain, tmpP, pPlain, buckets = 32))
      val (idxO, _) = timed(s"$label OPQ buildIndex")(
        Opq.buildIndex(docs, opq, tmpO, pOpq, buckets = 32))
      println(s"SOAK opq $label reconErrMax plain ${idxP.rmax2} opq ${idxO.rmax2}")

      val qPred = col("vec_id") % (nVec / 10) === 0 // 10 queries
      def vol(codes: DataFrame, mdl: Pq.PqModel, c: DataFrame, rmax2: Long): Long =
        Pq.autoAdmittedCounts(codes, c, mdl, qPred, k, probes, rmax2)
          .agg(sum(col("n_admitted"))).collect()(0).getLong(0)
      val (volP, _) = timed(s"$label plain admitted-volume pass")(
        vol(idxP.codes, plain, docs, idxP.rmax2))
      val (volO, _) = timed(s"$label OPQ admitted-volume pass")(
        vol(idxO.codes, opq.pq, Opq.rotate(docs, opq.rot), idxO.rmax2))
      println(f"SOAK opq $label admitted plain $volP opq $volO " +
        f"(${volP.toDouble / math.max(volO, 1)}%.2fx cut)")

      val (resP, wallP) = timed(s"$label plain searchIndex auto")(
        Pin(Pq.searchIndex(idxP, docs, plain, qPred, k, probes), eager = true))
      val (resO, wallO) = timed(s"$label OPQ searchIndex auto")(
        Pin(Opq.searchIndex(idxO, docs, qPred, k, probes), eager = true))
      println(f"SOAK opq $label search wall plain $wallP%.2f s opq $wallO%.2f s")

      val brute = graft.operators.Similarity.knnBrute(docs, qPred, k)
        .select(col("query_id"), col("neighbor_id"))
        .transform(Pin(_, eager = true))
      val hitsP = brute.intersect(
        resP.select(col("query_id"), col("neighbor_id"))).count()
      val hitsO = brute.intersect(
        resO.select(col("query_id"), col("neighbor_id"))).count()
      println(s"SOAK opq $label recall plain $hitsP/${10 * k} opq $hitsO/${10 * k}")
      Seq(pPlain, pOpq).foreach { p =>
        spark.sql(s"DROP TABLE IF EXISTS ${p}_codes")
        spark.sql(s"DROP TABLE IF EXISTS ${p}_meta")
        spark.sql(s"DROP TABLE IF EXISTS ${p}_model")
      }
      Pin.release(docs)
    }

    run("aniso", corpus(aniso = true))
    run("iso", corpus(aniso = false))
    spark.stop()
  }
}

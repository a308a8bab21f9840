package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Dev soak probe (test scope): streaming vector ingest into the
  * persisted IVF-PQ index (streaming.VectorIngest / Pq.appendIndex) —
  * the claim is per-batch cost FLAT in the base index size (each
  * batch pays encode-of-batch + a bucketed append + one batch-sized
  * radius pass; nothing scales with what is already indexed), plus a
  * nightly-compaction wall and a post-compaction search identical to
  * the batch build. Results in BENCH_SF10.md.
  *
  * Usage: sbt "Test/runMain graft.SoakPqIngest [baseVectors] [batches] [batchSize]"
  */
object SoakPqIngest {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val batchSize = args.lift(2).map(_.toInt).getOrElse(2000)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SOAK time $label $dt%.2f s")
      (r, dt)
    }

    val Dim = graft.functions.VectorFunctions.Dim
    val nClusters = 512
    val rnd = new scala.util.Random(19)
    val centers = Array.fill(nClusters)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    def mkVecs(from: Long, n: Int) = spark.range(from, from + n).mapPartitions { it =>
      it.map { i =>
        val r2 = new scala.util.Random(i * 7919L)
        val c = centers((i % nClusters).toInt)
        (i, c.map(x => x + 0.05f * r2.nextGaussian().toFloat).toSeq)
      }
    }.toDF("vec_id", "embedding")

    val base = mkVecs(0, nBase).transform(graft.operators.Pin(_, eager = true))
    println(s"SOAK pqingest base ${base.count()} batches $nBatches x $batchSize")

    val model = timed("train")(Pq.train(base, cells = 256, m = 8, ksub = 256))._1
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqingest").toString
    val prefix = "soak_pqidx"
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_codes")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_meta")
    val built = timed("buildIndex (encode + radius + bucketed write)")(
      Pq.buildIndex(base, model, tmp, prefix))._1
    println(s"SOAK pqingest built rmax2 ${built.rmax2}")

    // per-batch append cost: must stay flat while the index grows
    val walls = (0 until nBatches).map { b =>
      val delta = mkVecs(1000000L + b.toLong * batchSize, batchSize)
      timed(s"append batch $b")(
        Pq.appendIndex(delta, model, prefix))._2
    }
    println(f"SOAK pqingest append walls first ${walls.head}%.2f s " +
      f"last ${walls.last}%.2f s max ${walls.max}%.2f s " +
      f"(flat = no growth with index size)")

    val grown = Pq.readIndex(spark, prefix)
    println(s"SOAK pqingest grown rows ${grown.codes.count()} rmax2 ${grown.rmax2}")

    val compacted = timed("nightly compactIndex")(
      Pq.compactIndex(spark, s"$tmp/compact", prefix))._1
    println(s"SOAK pqingest compacted rows ${compacted.codes.count()}")

    // search sanity on the grown index: appended ids must be findable
    val union = base.unionByName(mkVecs(1000000L, nBatches * batchSize))
    val qPred = col("vec_id") >= 1000000L && col("vec_id") < 1000010L
    val (hits, _) = timed("searchIndex 10 queries (sidecar radius, no corpus pass)")(
      Pq.searchIndex(compacted, union, model, qPred, k = 5, probes = 8).count())
    println(s"SOAK pqingest search rows $hits")

    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_codes")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_meta")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Pq

/** The PERSISTED IVF-PQ index (Pq.buildIndex / appendIndex /
  * compactIndex / searchIndex): the deployment shape the round-16
  * verdict asked for — bucketed codes table + the reconErrMax radius
  * sidecar refreshed on append/compact, zero-exchange bucket-pruned
  * probe plans, and the streaming ingest path
  * (streaming.VectorIngest). */
class PqIndexSpec extends SparkTestBase {

  private val Dim = VectorFunctions.Dim

  private def plantedCorpus(nVec: Int, nClusters: Int, scale: Float = 0.05f,
                            idOffset: Long = 0L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    val centers = Array.fill(nClusters)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    (0 until nVec).map { i =>
      val r2 = new scala.util.Random(i * 7919L + 13)
      val c = centers(i % nClusters)
      (i.toLong + idOffset, c.map(x => x + scale * r2.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def dropIndex(prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_codes")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_meta")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_codes_compacting")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_meta_compacting")
  }

  private def searchSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("persisted index == in-memory search; sidecar radius == reconErrMax") {
    val prefix = "pqidx_eq"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    try {
      val corpus = plantedCorpus(1500, 16)
      val model = Pq.train(corpus, cells = 8, m = 8, ksub = 32, seed = 42L)
      val idx = Pq.buildIndex(corpus, model, tmp, prefix, buckets = 8)
      assert(idx.rmax2 == Pq.reconErrMax(corpus, model),
        "sidecar must carry the build-time radius")
      val k = 10
      val qPred = col("vec_id") < 8
      val mem = searchSet(Pq.searchAdcRerank(corpus, model, qPred, k,
        probes = model.coarse.size))
      val per = searchSet(Pq.searchIndex(idx, corpus, model, qPred, k,
        probes = model.coarse.size))
      assert(per == mem, s"persisted search diverged from in-memory")
      assert(per.nonEmpty)
    } finally dropIndex(prefix)
  }

  test("probe plan: bucket-pruned scan, no exchange above the index side") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import spark.implicits._
    val prefix = "pqidx_plan"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      val corpus = plantedCorpus(1500, 16)
      val model = Pq.train(corpus, cells = 8, m = 8, ksub = 32, seed = 42L)
      val idx = Pq.buildIndex(corpus, model, tmp, prefix, buckets = 8)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // the candidate join EXACTLY as searchIndex probes it: a bounded
      // broadcast side joined on the bucket column, the index scan
      // pre-filtered to the probed cells
      val probeSide = broadcast(Seq((0L, 1L), (2L, 1L)).toDF("cell", "query_id"))
      val probe = probeSide.join(
        idx.codes.filter(col("cell").isin(0L, 2L)), Seq("cell"))
      val scans = probe.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.contains("codes")) => f
      }
      assert(scans.nonEmpty, "no file scan over the codes table")
      // bucket pruning: the IN filter on the bucket column must reach
      // the scan as a selected-bucket set strictly smaller than all
      val pruned = scans.exists(f => f.optionalBucketSet.exists(_.cardinality() < 8))
      assert(pruned,
        s"probed-cell filter did not bucket-prune:\n${probe.queryExecution.executedPlan}")
      val shuffled = probe.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.contains("codes"))
          case _ => false
        }
      }.exists(identity)
      assert(!shuffled,
        s"index side shuffled:\n${probe.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      dropIndex(prefix)
    }
  }

  test("append refreshes the radius; grown-index search covers appended rows") {
    val prefix = "pqidx_grow"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    try {
      // tight base clusters -> small build radius; the delta sits FAR
      // from every centroid, so its residuals exceed the old bound —
      // the exact staleness the sidecar refresh exists for
      val base = plantedCorpus(1200, 16, scale = 0.02f)
      val model = Pq.train(base, cells = 8, m = 8, ksub = 32, seed = 42L)
      val built = Pq.buildIndex(base, model, tmp, prefix, buckets = 8)
      val delta = plantedCorpus(300, 4, scale = 3.0f, idOffset = 100000L)
      assert(Pq.reconErrMax(delta, model) > built.rmax2,
        "fixture must make the delta exceed the build radius")
      Pq.appendIndex(delta, model, prefix, buckets = 8)
      val grown = Pq.readIndex(spark, prefix)
      assert(grown.rmax2 > built.rmax2, "append must refresh the radius")
      val union = base.unionByName(delta)
      assert(grown.rmax2 == Pq.reconErrMax(union, model),
        "sidecar max must bound the union")
      assert(grown.codes.count() == 1500)
      // search the grown index with an appended query: equals the
      // in-memory auto search over the union corpus
      val k = 5
      val qPred = col("vec_id") >= 100000L && col("vec_id") < 100004L
      val mem = searchSet(Pq.searchAdcRerank(union, model, qPred, k,
        probes = model.coarse.size))
      val per = searchSet(Pq.searchIndex(grown, union, model, qPred, k,
        probes = model.coarse.size))
      assert(per == mem, "grown-index search diverged from in-memory")
    } finally dropIndex(prefix)
  }

  test("compaction: drops retry duplicates, collapses the sidecar, output identical") {
    val prefix = "pqidx_compact"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_pqidx_c").toString
    try {
      val base = plantedCorpus(1000, 8)
      val model = Pq.train(base, cells = 8, m = 8, ksub = 32, seed = 42L)
      Pq.buildIndex(base, model, tmp, prefix, buckets = 8)
      val delta = plantedCorpus(200, 4, idOffset = 50000L)
      Pq.appendIndex(delta, model, prefix, buckets = 8)
      Pq.appendIndex(delta, model, prefix, buckets = 8) // the RETRY
      val dup = Pq.readIndex(spark, prefix)
      assert(dup.codes.count() == 1400, "retry should have duplicated rows")
      val k = 5
      val union = base.unionByName(delta)
      val qPred = col("vec_id") < 4
      // searchIndex is duplicate-proof (candidate dedup) even BEFORE
      // compaction
      val preCompact = searchSet(Pq.searchIndex(dup, union, model, qPred, k,
        probes = model.coarse.size))
      val compacted = Pq.compactIndex(spark, tmp2, prefix, buckets = 8)
      assert(compacted.codes.count() == 1200, "compaction must drop duplicates")
      assert(compacted.rmax2 == dup.rmax2, "compaction must keep the radius")
      assert(spark.table(s"${prefix}_meta").count() == 1,
        "sidecar must collapse to one row")
      val postCompact = searchSet(Pq.searchIndex(compacted, union, model, qPred, k,
        probes = model.coarse.size))
      assert(postCompact == preCompact, "compaction changed search output")
      assert(postCompact ==
        searchSet(Pq.searchAdcRerank(union, model, qPred, k,
          probes = model.coarse.size)),
        "duplicated-index search diverged from the clean in-memory run")
    } finally dropIndex(prefix)
  }

  test("streaming ingest: stream == batch encode, radius refreshed per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val prefix = "pqidx_stream"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pqidx_ck").toString
    try {
      val base = plantedCorpus(800, 8, scale = 0.02f)
      val model = Pq.train(base, cells = 8, m = 8, ksub = 32, seed = 42L)
      val built = Pq.buildIndex(base, model, tmp, prefix, buckets = 8)
      val b1 = plantedCorpus(150, 4, scale = 0.02f, idOffset = 10000L)
      val b2 = plantedCorpus(150, 4, scale = 2.0f, idOffset = 20000L)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float])]
      val stream = graft.streaming.VectorIngest.pqIngestStream(
        input.toDF().toDF("vec_id", "embedding"), model, prefix, ckpt, buckets = 8)
      try {
        input.addData(b1.as[(Long, Seq[Float])].collect().toSeq)
        stream.processAllAvailable()
        input.addData(b2.as[(Long, Seq[Float])].collect().toSeq)
        stream.processAllAvailable()
      } finally stream.stop()
      val grown = Pq.readIndex(spark, prefix)
      val union = base.unionByName(b1).unionByName(b2)
      // stream == batch: the streamed-in codes table holds exactly the
      // batch encode of the union
      val streamed = grown.codes.select("vec_id", "cell", "pq")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Array[Byte]](2).toSeq)).toSet
      val batch = Pq.encode(union, model).select("vec_id", "cell", "pq")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Array[Byte]](2).toSeq)).toSet
      assert(streamed == batch,
        s"streamed index != batch encode: onlyStreamed=${(streamed -- batch).take(5)} " +
          s"onlyBatch=${(batch -- streamed).take(5)} " +
          s"sizes ${streamed.size}/${batch.size}")
      // the far-out second batch must have refreshed the radius
      assert(grown.rmax2 > built.rmax2, "stream did not refresh the radius")
      assert(grown.rmax2 == Pq.reconErrMax(union, model))
    } finally dropIndex(prefix)
  }

  test("rebuild at the same basePath; nightly compaction re-runs at the same compactPath") {
    val prefix = "pqidx_rerun"
    val tmp = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    val tmpC = java.nio.file.Files.createTempDirectory("graft_pqidx_c").toString
    try {
      val base = plantedCorpus(600, 8)
      val model = Pq.train(base, cells = 8, m = 8, ksub = 32, seed = 42L)
      Pq.buildIndex(base, model, tmp, prefix, buckets = 8)
      // REBUILD at the same basePath: the external meta files survive
      // the catalog DROP, so the second build must overwrite them, not
      // die on ErrorIfExists (round-17 advice)
      val rebuilt = Pq.buildIndex(base, model, tmp, prefix, buckets = 8)
      assert(rebuilt.codes.count() == 600)
      val k = 5
      val qPred = col("vec_id") < 4
      val want = searchSet(Pq.searchAdcRerank(base, model, qPred, k,
        probes = model.coarse.size))
      // THREE nightly compactions against ONE compactPath: run 1 lands
      // in the _a dirs, run 2 alternates to _b (never overwriting the
      // live _a file set it is reading), run 3 returns to _a over the
      // stale run-1 files (the overwrite-stale-dir path)
      (1 to 3).foreach { night =>
        val c = Pq.compactIndex(spark, tmpC, prefix, buckets = 8)
        assert(c.codes.count() == 600, s"night $night lost rows")
        assert(searchSet(Pq.searchIndex(c, base, model, qPred, k,
          probes = model.coarse.size)) == want,
          s"night $night changed search output")
      }
    } finally dropIndex(prefix)
  }

  test("auto mode without a radius is refused, not silently weak") {
    val corpus = plantedCorpus(200, 4)
    val model = Pq.train(corpus, cells = 4, m = 4, ksub = 16, seed = 7L)
    val idx = Pq.encode(corpus, model).select(col("vec_id"), col("cell"), col("pq"))
    val e = intercept[IllegalArgumentException] {
      Pq.searchAdcRerankIndex(idx, corpus, model, col("vec_id") < 2,
        k = 3, probes = 2)
    }
    assert(e.getMessage.contains("reconErrMax"))
  }
}

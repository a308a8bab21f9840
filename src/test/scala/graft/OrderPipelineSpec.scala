package graft

import org.apache.spark.sql.functions._

import graft.queries.{OrderOps, PipelineOps}

/** Composition invariants for the round-12 ordering/selection tier
  * and the q96 capstone — the properties the oracles verify only
  * implicitly (the oracle checks the VALUES; these check the
  * structural claims a consumer relies on). */
class OrderPipelineSpec extends SparkTestBase {

  private def q(name: String) =
    (OrderOps.all ++ PipelineOps.all).find(_.name == name).get.run(spark, sfDir)

  test("q98: pos is a permutation of 1..N, phases non-decreasing, in-phase order") {
    val rows = q("q98_curriculum_order")
      .orderBy(col("pos")).collect()
    val n = rows.length
    assert(rows.map(_.getLong(3)).toSeq == (1L to n).toSeq,
      "pos is not the dense 1..N numbering")
    val phases = rows.map(_.getLong(1))
    assert(phases.zip(phases.tail).forall { case (a, b) => a <= b },
      "curriculum phases must be non-decreasing along the stream")
    rows.groupBy(_.getLong(1)).values.foreach { g =>
      val keys = g.sortBy(_.getLong(3)).map(r => (r.getLong(2), r.getLong(0)))
      assert(keys.sameElements(keys.sortBy(identity)),
        "within a phase the order must be (skey, doc_id)")
    }
  }

  test("q99: per-source ranks are the kept prefix and the budget is a floor") {
    val rows = q("q99_token_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val byRank = g.sortBy(_._4)
      // kept set is exactly ranks 1..k (a PREFIX of the quality order)
      assert(byRank.map(_._4).toSeq == (1L to g.length).toSeq,
        s"$src kept a non-prefix of the quality ranking")
      // running sum is consistent and every kept doc started under budget
      var cum = 0L
      byRank.foreach { case (_, _, tok, _, cumBefore) =>
        assert(cumBefore == cum, s"$src cum_before drifted")
        assert(cumBefore < OrderOps.Budget)
        cum += tok
      }
      // floor semantics: the kept prefix reaches the budget (unless
      // the source ran out of documents entirely — then everything
      // is kept and the total may sit under it)
      assert(cum >= OrderOps.Budget || byRank.length == g.length)
    }
  }

  test("tokenBudget: pre-pruned kept set is byte-identical to the exact window") {
    import spark.implicits._
    import graft.operators.Curriculum
    val rnd = new scala.util.Random(13)
    // planted shapes: a giant source (most of it prunable), a source
    // whose total fits under the budget (keep-all), a tie-heavy
    // source (threshold can't separate — prune must degrade, not
    // drop), and a source with NULL scores mixed in
    val rows =
      (1L to 2000L).map(i => ("giant", i, rnd.nextDouble() * 10, 1L + rnd.nextInt(20).toLong)) ++
      (1L to 5L).map(i => ("tiny", i, rnd.nextDouble(), 10L)) ++
      (1L to 400L).map(i => ("ties", i, if (i % 7 == 0) 2.0 else 1.0, 5L)) ++
      (1L to 300L).map(i => ("nulls", i,
        if (i % 3 == 0) Double.NaN else rnd.nextDouble(), 8L))
    val df = rows.toDF("source", "doc_id", "qs0", "tok0")
      .select(col("source"), col("doc_id"),
        when(isnan(col("qs0")), lit(null)).otherwise(col("qs0")).as("qs0"),
        col("tok0"))
    for (budget <- Seq(37L, 500L, 100000L); bins <- Seq(8, 4096)) {
      val exact = Curriculum.tokenBudget(df, budget, col("qs0"), col("tok0"),
          prePrune = false).collect().map(_.toSeq).toSet
      val pruned = Curriculum.tokenBudget(df, budget, col("qs0"), col("tok0"),
          prePrune = true, bins = bins).collect().map(_.toSeq).toSet
      assert(pruned == exact,
        s"budget=$budget bins=$bins: pruned set diverged from exact " +
          s"(only-pruned=${(pruned -- exact).take(3)}, only-exact=${(exact -- pruned).take(3)})")
    }
    // the prune is a real prune: on the giant source with a small
    // budget the window input is a sliver, not the source
    val sliver = Curriculum.pruneSliver(
      df.select(col("source"), col("doc_id"), col("qs0").as("qs"),
        col("tok0").as("tok")), 37L, "source", 4096)
      .filter(col("source") === "giant").count()
    assert(sliver < 200L,
      s"giant-source sliver should be near the budget, got $sliver of 2000")
    // an all-NULL-score source survives untouched (no cut exists)
    val allNull = Seq(("n", 1L, Option.empty[Double], 5L),
      ("n", 2L, Option.empty[Double], 5L)).toDF("source", "doc_id", "qs0", "tok0")
    val keptNull = Curriculum.tokenBudget(allNull, 100L, col("qs0"), col("tok0"))
      .collect().map(_.getLong(1)).toSet
    assert(keptNull == Set(1L, 2L), s"all-NULL source lost docs: $keptNull")
  }

  test("curriculumOrder: parameterized thresholds/salt reproduce and re-order") {
    import spark.implicits._
    import graft.operators.Curriculum
    val d = (1L to 100L).map(i => (i, i / 100.0)).toDF("doc_id", "s")
    val a = Curriculum.curriculumOrder(d, col("s"), thresholds = Seq(0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(a.map(_._2).toSet == Set(0L, 1L), "one threshold -> two phases")
    assert(a.sortBy(_._3).map(_._3).toSeq == (1L to 100L).toSeq, "dense pos")
    // phase 0 = s >= 0.5 ranks wholly before phase 1
    val byPos = a.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (x, y) => x <= y })
    // multi-threshold nesting: the HIGHEST threshold must win (the
    // fold-order bug the oracle caught in round 13)
    val m = Curriculum.curriculumOrder(d, col("s"),
      thresholds = Seq(0.8, 0.6, 0.4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(90L) == 0L && m(70L) == 1L && m(50L) == 2L && m(10L) == 3L,
      s"threshold bands misassigned: ${m.toSeq.sortBy(_._1).take(10)}")
    // a different salt permutes within-phase order but not membership
    val b = Curriculum.curriculumOrder(d, col("s"), thresholds = Seq(0.5),
      salt = "other:")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(a.map(x => x._1 -> x._2).toMap == b.map(x => x._1 -> x._2).toMap,
      "salt must not change phase membership")
    assert(a.map(x => x._1 -> x._3).toMap != b.map(x => x._1 -> x._3).toMap,
      "a different salt should permute the in-phase order")
  }

  test("capstone tail stages: curriculum order and per-source token budget compose") {
    import graft.operators.Curriculum
    import graft.functions.TextFunctions
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val default = PipelineOps.capstone(raw).collect()
    // curriculum tail: same multiset of packed tokens (a permutation
    // of the stream), bins still contiguous from 0
    val curr = PipelineOps.capstone(raw, curriculumTail = true).collect()
    assert(curr.map(_.getLong(0)).toSeq == (0L until curr.length).toSeq,
      "curriculum-ordered bins must stay contiguous")
    assert(curr.map(_.getLong(2)).sum == default.map(_.getLong(2)).sum &&
      curr.map(_.getLong(1)).sum == default.map(_.getLong(1)).sum,
      "curriculum tail must permute the stream, not change its content")
    assert(curr.map(r => (r.getLong(2), r.getLong(3))).toSeq !=
      default.map(r => (r.getLong(2), r.getLong(3))).toSeq,
      "curriculum tail should actually re-order the packed stream")
    // budget tail: strictly fewer packed tokens than the un-budgeted
    // stream, and bounded by #sources x (budget + max doc straddle)
    val b = 200L
    val bud = PipelineOps.capstone(raw, budgetPerSource = Some(b)).collect()
    assert(bud.map(_.getLong(2)).sum < default.map(_.getLong(2)).sum,
      "a tight budget must shrink the packed stream")
    assert(bud.nonEmpty && bud.map(_.getLong(3)).min >= PipelineOps.BenchDocs)
  }

  test("incremental capstone equals the batch front restricted to the delta") {
    import spark.implicits._
    def ws(seed: String, n: Int) = (1 to n).map(i => s"$seed$i").mkString(" ")
    val benchText = "the held out benchmark passage with forty plus " +
      "characters of exact evaluation text content appearing verbatim here"
    val bench = Seq((-1L, benchText)).toDF("doc_id", "text")
    val real = Tables.documents(spark, sfDir).orderBy("doc_id").limit(20)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val b1 = ws("alpha", 40); val b2 = ws("beta", 40)
    val base = (real ++ Seq(2001L -> b1, 2002L -> b2)).toDF("doc_id", "text")
    val delta = Seq(
      5001L -> b1,                                               // exact dup of base
      5002L -> ((1 to 38).map(i => s"beta$i") ++ Seq("zz1", "zz2")).mkString(" "), // near-dup of base
      5003L -> ws("gamma", 40),                                  // fresh
      5004L -> ((1 to 38).map(i => s"gamma$i") ++ Seq("qq1", "qq2")).mkString(" "), // near-dup of 5003
      5006L -> ((1 to 36).map(i => s"beta$i") ++ Seq("zz1", "zz2", "ww1", "ww2")).mkString(" "), // chained to base via 5002
      5007L -> (ws("fresh", 20) + " " + benchText.take(60) + " " + ws("tail", 20)) // contaminated
    ).toDF("doc_id", "text")

    val idx = PipelineOps.baseIndexes(base, bench)
    val inc = PipelineOps.incrementalCapstone(idx, delta, bench)
      .as[(Long, String)].collect().toSet
    val batchRestricted = PipelineOps.frontSurvivors(
      base.unionByName(delta), bench)
      .filter(col("doc_id") >= 5000L)
      .as[(Long, String)].collect().toSet
    assert(inc == batchRestricted,
      s"incremental != batch-restricted: only-inc=${(inc -- batchRestricted).map(_._1)}, " +
        s"only-batch=${(batchRestricted -- inc).map(_._1)}")
    val keptIds = inc.map(_._1)
    assert(!keptIds.contains(5001L), "exact dup of base survived")
    assert(!keptIds.contains(5002L), "near-dup of base survived the band probe")
    assert(!keptIds.contains(5006L), "member of a base-hit cluster survived")
    assert(keptIds.contains(5003L) && !keptIds.contains(5004L),
      s"within-delta cluster must keep its min id only: $keptIds")
    val d7 = inc.find(_._1 == 5007L)
    assert(d7.isDefined, "contaminated doc must survive with its spans cut")
    assert(!d7.get._2.contains(benchText.take(45)),
      "benchmark span not stripped from the surviving delta doc")
  }

  test("persisted bucketed base indexes: identical output, zero exchanges on the index side") {
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def ws(seed: String, n: Int) = (1 to n).map(i => s"$seed$i").mkString(" ")
    val bench = Seq((-1L, "the held out benchmark passage with forty plus " +
      "characters of exact evaluation text content appearing verbatim here"))
      .toDF("doc_id", "text")
    val base = ((1 to 30).map(i => (1000L + i) -> ws(s"b$i ", 40)) :+
      (2001L -> ws("alpha", 40))).toDF("doc_id", "text")
    val delta = Seq(
      5001L -> ws("alpha", 40),  // exact dup of base
      5002L -> ws("gamma", 40)   // fresh
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_baseidx").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      val idx = PipelineOps.baseIndexes(base, bench)
      val pidx = PipelineOps.persistBaseIndexes(idx, tmp, buckets = 32)

      // output equality: the persisted-index run IS the in-memory run
      val mem = PipelineOps.incrementalCapstone(idx, delta, bench)
        .as[(Long, String)].collect().toSet
      val per = PipelineOps.incrementalCapstone(pidx, delta, bench)
        .as[(Long, String)].collect().toSet
      assert(per == mem, s"persisted-index output diverged: $per vs $mem")
      assert(per.map(_._1) == Set(5002L))

      // plan gate (AQE off so the physical tree is directly walkable;
      // the pins inside incrementalCapstone hide its internal joins,
      // so gate the two index probes EXACTLY as the operator builds
      // them): no ShuffleExchange may sit above a bucketed index scan
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def indexScanUnderExchange(df: org.apache.spark.sql.DataFrame,
                                 table: String): Boolean =
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.collectLeaves().exists {
            case f: FileSourceScanExec =>
              f.tableIdentifier.exists(_.table.contains(table))
            case _ => false
          }
        }.exists(identity)
      def hasBucketedScan(df: org.apache.spark.sql.DataFrame,
                          table: String): Boolean =
        df.queryExecution.executedPlan.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.contains(table)) && f.bucketedScan
          case _ => false
        }
      val fpJoin = delta
        .withColumn("_fp", TextFunctions.fingerprint(col("text")))
        .join(pidx.rawFp.select(col("fp").as("_fp")).hint("SHUFFLE_HASH"),
          Seq("_fp"), "left_anti")
      assert(hasBucketedScan(fpJoin, "rawfp"),
        "fp index must plan as a bucketed scan")
      assert(!indexScanUnderExchange(fpJoin, "rawfp"),
        s"fp anti-join shuffles the persisted index:\n${fpJoin.queryExecution.executedPlan}")
      assert(fpJoin.count() == 1) // 5001 dropped against the base fp index

      val sig = Dedup.withSignatureFromHashes(Dedup.shingleHashRows(
        PipelineOps.deconFront(fpJoin.drop("_fp"), bench)
          .select(col("doc_id"), col("clean_text").as("text"))))
      // hint on the DELTA side as the operator builds it: the hash
      // map must be delta-sized (build-index OOMed the 5M soak), and
      // the bucketed index still streams exchange-free
      val bandProbe = Dedup.lshBuckets(sig).hint("SHUFFLE_HASH")
        .join(pidx.deconBands
          .select(col("b"), col("bkey"), col("sg").as("_bsg")), Seq("b", "bkey"))
      assert(hasBucketedScan(bandProbe, "bands"),
        "band index must plan as a bucketed scan")
      assert(!indexScanUnderExchange(bandProbe, "bands"),
        s"band probe shuffles the persisted index:\n${bandProbe.queryExecution.executedPlan}")
      import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
      assert(bandProbe.queryExecution.executedPlan.collect {
        case j: ShuffledHashJoinExec => j.buildSide
      }.forall(_ == org.apache.spark.sql.catalyst.optimizer.BuildLeft),
        "band probe must build the DELTA side hash map")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_rawfp")
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_bands")
    }
  }

  test("nightly compaction: append deltas, compact, identical output, still bucketed, one file set") {
    import spark.implicits._
    def ws(seed: String, n: Int) = (1 to n).map(i => s"$seed$i").mkString(" ")
    val bench = Seq((-1L, "the held out benchmark passage with forty plus " +
      "characters of exact evaluation text content appearing verbatim here"))
      .toDF("doc_id", "text")
    val base = ((1 to 30).map(i => (1000L + i) -> ws(s"b$i ", 40)) :+
      (2001L -> ws("alpha", 40))).toDF("doc_id", "text")
    val delta1 = Seq(
      5001L -> ws("alpha", 40), // exact dup of base -> drops, indexes nothing
      5002L -> ws("gamma", 40)  // fresh -> survives and must be indexed
    ).toDF("doc_id", "text")
    val delta2 = Seq(
      6001L -> ws("gamma", 40), // exact dup of DELTA1's survivor
      6002L -> ((1 to 38).map(i => s"gamma$i") ++ Seq("qq1", "qq2"))
        .mkString(" "),         // near-dup of delta1's survivor
      6003L -> ws("delta", 40)  // fresh
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    try {
      val idx0 = PipelineOps.baseIndexes(base, bench)
      val pidx = PipelineOps.persistBaseIndexes(idx0, s"$tmp/v0", buckets = 32)
      // day 1: process delta1 against the persisted base, APPEND its
      // index delta to the tables (the deployment growth path)
      def parquetFiles(dir: String): Seq[String] =
        new java.io.File(dir).list().toSeq.filter(_.endsWith(".parquet"))
      val fpFilesBase = parquetFiles(s"$tmp/v0/rawfp").size
      val (_, d1idx) = PipelineOps.incrementalStep(pidx, delta1, bench)
      PipelineOps.appendBaseIndexes(d1idx)
      val fpFilesBefore = parquetFiles(s"$tmp/v0/rawfp").size
      assert(fpFilesBefore > fpFilesBase, "append added no index files")
      // reference: delta2 against the appended (uncompacted) union
      val viaUnion = PipelineOps.incrementalCapstone(
        PipelineOps.BaseIndexes(spark.table("graft_baseidx_rawfp"),
          spark.table("graft_baseidx_bands")), delta2, bench)
        .as[(Long, String)].collect().toSet
      // nightly: compact into one bucketed file set, swap by name
      val cidx = PipelineOps.compactBaseIndexes(spark, s"$tmp/v1")
      val viaCompacted = PipelineOps.incrementalCapstone(cidx, delta2, bench)
        .as[(Long, String)].collect().toSet
      assert(viaCompacted == viaUnion,
        s"compaction changed the output: $viaCompacted vs $viaUnion")
      assert(viaCompacted.map(_._1) == Set(6003L),
        s"delta2 survivors wrong: ${viaCompacted.map(_._1)}")
      // the compacted tables carry the full row set, one file set per
      // bucket (the append had added a second file set)
      assert(spark.table("graft_baseidx_rawfp").count() ==
        pidx.rawFp.count() + d1idx.rawFp.count())
      // one file set: every bucket id (the _NNNNN filename component)
      // appears at most once — the append's second file set is gone
      val bucketIds = parquetFiles(s"$tmp/v1/rawfp")
        .flatMap("_(\\d{5})\\.".r.findFirstMatchIn(_)).map(_.group(1))
      assert(bucketIds.nonEmpty && bucketIds.distinct.size == bucketIds.size,
        s"compacted table still has multiple file sets per bucket: $bucketIds")
      // the compacted scan is still bucketed — the zero-exchange
      // probe property survives the swap
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val fpJoin = delta2
          .withColumn("_fp", graft.functions.TextFunctions.fingerprint(col("text")))
          .join(cidx.rawFp.select(col("fp").as("_fp")).hint("SHUFFLE_HASH"),
            Seq("_fp"), "left_anti")
        val plan = fpJoin.queryExecution.executedPlan
        assert(plan.collectLeaves().exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table.contains("rawfp")) && f.bucketedScan
          case _ => false
        }, "compacted fp index must still plan as a bucketed scan")
        assert(!plan.collect {
          case e: ShuffleExchangeExec => e.collectLeaves().exists {
            case f: FileSourceScanExec =>
              f.tableIdentifier.exists(_.table.contains("rawfp"))
            case _ => false
          }
        }.exists(identity),
          s"compacted fp index shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_rawfp")
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_bands")
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_rawfp_compacting")
      spark.sql("DROP TABLE IF EXISTS graft_baseidx_bands_compacting")
    }
  }

  test("q96: bins are contiguous, bench docs excluded, fill bounded by capacity+straddle") {
    val rows = q("q96_pretrain_capstone").orderBy(col("bin")).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq,
      "bins must be the contiguous 0..B-1 sequence")
    // the clean stage unions the RAW bench sliver only for window
    // extraction — no benchmark doc may reach the packed stream
    assert(rows.map(_.getLong(3)).min >= PipelineOps.BenchDocs,
      "a benchmark doc id leaked into the packed training stream")
    // concat-and-chunk: every bin except the last holds >= Capacity
    // tokens only via a straddling doc; a bin's sum can't exceed
    // capacity + the straddling doc's own tokens. Weak but real
    // bound: no bin is empty and every non-final bin's cumulative
    // fill reaches its boundary.
    assert(rows.forall(_.getLong(1) > 0), "empty bin in the packed stream")
    val cums = rows.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    cums.dropRight(1).zipWithIndex.foreach { case (c, i) =>
      assert(c >= (i + 1) * PipelineOps.Capacity,
        s"bin $i closed before its token boundary")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack
import graft.queries.PackOps

/** Sequence packing + mixture sampling semantics beyond the oracle. */
class PackSpec extends SparkTestBase {

  test("withBin == the sequential prefix-sum reference, incl. zero-token docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, if (i % 17 == 0) 0L else rnd.nextInt(900).toLong + 1))
    val df = rows.toDF("doc_id", "tok").repartition(8) // scattered input
    val got = SequencePack.withBin(df, col("tok"), Seq(col("doc_id")), capacity = 1000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.map { case (id, t) =>
      val bin = acc / 1000L; acc += t; id -> bin
    }.toMap
    assert(got == want, "bin assignment diverged from the sequential reference")
  }

  test("range-partitioned rankers evaluate their upstream exactly once (input pin)") {
    // repartitionByRange executes its child twice (boundary sample +
    // real shuffle); GlobalRank/withBin pin their input so expensive
    // upstream projections (q98's quality score, q67/q96/q104's BPE
    // token count) run once. The accumulator counts row evaluations
    // of the upstream stand-in; without the pin it reads ~2x rows.
    import spark.implicits._
    for (viaBin <- Seq(true, false)) {
      val acc = spark.sparkContext.longAccumulator("upstream-evals")
      val base = (1L to 400L).map(i => (i, i % 97)).toDF("doc_id", "tok")
        .as[(Long, Long)]
        .map { r => acc.add(1); r }
        .toDF("doc_id", "tok")
      val out =
        if (viaBin) SequencePack.withBin(base, col("tok"), Seq(col("doc_id")), 64L)
        else graft.operators.GlobalRank.withRowNumber(base, Seq(col("doc_id")), "pos")
      out.write.format("noop").mode("overwrite").save()
      assert(acc.value == 400L,
        s"upstream evaluated ${acc.value} row-times for 400 rows (viaBin=$viaBin)")
    }
  }

  test("packing never plans a SinglePartition exchange") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 50)).toDF("doc_id", "tok")
    val out = SequencePack.withBin(df, col("tok"), Seq(col("doc_id")), 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global cumsum fell back to a single partition:\n$plan")
  }

  test("packBinned == the local fit-bucket reference; no doc split; waste bounded") {
    import spark.implicits._
    val cap = 1000L
    val rnd = new scala.util.Random(11)
    // mix of oversize (tok > cap), near-full, and small docs
    val rows = (1L to 800L).map { i =>
      val t = i % 37 match {
        case 0 => cap + rnd.nextInt(500) + 1 // oversize
        case 1 => 0L                          // empty doc
        case _ => rnd.nextInt(900).toLong + 1
      }
      (i, t)
    }
    val df = rows.toDF("doc_id", "tok").repartition(8)
    val got = SequencePack.packBinned(df, col("tok"), col("doc_id"), cap)
      .select("doc_id", "tok", "bin", "fit")
      .as[(Long, Long, Long, Long)].collect()

    // local reference: bucket m = cap div max(tok,1); in-bucket order by
    // (md5("pack_"+id).take(8), id); bin = bucketOffset + rank div k
    def saltHex(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pack_$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.take(8)
    }
    val byBucket = rows.groupBy { case (_, t) => cap / math.max(t, 1L) }
    var acc = 0L
    val want = byBucket.toSeq.sortBy(_._1).flatMap { case (m, ds) =>
      val k = math.max(m, 1L)
      val ordered = ds.sortBy { case (id, _) => (saltHex(id), id) }
      val assigned = ordered.zipWithIndex.map { case ((id, t), r) =>
        (id, t, acc + r / k, k)
      }
      acc += (ds.size + k - 1) / k
      assigned
    }.toSet
    assert(got.toSet == want, "packBinned diverged from the local fit-bucket reference")

    // every doc exactly once
    assert(got.map(_._1).distinct.length == rows.length)
    val bins = got.groupBy(_._3).map { case (b, ds) =>
      (b, ds.map(_._2).sum, ds.length.toLong, ds.head._4)
    }
    // no bin of in-capacity docs exceeds capacity (no doc is split,
    // and fit-bucket sizing guarantees the k docs fit)
    for ((b, tokSum, _, _) <- bins if got.filter(_._3 == b).forall(_._2 <= cap))
      assert(tokSum <= cap, s"bin $b overflows: $tokSum > $cap")
    // oversize docs ride alone
    for ((b, _, n, _) <- bins if got.filter(_._3 == b).exists(_._2 > cap))
      assert(n == 1L, s"oversize doc shares bin $b")
    // waste bound: every FULL bin (n_docs == fit) is > half utilized
    for ((b, tokSum, n, fit) <- bins if n == fit && fit > 1)
      assert(tokSum * 2 > cap, s"full bin $b under half-utilized: $tokSum")
    // and unlike withBin's chunking, which splits every doc that
    // crosses a window boundary, packBinned splits none — quantify the
    // chunked form's cross-doc contamination on the same input
    val chunked = SequencePack.withBin(
      rows.toDF("doc_id", "tok"), col("tok"), Seq(col("doc_id")), cap)
      .select("doc_id", "tok", "bin").as[(Long, Long, Long)].collect()
    var off = 0L
    var splitDocs = 0
    rows.foreach { case (_, t) =>
      if (off / cap != (off + math.max(t, 1) - 1) / cap) splitDocs += 1
      off += t
    }
    assert(splitDocs > 0, "test corpus should make chunking split docs")
    assert(chunked.length == rows.length)
  }

  test("packBinned plans no SinglePartition exchange and is deterministic") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, i % 97)).toDF("doc_id", "tok")
    val out = SequencePack.packBinned(df, col("tok"), col("doc_id"), 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packBinned fell back to a single partition:\n$plan")
    val a = out.select("doc_id", "bin").collect().map(_.toString).sorted.toSeq
    val b = SequencePack.packBinned(df, col("tok"), col("doc_id"), 64L)
      .select("doc_id", "bin").collect().map(_.toString).sorted.toSeq
    assert(a == b, "packBinned must be run-to-run deterministic")
  }

  test("mixture copies respect the per-language weights and are deterministic") {
    val q = PackOps.all.find(_.name == "q68_mixture_sample").get
    val out = q.run(spark, sfDir).cache()
    val per = out.groupBy("doc_id", "lang_pred").agg(max(col("copy")).as("n"))
    assert(per.filter(col("lang_pred") === "en" && (col("n") < 1 || col("n") > 2)).isEmpty,
      "en docs must get 1 or 2 copies (w=1.5)")
    assert(per.filter(col("lang_pred") === "other" && col("n") =!= 1).isEmpty,
      "surviving other docs carry exactly 1 copy (w=0.25)")
    // the fractional gates actually bite: some en doc has 2 copies and
    // the other-language survivor rate is well under 100%
    assert(per.filter(col("lang_pred") === "en" && col("n") === 2).count() > 0)
    val a = out.collect().map(_.toString).sorted.toSeq
    val b = q.run(spark, sfDir).collect().map(_.toString).sorted.toSeq
    assert(a == b, "mixture sample must be run-to-run deterministic")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityOps

/** ANN quality pinned against the exact brute-force baseline. The
  * synthetic embeddings are near-orthogonal random vectors (hardest
  * case for LSH); on real near-duplicate vectors (cos >= 0.9) the
  * sign-bucket collision probability per table is far higher.
  */
class SimilarityOpsSpec extends SparkTestBase {

  private def q(name: String) =
    SimilarityOps.all.find(_.name == name).get.run(spark, sfDir)

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id")

  test("brute-force knn: 5 ranked neighbors per query, sims descending, no self") {
    val b = q("q39_knn_brute")
    assert(b.count() == 50)
    assert(b.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val badOrder = b.groupBy("query_id")
      .agg(max(when(col("rank") === 1, col("sim"))).as("s1"),
        max(when(col("rank") === 5, col("sim"))).as("s5"))
      .filter(col("s1") < col("s5"))
    assert(badOrder.isEmpty)
  }

  test("multi-table LSH ANN recalls a useful fraction of true neighbors") {
    val b = pairs(q("q39_knn_brute"))
    val l = pairs(q("q40_ann_lsh"))
    assert(b.intersect(l).count() >= 15, "LSH recall collapsed (< 30%)")
  }

  test("IVF 2-probe recalls most true neighbors") {
    val b = pairs(q("q39_knn_brute"))
    val i = pairs(q("q41_ivf_centroids"))
    assert(b.intersect(i).count() >= 30, "IVF recall collapsed (< 60%)")
  }

  test("ANN outputs are well-formed top-k lists") {
    for (name <- Seq("q40_ann_lsh", "q41_ivf_centroids")) {
      val df = q(name)
      assert(df.filter(col("rank") < 1 || col("rank") > 5).isEmpty, name)
      assert(df.groupBy("query_id", "neighbor_id").count().filter(col("count") > 1).isEmpty,
        s"$name duplicated a neighbor")
    }
  }

  test("native lsh_bucket_keys index == the join/aggregate reference on the full corpus") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val fast = Similarity.lshEntries(emb)
    val ref = Similarity.lshEntriesJoin(emb)
    assert(fast.count() == ref.count())
    assert(fast.except(ref).isEmpty && ref.except(fast).isEmpty,
      "native LSH index diverges from the matrix-product reference")
  }

  test("ivf stays deterministic with zero-norm vectors and a zero-norm centroid") {
    // Regression pin for the NaN-safe assignment (Similarity.ivf's
    // negsim is pinned to 0.0 when either norm is zero): a 0/0 NaN
    // would sort differently between array_sort (NaN last) and the old
    // row_number shape (NaN first), making home cells run-dependent.
    import spark.implicits._
    import graft.operators.Similarity
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      // all-positive components → positive cosine with centroid 1, so
      // every normal vector's home is PROVABLY cell 1, not the zero cell
      Seq.fill(graft.functions.VectorFunctions.Dim)(r.nextFloat() * 0.5f + 0.1f)
    }
    val zero = Seq.fill(graft.functions.VectorFunctions.Dim)(0.0f)
    val corpus = ((1L to 8L).map(i => (i, vec(i.toInt))) :+ (100L, zero) :+ (101L, zero))
      .toDF("vec_id", "embedding")
    def run(): Seq[(Long, Long, Long, Double)] =
      Similarity.ivf(corpus, col("vec_id").isin(1L, 101L), col("vec_id") === 2L,
          k = 8, probes = 2)
        .select("query_id", "neighbor_id", "rank", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val first = run()
    assert(first == run(), "ivf with zero-norm inputs must be run-to-run deterministic")
    // the rerank's zero-norm guard: defined 0.0 sims, no NaN, no
    // ANSI DIVIDE_BY_ZERO crash (which is what an unguarded
    // cosineWithNorms raises here)
    assert(first.forall(r => !r._4.isNaN), s"NaN sims in: $first")
    // the zero-norm corpus vector gets the pinned 0.0 against every
    // centroid → deterministic min-cent_id home (cell 1, which the
    // query probes): it must surface as a candidate with sim 0.0 and,
    // with only positive-cosine real candidates, rank LAST, not first
    val zeroRow = first.find(_._2 == 100L)
    assert(zeroRow.isDefined, "zero-norm vector lost its deterministic home cell")
    assert(zeroRow.get._4 == 0.0 && zeroRow.get._3 == first.map(_._3).max,
      s"zero-norm candidate should rank last at sim 0.0: $zeroRow")
  }

  test("learned-codebook IVF: full probe equals brute force exactly") {
    // Probing EVERY cell makes the candidate set the whole corpus
    // (each member lives in exactly one home cell), so the exact
    // rerank must reproduce the brute-force top-k bit-for-bit — the
    // crisp correctness property of the IVF partition, independent of
    // codebook quality.
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val cells = 8
    val full = Similarity.ivfLearned(emb, col("vec_id") < 10, k = 5,
      cells = cells, probes = cells, seed = 7L)
      .select("query_id", "neighbor_id", "rank")
    val brute = Similarity.knnBrute(emb, col("vec_id") < 10, k = 5)
      .select("query_id", "neighbor_id", "rank")
    assert(full.exceptAll(brute).isEmpty && brute.exceptAll(full).isEmpty,
      "full-probe learned IVF diverged from brute force")
  }

  test("two-level IVF: full coarse probe equals the single-level join bit-for-bit") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val n = Similarity.withNorm(emb)
    // deterministic fine codebook: the first 40 corpus vectors
    val cents = emb.orderBy("vec_id").limit(40)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cembedding"))
      .as[(Long, Seq[Float])].collect().toSeq.toDF("cent_id", "cembedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val single = rows(Similarity.ivfSearchJoin(n, cents,
      col("vec_id") < 10, k = 5, probes = 3))
    val two = rows(Similarity.ivfTwoLevelSearch(n, cents,
      col("vec_id") < 10, k = 5, probes = 3,
      coarseCells = 4, coarseProbes = 4))
    assert(two == single,
      s"full-coarse two-level diverged: only-two=${(two -- single).take(3)}, " +
        s"only-single=${(single -- two).take(3)}")
  }

  test("two-level IVF: partial coarse probe keeps recall on clustered data") {
    import spark.implicits._
    import graft.operators.Similarity
    val Dim = graft.functions.VectorFunctions.Dim
    val rnd = new scala.util.Random(41)
    // 16 tight clusters x 30 members: true neighbors are in-cluster,
    // so a codebook that separates clusters keeps them co-celled
    val centers = Seq.fill(16)(Array.fill(Dim)(rnd.nextGaussian().toFloat))
    val docs = (for (c <- centers.indices; j <- 0 until 30) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 100 + j).toLong, v.toSeq)
    }).toDF("vec_id", "embedding")
    val queries = col("vec_id") % 100 === 0 // one query per cluster
    val brute = Similarity.knnBrute(docs, queries, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val two = Similarity.ivfTwoLevel(docs, queries, k = 5,
      cells = 32, coarseCells = 8, probes = 2, coarseProbes = 3, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(two.keySet == brute.keySet, "a query lost all its candidates")
    val recall = brute.map { case (q, want) =>
      two(q).intersect(want).size.toDouble / want.size }.sum / brute.size
    assert(recall >= 0.8,
      f"two-level recall $recall%.2f below 0.8 on planted clusters")
    // orphan-proofing: with the probe codebook restricted to OCCUPIED
    // coarse cells, even the tightest probe leaves no query (or
    // corpus vector) without a home — every query still answers
    val tight = Similarity.ivfTwoLevel(docs, queries, k = 5,
      cells = 32, coarseCells = 8, probes = 2, coarseProbes = 1, seed = 7L)
      .select("query_id").distinct().collect().map(_.getLong(0)).toSet
    assert(tight == brute.keySet,
      s"a query vanished under coarseProbes=1: missing ${brute.keySet -- tight}")
  }

  test("knnGraph: family collapse, high-sim neighbors found, sims agree with direct cosine") {
    import spark.implicits._
    import graft.operators.Similarity
    // base: the real (near-orthogonal) corpus reps + planted structure:
    // 900/901 exact dups of vec 0 (family collapse), 902 a high-sim
    // (cos ~ 0.995) neighbor of vec 1 (must be recalled — sign-plane
    // collision probability ~ (1 - theta/pi)^8 per table ~ 0.77 with
    // 8 tables -> miss chance < 1e-5)
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val v0 = base.find(_._1 == 0L).get._2
    val v1 = base.find(_._1 == 1L).get._2
    val nearV1 = v1.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.1f else x }
    val d = (base.toSeq ++ Seq((900L, v0), (901L, v0), (902L, nearV1)))
      .toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(d, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val qids = g.map(_._1).toSet
    // 900/901 collapse into vec 0's family: never queries, never neighbors
    assert(!qids.contains(900L) && !qids.contains(901L))
    assert(g.forall(t => t._2 != 900L && t._2 != 901L))
    assert(qids.contains(0L), "family rep 0 is a graph node")
    // the planted high-sim pair is found in BOTH directions
    assert(g.exists(t => t._1 == 1L && t._2 == 902L), s"1->902 missing")
    assert(g.exists(t => t._1 == 902L && t._2 == 1L), s"902->1 missing")
    // every reported sim equals the exact quantized cosine: brute over
    // the rep-only corpus with every rep as query must assign the same
    // sim to every graph edge
    val repIds = qids ++ g.map(_._2).toSet
    val reps = d.filter(col("vec_id").isin(repIds.toSeq: _*))
    val brute = Similarity.knnBrute(reps, lit(true), Int.MaxValue - 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    g.foreach { case (a, b, s) =>
      assert(math.abs(brute((a, b)) - s) < 1e-12, s"sim drift on ($a,$b)")
    }
  }

  test("nearDupPairs: subset of brute >=threshold, planted dup caught, no duplicates") {
    import spark.implicits._
    import graft.operators.Similarity
    val Dim = graft.functions.VectorFunctions.Dim
    val rnd = new scala.util.Random(23)
    def v(): Seq[Float] = Seq.fill(Dim)(rnd.nextGaussian().toFloat)
    val base = v()
    // planted near-dup pair (tiny perturbation -> cos ~ 0.999)
    val dup = base.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
    val corpus = ((1L to 60L).map(i => (i, v())) :+ (100L, base) :+ (101L, dup))
      .toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(corpus, minSim = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(got.contains(100L -> 101L), s"planted near-dup missed: $got")
    assert(got.size == got.distinct.size, "a pair was emitted from more than one table")
    // every emitted pair really is >= threshold (exact brute check)
    val n = Similarity.withNorm(corpus)
    val brute = n.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
      .join(n.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb")),
        col("a") < col("b"))
      .withColumn("sim", graft.functions.VectorFunctions.cosineWithNorms(
        col("ea"), col("na"), col("eb"), col("nb")))
      .filter(col("sim") >= 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.toSet.subsetOf(brute), "emitted a pair below the similarity bar")
  }

  test("nearDupPairs at minSim = 1.0 keeps exact-duplicate families (self-sim is literal 1.0)") {
    import spark.implicits._
    import graft.operators.Similarity
    val Dim = graft.functions.VectorFunctions.Dim
    val rnd = new scala.util.Random(29)
    val v1 = Seq.fill(Dim)(rnd.nextGaussian().toFloat)
    val v2 = Seq.fill(Dim)(rnd.nextGaussian().toFloat)
    // ids 1/2 are bit-identical; 3 is unrelated
    val corpus = Seq((1L, v1), (2L, v1), (3L, v2)).toDF("vec_id", "embedding")
    val got = Similarity.nearDupPairs(corpus, minSim = 1.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // sqrt-then-square self-cosine is 1 ± ulp — a computed sim here
    // would drop the exact-dup pair at the == 1.0 threshold
    assert(got == Set(1L -> 2L), s"exact family lost at minSim=1.0: $got")
  }

  test("semantic dedup (q84 composition): the token-richest cluster member survives") {
    import spark.implicits._
    import graft.operators.{ConnectedComponents, Similarity}
    // real near-orthogonal reps + a planted exact-dup family {0, 900,
    // 901}; scores make 900 the content-richest member, so the
    // survivor rule must pick it over the min id (q70's rule would
    // keep 0) and over the other copy
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val v0 = base.find(_._1 == 0L).get._2
    val d = (base.toSeq ++ Seq((900L, v0), (901L, v0)))
      .toDF("vec_id", "embedding")
    val scored = d.select(col("vec_id"),
      (when(col("vec_id") === 900L, 9L)
        .when(col("vec_id") === 901L, 7L)
        .otherwise(5L)).as("n_tokens"))
    val pairs = Similarity.nearDupPairs(d, minSim = 0.9)
    val kept = ConnectedComponents
      .survivorsBy(scored, pairs, col("n_tokens"), idCol = "vec_id")
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(900L), "content-richest member dropped")
    assert(!kept.contains(0L) && !kept.contains(901L),
      s"cluster losers survived: $kept")
    // docs in no semantic pair pass through untouched
    val clustered = pairs.select(explode(array(col("a"), col("b"))).as("id"))
      .as[Long].collect().toSet
    val unpaired = (base.map(_._1).toSet -- clustered)
    assert(unpaired.subsetOf(kept), "an unpaired doc was dropped")
  }

  test("contrastive triples: positive/negative are the rank-first neighbors in their bands") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val t = Similarity.contrastiveTriples(emb, posMin = 0.30, negMax = 0.15)
      .collect()
    assert(t.nonEmpty, "no triples on the real table")
    val g = Similarity.knnGraph(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = g.groupBy(_._1)
    t.foreach { r =>
      val (a, pid, psim, nid, nsim) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(psim >= 0.30 && nsim <= 0.15, s"bands violated for $a")
      val edges = byQ(a).sortBy(_._3)
      // positive/negative are the FIRST qualifying neighbors by rank
      assert(edges.find(_._4 >= 0.30).get._2 == pid, s"positive not rank-first for $a")
      assert(edges.find(_._4 <= 0.15).get._2 == nid, s"negative not rank-first for $a")
      assert(pid != nid)
    }
    // anchors missing either band are absent
    val anchors = t.map(_.getLong(0)).toSet
    val shouldHave = byQ.filter { case (_, es) =>
      es.exists(_._4 >= 0.30) && es.exists(_._4 <= 0.15) }.keySet
    assert(anchors == shouldHave, "anchor set mismatch")
  }

  test("centered LSH splits a mean-offset corpus that through-origin planes cannot") {
    import spark.implicits._
    import graft.operators.Similarity
    val Dim = graft.functions.VectorFunctions.Dim
    val rnd = new scala.util.Random(11)
    // every component ~ N(+5, 0.3): all projections of all vectors
    // share the mean's sign pattern, so through-origin sign planes put
    // the WHOLE corpus in one bucket per table — zero key entropy
    val corpus = (1L to 200L).map(i =>
      (i, Seq.fill(Dim)(5.0f + rnd.nextGaussian().toFloat * 0.3f)))
      .toDF("vec_id", "embedding")
    def maxPop(e: org.apache.spark.sql.DataFrame): Long =
      e.groupBy(col("tbl"), col("bkey")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
    val origin = maxPop(Similarity.lshEntries(corpus, tables = 4, planes = 6))
    val centered = maxPop(Similarity.lshEntriesCentered(corpus, tables = 4, planes = 6))
    // near-total collapse (a plane whose coefficients nearly cancel
    // can still split off a few vectors via the noise term)
    assert(origin >= 190L, s"biased corpus should collapse origin-plane buckets: $origin")
    assert(centered < 100L,
      s"centered planes must restore bucket entropy (max pop $centered)")
    // centering only changes WHICH candidates surface; the exact
    // rerank keeps ANN results well-formed and deterministic
    val a = Similarity.annLsh(corpus, col("vec_id") <= 5, k = 3,
      tables = 4, planes = 6, centered = true).collect().map(_.toString).sorted.toSeq
    val b = Similarity.annLsh(corpus, col("vec_id") <= 5, k = 3,
      tables = 4, planes = 6, centered = true).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("empty thresholds == explicit zero thresholds (native expression)") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val pm = (0 until 8).map(j => (0 until graft.functions.VectorFunctions.Dim)
      .map(i => 2L * ((j.toLong * 73856093L + i.toLong * 19349663L) % 1000003L) - 1000003L))
    val d = emb.select(col("vec_id"),
      graft.plans.LshBucketKeys(col("embedding"), pm, 4).as("a"),
      graft.plans.LshBucketKeys(col("embedding"), pm, 4, Seq.fill(8)(0L)).as("b"))
    assert(d.filter(not(col("a") === col("b"))).isEmpty)
  }

  test("large-codebook join assignment == the inlined-literal core") {
    // The cells >= LargeCodebookCells fallback (ivfSearchJoin) must be
    // value-equal to ivfSearch on the SAME centroid set — including
    // zero-norm sentinels on both the vector and the centroid side.
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val n = Similarity.withNorm(emb)
    val cents: Array[(Long, Seq[Float])] =
      emb.filter(col("vec_id") < 6).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1) :+
        (999L, Seq.fill(graft.functions.VectorFunctions.Dim)(0.0f))
    val centsDf = cents.toSeq.toDF("cent_id", "cembedding")
    val lit = Similarity.ivfSearch(n, cents, col("vec_id") < 10, k = 5, probes = 3)
    val join = Similarity.ivfSearchJoin(n, centsDf, col("vec_id") < 10, k = 5, probes = 3)
    assert(lit.exceptAll(join).isEmpty && join.exceptAll(lit).isEmpty,
      "join-assignment IVF diverged from the literal core")
  }

  test("learned-codebook IVF: partial probe keeps useful recall and is seed-deterministic") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    def run() = Similarity.ivfLearned(emb, col("vec_id") < 10, k = 5,
      cells = 8, probes = 3, seed = 7L)
    val got = pairs(run())
    val brute = pairs(Similarity.knnBrute(emb, col("vec_id") < 10, k = 5))
    // near-orthogonal random vectors are the ANN worst case; 3 of 8
    // probed cells must still catch a nontrivial fraction of the 50
    // true pairs (threshold deliberately loose against codebook drift)
    assert(got.intersect(brute).count() >= 15,
      "learned-IVF 3-probe recall collapsed (< 30%)")
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a == b, "same-seed learned IVF must be deterministic in-session")
  }

}

package graft

import org.apache.spark.sql.functions._

/** Dev soak probe (test scope): the round-11 corpus operators under
  * C× replication of the sf1 documents table (ids shifted, text and
  * source kept) — the decade check that their scale shapes hold:
  *
  *   - q87 tf·idf: df and N both scale by C, so N DIV df — and with
  *     it every idf, score, and per-doc top-k — is INVARIANT: each
  *     replica must get exactly its base doc's keyword list, and the
  *     cost must stay ~linear (the counting path is one int64
  *     exchange; nothing quadratic to trip).
  *   - q89 source overlap: distinct (source, h) collapses replicas
  *     BEFORE the self-join, so the matrix must be IDENTICAL to the
  *     single-copy matrix and the join cost must not grow with C.
  *   - q85 LM features: model fit and scoring are one bounded
  *     aggregation + broadcast joins — cost ~linear, model row count
  *     invariant (same buckets occupied).
  *
  * Usage: sbt "Test/runMain graft.SoakCorpusOps [srcSfDir] [copies]"
  * Results recorded in BENCH_SF10.md.
  */
object SoakCorpusOps {
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

    val base = Tables.documents(spark, src)
      .select("doc_id", "text", "source")
    val stride = base.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("doc_id") + lit(k * stride)).as("doc_id"),
        col("text"), col("source")))
      .reduce(_.unionAll(_))
      .repartition(32).cache()
    println(s"SOAK docs ${corpus.count()} (=$copies x $stride)")

    // --- q87 tf-idf ---
    val kw1 = timed("tfidf on 1 copy")(
      graft.operators.Keywords.tfidfTopK(base, 3).collect())
    val kwC = timed(s"tfidf on $copies copies")(
      graft.operators.Keywords.tfidfTopK(corpus, 3).collect())
    println(s"SOAK tfidf rows ${kw1.length} -> ${kwC.length}")
    val baseSet = kw1.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val repProjected = kwC.map(r =>
      (r.getLong(0) % stride, r.getLong(1), r.getString(2))).toSet
    println(s"SOAK tfidf per-copy invariance: " +
      (if (repProjected == baseSet && kwC.length == copies * kw1.length) "EXACT"
       else s"DIVERGED (${repProjected.diff(baseSet).take(3)})"))

    // --- q89 source overlap ---
    val ov1 = timed("overlap on 1 copy")(overlap(base).collect())
    val ovC = timed(s"overlap on $copies copies")(overlap(corpus).collect())
    val m1 = ov1.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val mC = ovC.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    println(s"SOAK overlap matrix invariance: ${if (m1 == mC) "EXACT" else "DIVERGED"}")

    // --- q93 CDC chunks ---
    val cd1 = timed("cdc on 1 copy")(
      graft.operators.Dedup.cdcChunkStats(base.select("doc_id", "text")).collect())
    val cdC = timed(s"cdc on $copies copies")(
      graft.operators.Dedup.cdcChunkStats(corpus.select("doc_id", "text")).collect())
    // under exact replication every replica's chunk multiset equals
    // its base doc's, and every chunk is corpus-duplicated: n_chunks
    // projects exactly, dup_chunks == n_chunks on every row
    val cn1 = cd1.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val projOk = cdC.forall(r => cn1(r.getLong(0) % stride) == r.getLong(1))
    val allDup = cdC.forall(r => r.getLong(2) == r.getLong(1))
    println(s"SOAK cdc rows ${cd1.length} -> ${cdC.length}; " +
      s"n_chunks per-copy ${if (projOk) "EXACT" else "DIVERGED"}; " +
      s"all-dup under replication: ${if (allDup) "EXACT" else "DIVERGED"}")

    // --- q86 BPE production trainer + encoder ---
    // trainLocal: ONE distributed vocab aggregation then the local
    // incremental merge loop — the 5k-merge table that train()'s
    // per-merge jobs would take hours over lands in seconds-to-
    // minutes. Replication invariance: counts scale by C uniformly,
    // so the merge table must be IDENTICAL to the single-copy one.
    val mergesBase = timed("bpe trainLocal 5000 merges on 1 copy")(
      graft.operators.BpeTrain.trainLocal(base, 5000))
    val mergesC = timed(s"bpe trainLocal 5000 merges on $copies copies")(
      graft.operators.BpeTrain.trainLocal(corpus, 5000))
    println(s"SOAK bpe merges ${mergesBase.size}; replication " +
      (if (mergesBase == mergesC) "EXACT" else "DIVERGED"))
    // distributed-loop equality at soak scale for a 30-merge prefix
    val dist30 = timed("bpe distributed train 30 rounds")(
      graft.operators.BpeTrain.train(corpus, 30))
    println(s"SOAK bpe trainLocal prefix == train(30): " +
      (if (mergesC.take(30) == dist30) "EXACT" else "DIVERGED"))
    // the production encode path: full 5k-merge table, one pass
    val tokC = timed(s"bpe encodeBulk 5k merges on $copies copies")(
      graft.operators.BpeTrain.encodeBulk(corpus, "doc_id", "text", mergesC)
        .agg(sum(size(col("tokens")))).collect()(0).getLong(0))
    // the iterative path at a bounded 64-merge prefix (its regime)
    val tokIter = timed(s"bpe encodeIter 64-merge prefix on $copies copies")(
      graft.operators.BpeTrain.encodeIter(corpus, "text", mergesC.take(64))
        .agg(sum(size(col("tokens")))).collect()(0).getLong(0))
    println(s"SOAK bpe tokens bulk=$tokC iter64=$tokIter")

    // --- q85 LM features ---
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred = (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    val f1 = timed("lm features on 1 copy")(
      graft.operators.LangModel.pplFeatures(base, enPred).count())
    val fC = timed(s"lm features on $copies copies")(
      graft.operators.LangModel.pplFeatures(corpus, enPred).count())
    println(s"SOAK lm rows $f1 -> $fC")

    spark.stop()
  }

  private def overlap(docs: org.apache.spark.sql.DataFrame) = {
    val g = docs.select(col("source"), explode(
      graft.plans.ShingleHashes(trim(col("text")), 5,
        graft.operators.Dedup.P)).as("h"))
      .distinct()
      .repartition(col("h"))
    g.as("a").hint("shuffle_hash")
      .join(g.as("b"), col("a.h") === col("b.h") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev soak probe (test scope): LSH-ANN bucket cardinalities at a
  * large SF — the evidence that q40's candidate sets stay bounded as
  * the corpus scales (companion to SoakDedup; results in
  * BENCH_SF10.md). */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    println(s"SOAK vectors $n")

    val entries = Similarity.lshEntries(emb)
    val nEntries = timed("ann.index")(entries.count())
    val pops = entries.groupBy(col("tbl"), col("bkey")).agg(count(lit(1)).as("c"))
    val st = pops.agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      expr("percentile_approx(c, 0.99)").as("p99")).collect()(0)
    println(s"SOAK ann entries $nEntries buckets ${st.getLong(0)} " +
      s"max_pop ${st.getLong(1)} p99_pop ${st.getLong(2)}")

    // candidate volume for the 10-query set: rows joined from the
    // query buckets (the annLsh candidate-join output before distinct)
    val qEnt = entries.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bkey"))
    val cand = broadcast(qEnt).join(entries, Seq("tbl", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
    val nCand = timed("ann.candidates")(cand.count())
    val nDistinct = cand.select(col("query_id"), col("vec_id")).distinct().count()
    println(s"SOAK ann cand_rows $nCand distinct_cands $nDistinct " +
      s"per_query ${nDistinct / 10} frac_of_corpus ${nDistinct.toDouble / (10 * n)}")

    timed("q40.end_to_end")(
      Similarity.annLsh(emb, col("vec_id") < 10, k = 5)
        .write.format("noop").mode("overwrite").save())

    // scaled dial: r ≈ log2(N / 1000) planes per table, more tables
    // to recover recall — the configuration the operator scaladoc
    // prescribes for a corpus this size
    val r = math.max(Similarity.PlanesPerTable,
      math.ceil(math.log(n / 1000.0) / math.log(2)).toInt)
    val tables2 = 16
    val e2 = Similarity.lshEntries(emb, tables2, r)
    val pops2 = e2.groupBy(col("tbl"), col("bkey")).agg(count(lit(1)).as("c"))
    val st2 = pops2.agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      expr("percentile_approx(c, 0.99)").as("p99")).collect()(0)
    println(s"SOAK ann2 tables $tables2 planes $r buckets ${st2.getLong(0)} " +
      s"max_pop ${st2.getLong(1)} p99_pop ${st2.getLong(2)}")
    val qe2 = e2.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bkey"))
    val cand2 = broadcast(qe2).join(e2, Seq("tbl", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val nC2 = timed("ann2.candidates")(cand2.count())
    println(s"SOAK ann2 distinct_cands $nC2 per_query ${nC2 / 10} " +
      s"frac_of_corpus ${nC2.toDouble / (10 * n)}")
    // recall vs exact top-5 at this scale
    val brute = Similarity.knnBrute(emb, col("vec_id") < 10, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val ann2 = Similarity.annLsh(emb, col("vec_id") < 10, k = 5, tables2, r)
      .select(col("query_id"), col("neighbor_id"))
    val hit = timed("ann2.recall")(brute.intersect(ann2).count())
    println(s"SOAK ann2 recall ${hit}/50")

    // centered planes at the same dial: bucket entropy + candidates
    val e3 = Similarity.lshEntriesCentered(emb, tables2, r)
    val pops3 = e3.groupBy(col("tbl"), col("bkey")).agg(count(lit(1)).as("c"))
    val st3 = pops3.agg(
      count(lit(1)).as("buckets"), max(col("c")).as("max_pop"),
      expr("percentile_approx(c, 0.99)").as("p99")).collect()(0)
    println(s"SOAK ann3 centered buckets ${st3.getLong(0)} " +
      s"max_pop ${st3.getLong(1)} p99_pop ${st3.getLong(2)}")
    val qe3 = e3.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bkey"))
    val cand3 = broadcast(qe3).join(e3, Seq("tbl", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val nC3 = timed("ann3.candidates")(cand3.count())
    println(s"SOAK ann3 distinct_cands $nC3 per_query ${nC3 / 10} " +
      s"frac_of_corpus ${nC3.toDouble / (10 * n)}")
    val ann3 = Similarity.annLsh(emb, col("vec_id") < 10, k = 5, tables2, r,
      centered = true).select(col("query_id"), col("neighbor_id"))
    val hit3 = timed("ann3.recall")(brute.intersect(ann3).count())
    println(s"SOAK ann3 recall ${hit3}/50")
    spark.stop()
  }
}

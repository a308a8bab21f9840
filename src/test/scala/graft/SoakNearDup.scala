package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Dev soak probe (test scope): q72's dedup-before-indexing pair
  * listing at sf10-scale replication — 100 exact copies of the 2k
  * base vectors (the BENCH_SF10 replicated-corpus setting where the
  * old whole-corpus index was shown unsplittable by any hash
  * layout). Records every stage cardinality of the family → rep →
  * pair → expansion pipeline plus wall time; results in
  * BENCH_SF10.md. Usage:
  *   sbt "Test/runMain graft.SoakNearDup [srcSfDir] [copies]"
  */
object SoakNearDup {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SOAK time $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = Tables.embeddings(spark, src)
    val stride = base.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1
    val corpus = (0 until copies).map(k =>
      base.select((col("vec_id") + lit(k * stride)).as("vec_id"), col("embedding")))
      .reduce(_.unionAll(_))
      .repartition(32).cache()
    val n = corpus.count()
    println(s"SOAK vectors $n (=$copies x $stride)")

    // stage cardinalities of the dedup-first pipeline
    val fam = corpus
      .withColumn("qv", VectorFunctions.quantizeQ(col("embedding")))
      .withColumn("rep", min(col("vec_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qv"))))
    val nReps = timed("families")(
      fam.filter(col("vec_id") === col("rep")).count())
    println(s"SOAK reps $nReps (collapse ${n / nReps}x)")

    val pairs = Similarity.nearDupPairs(corpus, minSim = 0.45).cache()
    val nPairs = timed("nearDupPairs")(pairs.count())
    val bySim = pairs.agg(
      sum(when(col("sim") >= 0.999999, 1L).otherwise(0L)).as("exact"),
      min(col("sim")).as("min_sim")).collect()(0)
    println(s"SOAK pairs $nPairs exact_family ${bySim.getLong(0)} " +
      f"min_sim ${bySim.getDouble(1)}%.3f")

    // the counterfactual: candidate volume if the index ran on RAW
    // rows (what the pre-rebuild q72 did) vs on reps
    val repVecs = fam.filter(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("embedding"))
    def candVolume(df: org.apache.spark.sql.DataFrame): Long = {
      val e = Similarity.lshEntries(df, Similarity.NumTables, Similarity.DupPlanes)
      e.groupBy(col("tbl"), col("bkey")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).as("s")).collect()(0).getLong(0) / 2
    }
    val candRep = timed("cand.reps")(candVolume(repVecs))
    val candRaw = timed("cand.raw")(candVolume(corpus))
    println(s"SOAK candidates reps $candRep raw $candRaw " +
      s"(${candRaw / math.max(candRep, 1L)}x avoided)")

    spark.stop()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 19): does the pinned MinHash signature table's
  * low post-AQE partition count (3 at sf0.1) serialize the band join's
  * probe/emission the way q37's 1-partition pin did? A/B: pin as-is vs
  * repartition(cores, doc_id) before the pin, interleaved in one JVM.
  * Usage: Test/runMain graft.ProfileQ36AB [sfDir] [rounds]
  */
object ProfileQ36AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.Dedup

    def docs = Tables.documents(spark, dir)
    def sigCur: DataFrame = Dedup.withSignatureFromHashes(
      Dedup.shingleHashRowsCorpusGuard(docs))
    def mk(rep: Boolean): DataFrame = {
      val s = if (rep) sigCur.repartition(32, col("doc_id")) else sigCur
      Dedup.minhashPairsOwned(s.localCheckpoint(true))
        .repartition(col("a")).orderBy(col("a"), col("b"))
    }
    for (r <- Seq(false, true)) {
      mk(r).write.format("noop").mode("overwrite").save()
      Verify.releaseQueryState(spark)
    }
    val acc = scala.collection.mutable.Map.empty[Boolean, List[Double]]
    for (i <- 1 to rounds; r <- Seq(false, true)) {
      val t0 = System.nanoTime()
      mk(r).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Verify.releaseQueryState(spark)
      acc(r) = s :: acc.getOrElse(r, Nil)
    }
    for ((r, ts) <- acc.toSeq.sortBy(_._1))
      println(f"rep=$r min=${ts.min}%.3f all=${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}

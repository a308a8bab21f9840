package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the MinHash pipeline, string
  * vs native shingle base. */
object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val cap = Some((nDocs / 10).max(1L))
    for (_ <- 1 to 3) {
      time("stringRows")(Dedup.shingleRows(docs, dedup = false).count())
      time("hashRows")(Dedup.shingleHashRows(docs).count())
      time("hashRows_capped")(Dedup.shingleHashRows(docs, maxDocFreq = cap).count())
      time("sig_strings")(Dedup.withSignature(
        Dedup.shingleRows(docs, dedup = false)).count())
      time("sig_native")(Dedup.withSignatureFromHashes(
        Dedup.shingleHashRows(docs)).count())
      time("sig_native_capped")(Dedup.withSignatureFromHashes(
        Dedup.shingleHashRows(docs, maxDocFreq = cap)).count())
      time("full_q36")(SparkEntry.queries("q36_dedup_minhash")(spark, dir).count())
    }
    spark.stop()
  }
}

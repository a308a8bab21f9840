package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the MinHash pipeline. */
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
    for (_ <- 1 to 2) {
      time("shingleRows")(Dedup.shingleRows(docs).count())
      time("signature")(Dedup.withSignature(Dedup.shingleRows(docs)).count())
      time("buckets")(Dedup.lshBuckets(Dedup.withSignature(Dedup.shingleRows(docs))).count())
      time("full_q36")(SparkEntry.queries("q36_dedup_minhash")(spark, dir).count())
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.EventFunctions._
import graft.operators.{FinetunePrep, NearestEvent, TrainTestSplit}

/** Dev probe: stage-by-stage timing of the finetune-pair pipeline. */
object ProfileQ50 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def assoc = NearestEvent.assoc(norm(Tables.events(spark, dir)),
        "instance_id", "ts_us", "event_id", sourcePred = isMsg, targetPred = isCmd)
      .filter(col("value") >= 5)
    val utt = concat(lit("u"), col("user_id").cast("string"),
      lit("#"), col("event_id").cast("string"))
    for (_ <- 1 to 2) {
      time("assoc")(assoc.count())
      time("pairs")(FinetunePrep.pairs(assoc, utt, col("ts_us"), col("event_id"),
        coKeys = Seq(col("instance_id"))).count())
      time("full_q50")(SparkEntry.queries("q50_finetune_pairs")(spark, dir).count())
    }
    spark.stop()
  }
}

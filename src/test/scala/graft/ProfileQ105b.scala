package graft

import org.apache.spark.sql.functions._

/** Dev probe: q105 seed-stage variants. */
object ProfileQ105b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.BpeTrain
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    def vocab = BpeTrain.vocab(docs)
    def pieces = vocab.select(
      explode(graft.plans.SubstrPieces(col("w"), 6)).as("piece"), col("cnt"))
    for (_ <- 1 to 2) {
      println("VOCAB_TYPES=" + time("vocab_count")(vocab.count()))
      println("PIECE_ROWS=" + time("explode_only")(pieces.count()))
      time("agg_by_hash")(pieces.groupBy(xxhash64(col("piece")).as("h"))
        .agg(sum(col("cnt")).as("cnt")).write.format("noop").mode("overwrite").save())
      time("agg_by_piece")(pieces.groupBy(col("piece"))
        .agg(sum(col("cnt")).as("cnt")).write.format("noop").mode("overwrite").save())
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev probe: vocab-stage variants for q105/q86. */
object ProfileQ105c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val words = docs.select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    for (_ <- 1 to 2) {
      println("N=" + time("scan_only")(docs.select(length(col("text"))).agg(sum("length(text)")).count()))
      println("WORDS=" + time("words_count")(words.count()))
      time("words_agg")(words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save())
      println("WHP=" + time("whp_count")(docs.select(
        explode(graft.plans.WordHashPairs(trim(col("text")), 1L << 40)).as("t")).count()))
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev probe: q30 cost decomposition at sf1 — which signal dominates,
  * and whether the single-space word count can drop its split().
  */
object ProfileQ30 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def d = Tables.documents(spark, dir)

    def floor = d.select(length(col("text")).cast("bigint").as("x"))
    // current word count: split+size
    def splitWords = d.select(
      size(split(trim(col("text")), " ")).cast("bigint").as("x"))
    // translate form: spaces+1, no array
    def translateWords = d.select(
      (length(trim(col("text")))
        - length(translate(trim(col("text")), " ", "")) + 1).cast("bigint").as("x"))
    // stopword count (split + filter + isin)
    def stopw = d.select(stopwordCount(words(lower(col("text")))).as("x"))
    // punct
    def punct = d.select(punctCount(col("text")).as("x"))
    def q30full = SparkEntry.queries("q30_quality_score")

    for (i <- 1 to 3) {
      time(s"floor     i$i")(noop(floor))
      time(s"split     i$i")(noop(splitWords))
      time(s"translate i$i")(noop(translateWords))
      time(s"stopw     i$i")(noop(stopw))
      time(s"punct     i$i")(noop(punct))
      time(s"q30full   i$i")(noop(q30full(spark, dir)))
    }
    spark.stop()
  }
}

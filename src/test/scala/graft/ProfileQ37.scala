package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the SimHash pipeline. */
object ProfileQ37 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    def base: DataFrame = {
      val words = docs
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
        .withColumn("h", expr("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"))
      val bitSums = (0 until 60).map(b =>
        sum(when(expr(s"(shiftright(h, $b) % 2) = 1"), 1L).otherwise(-1L)).as(s"bit$b"))
      val simhash = (0 until 60)
        .map(b => when(col(s"bit$b") > 0, lit(1L << b)).otherwise(0L))
        .reduceLeft(_ + _)
      words.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .withColumn("simhash", simhash)
        .select(col("doc_id"), col("simhash"))
    }
    val nativeBase = docs.select(col("doc_id"),
      graft.plans.SimHash60(trim(col("text"))).as("simhash"))
    for (_ <- 1 to 2) {
      time("explode_base")(base.count())
      time("native_base")(nativeBase.count())
      val pinned = time("pin_native")(nativeBase.localCheckpoint(eager = true))
      val combos = Dedup.SimPairCombos.zipWithIndex.map { case ((i, j), c) =>
        val (s1, w1) = (Dedup.SimBlockShifts(i), Dedup.SimBlockWidths(i))
        val (s2, w2) = (Dedup.SimBlockShifts(j), Dedup.SimBlockWidths(j))
        struct(lit(c).as("b"), expr(
          s"(shiftright(simhash, $s1) % ${1L << w1}) * ${1L << w2}" +
            s" + (shiftright(simhash, $s2) % ${1L << w2})").as("bkey"))
      }
      val bands = pinned
        .select(col("doc_id"), col("simhash"), explode(array(combos: _*)).as("pc"))
        .select(col("doc_id"), col("simhash"), col("pc.b").as("b"), col("pc.bkey").as("bkey"))
      val joined = bands.select(col("doc_id").as("a"), col("simhash").as("ha"), col("b"), col("bkey"))
        .join(bands.select(col("doc_id").as("b_id"), col("simhash").as("hb"),
          col("b"), col("bkey")), Seq("b", "bkey"))
        .filter(col("a") < col("b_id"))
      val nCand = time("join_candidates")(joined.count())
      println(s"N candidates = $nCand")
      time("pairs_full")(Dedup.simhashPairs(pinned).count())
      time("full_q37")(SparkEntry.queries("q37_dedup_simhash")(spark, dir).count())
    }
    spark.stop()
  }
}

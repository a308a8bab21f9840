package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 19): q37 candidates-join shapes, interleaved in one
  * JVM. The band self-join's input compresses to a few MB at bench
  * scale, so AQE's input-sized coalescing runs the pair EMISSION
  * (output >> input) on a handful of tasks.
  *
  *   current — Dedup.simhashPairs as shipped (ENSURE_REQUIREMENTS
  *             exchange, AQE-coalesced);
  *   spreadN — explicit repartition(cores, b, bkey) on the band table
  *             before the self-join (same exchange count — replaces
  *             the requirement exchange — but pinned at cores);
  *   shj     — SHUFFLE_HASH hint on the self-join (drops both sorts).
  *
  * Usage: Test/runMain graft.ProfileQ37AB [sfDir] [rounds]
  */
object ProfileQ37AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import graft.operators.{Dedup, Pin}

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    def base = docs
      .select(col("doc_id"), Dedup.simhash60(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)

    val combos = Dedup.SimPairCombos.zipWithIndex.map { case ((i, j), c) =>
      val (s1, w1) = (Dedup.SimBlockShifts(i), Dedup.SimBlockWidths(i))
      val (s2, w2) = (Dedup.SimBlockShifts(j), Dedup.SimBlockWidths(j))
      struct(lit(c).as("b"), expr(
        s"(shiftright(simhash, $s1) % ${1L << w1}) * ${1L << w2}" +
          s" + (shiftright(simhash, $s2) % ${1L << w2})").as("bkey"))
    }
    def bandsOf(pinned: DataFrame): DataFrame = pinned
      .select(col("doc_id"), col("simhash"), explode(array(combos: _*)).as("pc"))
      .select(col("doc_id"), col("simhash"), col("pc.b").as("b"), col("pc.bkey").as("bkey"))

    def finish(nearPairs: DataFrame): DataFrame = nearPairs
      .filter(col("b") === graft.plans.FirstCleanPair(
        col("ha"), col("hb"), Dedup.SimBlockShifts, Dedup.SimBlockWidths))
      .select(col("a"), col("b_id").as("b"), col("hamming"))
      .repartition(col("a"))
      .orderBy(col("a"), col("b"))

    def joinPairs(bands: DataFrame, hint: Option[String]): DataFrame = {
      val left = bands.select(col("doc_id").as("a"), col("simhash").as("ha"),
        col("b"), col("bkey"))
      val right0 = bands.select(col("doc_id").as("b_id"), col("simhash").as("hb"),
        col("b"), col("bkey"))
      val right = hint.fold(right0)(h => right0.hint(h))
      left.join(right, Seq("b", "bkey"))
        .filter(col("a") < col("b_id"))
        .withColumn("hamming", expr("bit_count(ha ^ hb)"))
        .filter(col("hamming") <= 12)
    }

    def spreadBase = graft.operators.Spread(docs)
      .select(col("doc_id"), Dedup.simhash60(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)

    def current(): DataFrame = finish(joinPairs(bandsOf(Pin(base)), None))
    def spreadN(): DataFrame = {
      val n = spark.sparkContext.defaultParallelism
      finish(joinPairs(bandsOf(Pin(base)).repartition(n, col("b"), col("bkey")), None))
    }
    def shj(): DataFrame = finish(joinPairs(bandsOf(Pin(base)), Some("SHUFFLE_HASH")))
    def spreadDocs(): DataFrame = finish(joinPairs(bandsOf(Pin(spreadBase)), None))

    val shapes = Seq("current" -> current _, "spreadN" -> spreadN _,
      "shj" -> shj _, "spreadDocs" -> spreadDocs _)
    for ((name, mk) <- shapes) { // warm
      mk().write.format("noop").mode("overwrite").save(); Verify.releaseQueryState(spark)
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 1 to rounds; (name, mk) <- shapes) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Verify.releaseQueryState(spark)
      acc(name) = s :: acc.getOrElse(name, Nil)
      println(f"round$r $name%-10s $s%.2f s")
    }
    for ((n, ts) <- acc.toSeq.sortBy(_._1))
      println(f"MIN $n%-10s ${ts.min}%.3f  all=${ts.reverse.map(t => f"$t%.2f").mkString(" ")}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage breakdown of the fused q59/q62 pipelines. */
object ProfilePromptStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/.bench/sf1"
    val spark = GraftSession.local("32", "32")
    import graft.functions.EventFunctions._

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${ts.min}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    val ev = norm(Tables.events(spark, sfDir))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm
    noop(ev)
    time("scan+norm")(noop(ev))
    time("scan+filter")(noop(ev.filter(isMsg || isCmd)))

    import org.apache.spark.sql.expressions.Window
    val utt = concat(lit("u"), col("user_id").cast("string"),
      lit("#"), col("event_id").cast("string"))
    val asc = Window.partitionBy(col("instance_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val ascGrow = asc.rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.partitionBy(col("instance_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = ev.filter(isMsg || isCmd)
    val marksAsc = base.select(col("*"), utt.as("utt"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(ascGrow).as("prev_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(ascGrow).as("prev_id"))
    time("..+ascWindow")(noop(marksAsc))
    val marksBoth = base.select(col("*"), utt.as("utt"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(ascGrow).as("prev_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(ascGrow).as("prev_id"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(desc).as("next_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(desc).as("next_id"))
    time("..+bothWindows")(noop(marksBoth))
    val withHist = base.select(Seq(col("*"), utt.as("utt"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(ascGrow).as("prev_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(ascGrow).as("prev_id"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(desc).as("next_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(desc).as("next_id")
    ) ++ (1 to 5).map(k =>
      lag(when(isMsg, utt), k, null, ignoreNulls = true).over(asc).as(s"_h$k")): _*)
    time("..+hist lags")(noop(withHist))

    val before = col("next_ts").isNull ||
      (col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us"))
    val g59 = marksBoth
      .withColumn("grp_cmd",
        when(isCmd, col("event_id"))
          .otherwise(when(before, col("prev_id")).otherwise(col("next_id"))))
      .withColumn("rp_ok", isMsg && col("value") >= 5 && before)
      .groupBy(col("instance_id"), col("grp_cmd").as("cmd_id"))
      .agg(
        expr("listagg(CASE WHEN rp_ok THEN utt END, '\n') WITHIN GROUP (ORDER BY ts_us, event_id)").as("rp"),
        max(when(isCmd, col("user_id"))).as("cmd_user"))
      .filter(col("rp").isNotNull && col("cmd_user").isNotNull)
    time("q59 pre-boundary agg")(noop(g59))

    // roster branch alone
    val roster = {
      val byActivity = Window.partitionBy(col("instance_id"))
        .orderBy(col("_n").desc, col("user_id").asc)
      ev.groupBy(col("instance_id"), col("user_id")).agg(count(lit(1)).as("_n"))
        .withColumn("_rk", row_number().over(byActivity))
        .filter(col("_rk") <= 8)
    }
    time("roster branch")(noop(roster))

    // post-boundary variants
    val g59r = g59.repartition(col("cmd_id"))
    time("q59 agg+repartition")(noop(g59r))

    val byActivity = Window.partitionBy(col("instance_id"))
      .orderBy(col("_n").desc, col("user_id").asc)
    import graft.functions.{PromptFunctions => P, TextFunctions}
    def hashBucket(u: org.apache.spark.sql.Column, salt: String, mod: Int) =
      TextFunctions.hashBucket(u, salt, mod)
    val ablock = ev
      .groupBy(col("instance_id"), col("user_id")).agg(count(lit(1)).as("_n"))
      .withColumn("_rk", row_number().over(byActivity))
      .filter(col("_rk") <= 8)
      .withColumn("line", concat(lit("- "), col("user_id").cast("string")))
      .groupBy(col("instance_id"))
      .agg(P.actorsBlockOfJoined(
        expr("listagg(line, '\n') WITHIN GROUP (ORDER BY user_id)")).as("actors_block"))
    time("ablock full branch")(noop(ablock))

    val joined = g59r.join(broadcast(ablock), Seq("instance_id"))
      .select(col("cmd_id"), col("rp"), col("actors_block"))
    time("q59 ..+bcast join")(noop(joined))

    time("q59 full")(noop(SparkEntry.queries("q59_prompt_assembly")(spark, sfDir)))
    val q59noSort = SparkEntry.queries("q59_prompt_assembly")(spark, sfDir)
    time("q59 full (re)")(noop(q59noSort))
    time("q62 full")(noop(SparkEntry.queries("q62_sta_nar_assembly")(spark, sfDir)))
    spark.stop()
  }
}

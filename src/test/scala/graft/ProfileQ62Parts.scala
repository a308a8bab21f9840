package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: cost of q62's distinctive pieces at sf1. */
object ProfileQ62Parts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/.bench/sf1"
    val spark = GraftSession.local("32", "32")
    import graft.functions.EventFunctions._

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s ${ts.min}%.2f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ev = norm(Tables.events(spark, sfDir))
    val utt = concat(lit("u"), col("user_id").cast("string"),
      lit("#"), col("event_id").cast("string"))
    val asc = Window.partitionBy(col("instance_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val ascGrow = asc.rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.partitionBy(col("instance_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = ev.filter(isMsg || isCmd)
    def marks = Seq(
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(ascGrow).as("prev_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(ascGrow).as("prev_id"),
      last(when(isCmd, col("ts_us")), ignoreNulls = true).over(desc).as("next_ts"),
      last(when(isCmd, col("event_id")), ignoreNulls = true).over(desc).as("next_id"))

    val both = base.select(col("*") +: utt.as("utt") +: marks: _*)
    noop(both) // warm
    time("bothWindows")(noop(both))
    val withIgnLags = base.select(Seq(col("*"), utt.as("utt")) ++ marks ++
      (1 to 5).map(k => lag(when(isMsg, utt), k, null, ignoreNulls = true).over(asc).as(s"_h$k")): _*)
    time("..+5 ignoreNulls lags")(noop(withIgnLags))
    val withPlainLags = base.select(Seq(col("*"), utt.as("utt")) ++ marks ++
      (1 to 5).map(k => lag(utt, k).over(asc).as(s"_h$k")): _*)
    time("..+5 plain lags")(noop(withPlainLags))
    val with1IgnLag = base.select(Seq(col("*"), utt.as("utt")) ++ marks ++
      Seq(lag(when(isMsg, utt), 1, null, ignoreNulls = true).over(asc).as("_h1")): _*)
    time("..+1 ignoreNulls lag")(noop(with1IgnLag))

    // group agg variants over the no-hist stream
    val before = col("next_ts").isNull ||
      (col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us"))
    val g = both
      .withColumn("grp_cmd",
        when(isCmd, col("event_id"))
          .otherwise(when(before, col("prev_id")).otherwise(col("next_id"))))
      .withColumn("aft_ok", isMsg && col("value") >= 5 && !before)
    val aggListagg = g.groupBy(col("instance_id"), col("grp_cmd").as("cmd_id"))
      .agg(
        expr("listagg(CASE WHEN aft_ok THEN utt END, '\n') WITHIN GROUP (ORDER BY ts_us, event_id)").as("after_rp"),
        max(when(isCmd, col("user_id"))).as("cmd_user"))
      .filter(col("after_rp").isNotNull && col("cmd_user").isNotNull)
    time("agg listagg+max")(noop(aggListagg))
    val aggWithTgt = g.groupBy(col("instance_id"), col("grp_cmd").as("cmd_id"))
      .agg(
        expr("listagg(CASE WHEN aft_ok THEN utt END, '\n') WITHIN GROUP (ORDER BY ts_us, event_id)").as("after_rp"),
        transform(
          array_sort(array_distinct(collect_list(
            when(col("aft_ok"),
              struct(col("user_id"), concat(lit("s"), col("user_id")).as("short")))))),
          x => x.getField("short")).as("tgt_arr"),
        max(when(isCmd, col("user_id"))).as("cmd_user"))
      .filter(col("after_rp").isNotNull && col("cmd_user").isNotNull)
    time("..+tgt collect/distinct")(noop(aggWithTgt))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.EventFunctions
import graft.operators.{NearestEvent, Sessionize}
import graft.queries.EventOps

/** Invariant checks for §2.B at sf0.001 (the DuckDB oracle gate at
  * sf0.01 is the equivalence check; these pin semantic invariants).
  */
class EventOpsSpec extends SparkTestBase {

  private def q(name: String) =
    EventOps.all.find(_.name == name).get.run(spark, sfDir)

  test("sessionize covers every event exactly once") {
    val ev = EventFunctions.norm(Tables.events(spark, sfDir))
    val total = ev.count()
    val sessions = q("q11_sessionize")
    assert(sessions.agg(sum("n_events")).first().getLong(0) == total)
    // session ids are 1..max contiguous per user
    val bad = sessions.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("session gaps: consecutive events within a session are <= 30 min apart") {
    val ev = EventFunctions.norm(Tables.events(spark, sfDir))
    val df = Sessionize(ev, "user_id", "ts_us", "event_id", 1800L * 1000000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
    val gaps = df.withColumn("d", col("ts_us") - lag("ts_us", 1).over(w))
      .filter(col("d") > 1800L * 1000000L)
    assert(gaps.isEmpty)
  }

  test("nearest association picks the strictly closer command (ties before)") {
    val ev = EventFunctions.norm(Tables.events(spark, sfDir))
    val a = NearestEvent.assoc(ev, "instance_id", "ts_us", "event_id",
      EventFunctions.isMsg, EventFunctions.isCmd)
    assert(a.filter(col("delta_us") < 0).isEmpty)
    val wrong = a.filter(
      (col("side") === "before" && col("next_ts").isNotNull &&
        col("next_ts") - col("ts_us") < col("ts_us") - col("prev_ts")) ||
      (col("side") === "after" && col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us")))
    assert(wrong.isEmpty)
  }

  test("sessionize boundary: exactly-gap spacing stays in one session, gap+1 splits") {
    import spark.implicits._
    val gap = 1800L * 1000000L
    val df = Seq(
      (1L, 0L, 10L), (2L, gap, 10L),              // delta == gap -> same session
      (3L, 2 * gap + 1, 10L),                     // delta == gap+1 -> new session
      (4L, 2 * gap + 1, 11L))                     // other user -> own session
      .toDF("event_id", "ts_us", "user_id")
    val got = Sessionize(df, "user_id", "ts_us", "event_id", gap)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1 && got(2L) == 1 && got(3L) == 2 && got(4L) == 1)
  }

  test("nearest association: exact tie in |delta| resolves to the earlier command") {
    import spark.implicits._
    // command at 0 and at 200; message at 100 is equidistant -> before
    val df = Seq(
      (1L, 0L, 1L, "purchase", 0.0, 7),
      (2L, 100L, 1L, "click", 9.0, 7),
      (3L, 200L, 1L, "purchase", 0.0, 7))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "instance_id")
    val a = NearestEvent.assoc(df, "instance_id", "ts_us", "event_id",
      EventFunctions.isMsg, EventFunctions.isCmd).collect()
    assert(a.length == 1)
    val r = a.head
    assert(r.getAs[String]("side") == "before")
    assert(r.getAs[Long]("cmd_id") == 1L)
    assert(r.getAs[Long]("delta_us") == 100L)
  }

  test("heuristic counts are consistent across queries") {
    val msgs = q("q16_message_count").agg(sum("n_messages")).first().getLong(0)
    val evs = q("q17_event_count").agg(sum("n_events")).first().getLong(0)
    assert(msgs > 0 && msgs < evs)
    val r = q("q18_msg_cmd_ratio")
    assert(r.filter(col("msg_cmd_ratio") < 0).isEmpty)
    val t = q("q24_turn_changes")
    assert(t.filter(col("n_turns") =!= col("n_turn_changes") + 1).isEmpty)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogs of the batch distillation: the
  * reference pipeline consumes a Kinesis Firehose stream
  * (reference: dataset/utils.py — the firehose dump IS the dataset);
  * re-expressed as readStream → stateful transform → writeStream.
  */
object SessionStream {

  /** One incoming stream event (event-time in `ts`). */
  case class StreamEvent(userId: Long, ts: Timestamp, eventType: String, value: Double)

  /** Open-session state kept per user between micro-batches. */
  case class SessionState(startMs: Long, endMs: Long, nEvents: Long)

  /** A completed (gap-closed or timed-out) session. */
  case class SessionOut(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Gap-based streaming sessionization via flatMapGroupsWithState +
    * event-time timeout. State is one tiny SessionState per active
    * user — bounded by active users, not by throughput; the watermark
    * both bounds state (timeouts close idle sessions) and bounds
    * lateness. Mirrors the batch Sessionize operator's semantics.
    */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long,
                 watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, batch: Iterator[StreamEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption
          .map(s => SessionOut(userId, s.startMs, s.endMs, s.nEvents)).toList
        state.remove()
        return out.iterator
      }
      val sorted = batch.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          // within gap of the open session on either side (an
          // in-watermark late event may precede the session start)
          case Some(s) if t >= s.startMs - gapMs && t <= s.endMs + gapMs =>
            cur = Some(SessionState(
              math.min(s.startMs, t), math.max(s.endMs, t), s.nEvents + 1))
          // after the session's gap window: close it, start fresh
          case Some(s) if t > s.endMs + gapMs =>
            closed ::= SessionOut(userId, s.startMs, s.endMs, s.nEvents)
            cur = Some(SessionState(t, t, 1))
          // late event more than a gap BEFORE the open session: it
          // belongs to an already-gap-closed span — emit it as its own
          // session rather than corrupting the open one
          case Some(_) =>
            closed ::= SessionOut(userId, t, t, 1)
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close the open session once the watermark passes its end+gap
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.reverse.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Running per-instance heuristic scores, updated every
    * micro-batch (the reference's streaming heuristic applicator —
    * reference: explorer_server.py applies heuristics/count.py and
    * ratio.py continuously as instances stream in). State per
    * instance is four counters; emitted in update mode.
    */
  case class InstanceEvent(instanceId: Int, ts: Timestamp, eventType: String, value: Double)
  case class InstanceStats(nEvents: Long, nMessages: Long, nCommands: Long, sumMsgLen: Double)
  case class InstanceHeuristics(instanceId: Int, nEvents: Long, nMessages: Long,
      nCommands: Long, msgCmdRatio: Option[Double], avgMsgLen: Option[Double])

  def runningHeuristics(events: Dataset[InstanceEvent]): Dataset[InstanceHeuristics] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.instanceId)
      .mapGroupsWithState[InstanceStats, InstanceHeuristics](GroupStateTimeout.NoTimeout) {
        (id, batch, state) =>
          var s = state.getOption.getOrElse(InstanceStats(0, 0, 0, 0.0))
          for (e <- batch) {
            val isMsg = e.eventType == "click" || e.eventType == "view"
            s = InstanceStats(
              s.nEvents + 1,
              s.nMessages + (if (isMsg) 1 else 0),
              s.nCommands + (if (e.eventType == "purchase") 1 else 0),
              s.sumMsgLen + (if (isMsg) e.value else 0.0))
          }
          state.update(s)
          InstanceHeuristics(id, s.nEvents, s.nMessages, s.nCommands,
            if (s.nCommands > 0) Some(s.nMessages.toDouble / s.nCommands) else None,
            if (s.nMessages > 0) Some(s.sumMsgLen / s.nMessages) else None)
      }
  }

  /** Streaming exact-dedup: drops redelivered events (Kinesis-style
    * at-least-once ingest) by id within the watermark horizon — state
    * holds one key per event inside the horizon, aged out by the
    * watermark instead of growing forever. The streaming counterpart
    * of the batch exact-dedup (q34). */
  def dedupedEvents(events: Dataset[StreamEvent], idCols: Seq[String],
                    watermarkDelay: String = "10 seconds"): Dataset[StreamEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
      .as[StreamEvent]
  }

  /** Tumbling-window event counts with a watermark (the reference's
    * heuristic explorer applied continuously; SURVEY §2 #43). */
  def windowedCounts(events: Dataset[StreamEvent], window: String,
                     watermarkDelay: String = "10 seconds") =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window),
        col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("eventType"),
        col("n"),
        col("sum_value"))
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level helpers for the `events` stream table.
  *
  * Data-model mapping (SURVEY.md §3): the reference's Discord events
  * (reference: heuristics/utils.py:Instance) map onto the synthetic
  * stream as message ↔ click/view, command ↔ purchase, state-update ↔
  * signup, error ↔ noise; the combat-instance key is carried in
  * `props` (JSON `k`).
  *
  * Time base: events.ts is parquet TIMESTAMP(NANOS), surfaced by the
  * reader as BIGINT epoch-nanos (see graft.Tables). All event logic
  * runs on exact int64 epoch-MICROseconds (`ts DIV 1000`), which is
  * bit-identical to DuckDB's `epoch_us(ts)` (DuckDB truncates ns→µs
  * on parquet read) — no float time arithmetic anywhere.
  */
object EventFunctions {

  /** Message-analog event types (utterances). */
  val MsgTypes: Seq[String] = Seq("click", "view")
  /** Command-analog event type (triggers automation). */
  val CmdType = "purchase"
  /** State-update-analog event type (its users form the "DM" set). */
  val StateType = "signup"

  def isMsg: Column = col("event_type").isin(MsgTypes: _*)
  def isCmd: Column = col("event_type") === CmdType
  def isState: Column = col("event_type") === StateType

  /** Normalized event projection: exact µs timestamps + instance key.
    * Columns: event_id, ts_us, user_id, event_type, value, instance_id.
    */
  def norm(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      expr("ts DIV 1000").as("ts_us"),
      col("user_id"),
      col("event_type"),
      col("value"),
      regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("instance_id"))

  /** Shared oracle-SQL CTE matching [[norm]] exactly (DuckDB side). */
  val NormSql: String =
    """ev AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
      |         CAST(regexp_extract(props, '(\d+)', 1) AS INT) AS instance_id
      |  FROM events
      |)""".stripMargin
}

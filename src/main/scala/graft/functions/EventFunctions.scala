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
  * Time base: all event logic runs on exact int64 epoch-MICROseconds
  * (`ts_us`), bit-identical to DuckDB's `epoch_us(ts)` — no float
  * time arithmetic anywhere. The physical `ts` column has shipped as
  * both parquet TIMESTAMP(NANOS) (surfaced as BIGINT epoch-nanos via
  * the nanosAsLong conf in graft.Tables) and TIMESTAMP(MICROS)
  * (surfaced as TIMESTAMP_NTZ), so [[norm]] branches on the read
  * schema rather than assuming one encoding. The session timezone is
  * pinned to UTC (graft.GraftSession), making the NTZ→LTZ cast an
  * identity mapping and `unix_micros` exactly DuckDB's `epoch_us`.
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
    *
    * Schema-robust on `ts`: BIGINT epoch-nanos → integer `DIV 1000`;
    * any timestamp type → `unix_micros` (NTZ first cast to LTZ, an
    * identity under the UTC session timezone). Both paths are exact
    * int64 µs with identical ns→µs truncation semantics.
    */
  def norm(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      tsUs(events).as("ts_us"),
      col("user_id"),
      col("event_type"),
      col("value"),
      graft.plans.FirstInt(col("props")).as("instance_id"))

  /** The schema-robust exact-µs timestamp column of [[norm]], exposed
    * for projections that need extra source columns (q66 keeps props
    * as the content stand-in). */
  def tsUs(events: DataFrame): Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    events.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _                => unix_micros(col("ts"))
    }
  }

  /** Shared oracle-SQL CTE matching [[norm]] exactly (DuckDB side). */
  val NormSql: String =
    """ev AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
      |         CAST(regexp_extract(props, '(\d+)', 1) AS INT) AS instance_id
      |  FROM events
      |)""".stripMargin

  /** Shared oracle CTEs mirroring NearestEvent.assoc on instance_id
    * (reference: distill1_time_group.py:48-68 — nearest automation run
    * by |ts delta|, ties → before). Exposes `assoc(msg_id, user_id,
    * value, ts_us, cmd_id, side, delta_us)`; consumers select the
    * columns they need. */
  val NearestAssocSql: String =
    """w AS (SELECT *,
      |  last_value(CASE WHEN event_type='purchase' THEN ts_us END IGNORE NULLS) OVER wp AS prev_ts,
      |  last_value(CASE WHEN event_type='purchase' THEN event_id END IGNORE NULLS) OVER wp AS prev_id,
      |  first_value(CASE WHEN event_type='purchase' THEN ts_us END IGNORE NULLS) OVER wn AS next_ts,
      |  first_value(CASE WHEN event_type='purchase' THEN event_id END IGNORE NULLS) OVER wn AS next_id
      |  FROM ev
      |  WINDOW wp AS (PARTITION BY instance_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         wn AS (PARTITION BY instance_id ORDER BY ts_us, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |pick AS (SELECT *,
      |  (next_ts IS NULL OR (prev_ts IS NOT NULL AND ts_us - prev_ts <= next_ts - ts_us)) AS is_before
      |  FROM w
      |  WHERE event_type IN ('click','view') AND (prev_ts IS NOT NULL OR next_ts IS NOT NULL)),
      |assoc AS (SELECT event_id AS msg_id, user_id, value, ts_us,
      |  CASE WHEN is_before THEN prev_id ELSE next_id END AS cmd_id,
      |  CASE WHEN is_before THEN 'before' ELSE 'after' END AS side,
      |  CASE WHEN is_before THEN ts_us - prev_ts ELSE next_ts - ts_us END AS delta_us
      |FROM pick)""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Bonus surface: the scale-join operators (as-of, banded range) run
  * as oracle-checked queries over `events`. These are the join shapes
  * a 100 TB event store actually needs — both implemented WITHOUT an
  * inequality join (Spark would nested-loop it): as-of via union +
  * growing window, range via time-bin banding.
  */
object JoinOps extends QueryModule {

  // q53: for each command event, the latest state-update event at or
  // before it in the same instance (the reference's "combat state as
  // of this command" lookup; reference: distill4_normalize.py
  // before/after state extraction).
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))
    val cmds = ev.filter(isCmd).select(col("event_id"), col("ts_us"), col("instance_id"))
    val states = ev.filter(isState).select(col("event_id"), col("ts_us"), col("instance_id"))
    AsOfJoin.lastAtOrBefore(cmds, states, "instance_id", "ts_us", "event_id",
        rightCols = Seq("event_id", "ts_us"))
      .filter(col("asof_event_id").isNotNull)
      .select(
        col("event_id").as("cmd_id"),
        col("ts_us"),
        col("asof_event_id").as("state_id"),
        col("asof_ts_us").as("state_ts"),
        (col("ts_us") - col("asof_ts_us")).as("lag_us"))
      .orderBy(col("cmd_id"))
  }

  // Single-table window mirror of the union+window as-of: rows of
  // other event types carry NULL in the CASEs so they can't affect
  // last_value, and the 0/1 order key reproduces the right-before-left
  // tie rule at equal timestamps.
  private val q53Sql =
    s"""WITH $NormSql,
       |u AS (SELECT *,
       |  last_value(CASE WHEN event_type='signup' THEN event_id END IGNORE NULLS) OVER w AS state_id,
       |  last_value(CASE WHEN event_type='signup' THEN ts_us END IGNORE NULLS) OVER w AS state_ts
       |  FROM ev
       |  WINDOW w AS (PARTITION BY instance_id
       |    ORDER BY ts_us, (CASE WHEN event_type='signup' THEN 0 ELSE 1 END), event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT event_id AS cmd_id, ts_us, state_id, state_ts, ts_us - state_ts AS lag_us
       |FROM u WHERE event_type = 'purchase' AND state_id IS NOT NULL
       |ORDER BY cmd_id""".stripMargin

  /** 30 minutes in µs — the q54 pair width. */
  private val WidthUs = 1800L * 1000000L

  // q54: per instance, how many event pairs fall within 30 minutes of
  // each other, and the closest spacing (burst detection — the
  // reference's time-grouping heuristics ask exactly this of combat
  // rounds). Banded equi-join, never an inequality join.
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))
      .select(col("instance_id"), col("ts_us"), col("event_id"))
    RangeJoin.pairsWithin(ev, "instance_id", "ts_us", "event_id", WidthUs)
      .groupBy(col("instance_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("ts_a") - col("ts_b"))).as("closest_us"))
      .orderBy(col("instance_id"))
  }

  private val q54Sql =
    s"""WITH $NormSql,
       |p AS (SELECT a.instance_id, abs(a.ts_us - b.ts_us) AS d
       |  FROM ev a JOIN ev b ON a.instance_id = b.instance_id
       |    AND a.event_id < b.event_id
       |    AND abs(a.ts_us - b.ts_us) <= $WidthUs)
       |SELECT instance_id, count(*) AS n_pairs, min(d) AS closest_us
       |FROM p GROUP BY instance_id ORDER BY instance_id""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q53_asof_state", q53, Some(q53Sql)),
    QueryDef("q54_range_pairs", q54, Some(q54Sql)))
}

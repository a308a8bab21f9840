package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._
import graft.functions.Exact.sumD2

/** Bonus §B-family heuristics beyond the 45-row checklist: the
  * remaining per-instance scores from the reference's heuristic
  * toolkit (reference: heuristics/zhu.py:49-103 — num_words_per_turn,
  * num_player_actors / num_monster_actors / player_to_monster_ratio,
  * mapped per SURVEY §3: players ≈ users who cast commands, monsters ≈
  * state-update-only users).
  */
object ExtraHeuristics extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame =
    norm(Tables.events(s, dir))

  // q51: average message words per turn (turn = maximal run of
  // consecutive same-user events; reference: heuristics/zhu.py:49
  // num_words_per_turn built on utils.py:20 did_turn_change).
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("instance_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .withColumn("prev_user", lag(col("user_id"), 1).over(w))
      .groupBy(col("instance_id"))
      .agg(
        (count(when(col("prev_user").isNotNull && col("prev_user") =!= col("user_id"), lit(1))) + 1)
          .as("n_turns"),
        sumD2(when(isMsg, col("value"))).as("msg_words"))
      .withColumn("words_per_turn", col("msg_words") / col("n_turns"))
      .select(col("instance_id"), col("n_turns"), col("words_per_turn"))
      .orderBy(col("instance_id"))
  }

  private val q51Sql =
    s"""WITH $NormSql,
       |w AS (SELECT *, lag(user_id) OVER (PARTITION BY instance_id ORDER BY ts_us, event_id) AS prev_user FROM ev)
       |SELECT instance_id,
       |  COUNT(*) FILTER (WHERE prev_user IS NOT NULL AND prev_user <> user_id) + 1 AS n_turns,
       |  CAST(COALESCE(SUM(CASE WHEN event_type IN ('click','view') THEN CAST(value AS DECIMAL(12,2)) END), 0) AS DOUBLE)
       |    / (COUNT(*) FILTER (WHERE prev_user IS NOT NULL AND prev_user <> user_id) + 1) AS words_per_turn
       |FROM w GROUP BY instance_id ORDER BY instance_id""".stripMargin

  // q52: player/monster actor mix (reference: heuristics/zhu.py:98-103
  // player_to_monster_ratio): players = users with >=1 command in the
  // instance; monsters = users appearing only in state updates.
  private def q52(s: SparkSession, dir: String): DataFrame = {
    // Two-level aggregation instead of a (instance,user) window + agg:
    // level 1 is one flag row per (instance, user) — partial-agg'd
    // map-side, no sort — and level 2 counts flagged users directly
    // (per-user rows are already distinct; the isNotNull guards mirror
    // COUNT(DISTINCT)'s null-skipping).
    val perUser = ev(s, dir)
      .groupBy(col("instance_id"), col("user_id"))
      .agg(
        max(when(isCmd, 1).otherwise(0)).as("has_cmd"),
        max(when(isState, 1).otherwise(0)).as("has_state"))
    perUser
      .groupBy(col("instance_id"))
      .agg(
        count(when(col("has_cmd") === 1 && col("user_id").isNotNull, lit(1))).as("n_players"),
        count(when(col("has_cmd") === 0 && col("has_state") === 1 && col("user_id").isNotNull,
          lit(1))).as("n_monsters"))
      .withColumn("player_monster_ratio",
        col("n_players") / when(col("n_monsters") === 0, lit(null)).otherwise(col("n_monsters")))
      .orderBy(col("instance_id"))
  }

  private val q52Sql =
    s"""WITH $NormSql,
       |f AS (SELECT *,
       |  MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) OVER (PARTITION BY instance_id, user_id) AS has_cmd,
       |  MAX(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) OVER (PARTITION BY instance_id, user_id) AS has_state
       |  FROM ev)
       |SELECT instance_id,
       |  COUNT(DISTINCT CASE WHEN has_cmd = 1 THEN user_id END) AS n_players,
       |  COUNT(DISTINCT CASE WHEN has_cmd = 0 AND has_state = 1 THEN user_id END) AS n_monsters,
       |  COUNT(DISTINCT CASE WHEN has_cmd = 1 THEN user_id END)
       |    / NULLIF(COUNT(DISTINCT CASE WHEN has_cmd = 0 AND has_state = 1 THEN user_id END), 0) AS player_monster_ratio
       |FROM f GROUP BY instance_id ORDER BY instance_id""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q51_words_per_turn", q51, Some(q51Sql)),
    QueryDef("q52_actor_mix", q52, Some(q52Sql)))
}

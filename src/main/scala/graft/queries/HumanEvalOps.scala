package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._

/** Human-eval scenario prep — the compute core of the reference's
  * Qualtrics survey builder (reference:
  * human_eval/prep_human_eval.py:117-216): a capped deterministic
  * sample of instances, each rendered as its last-15-message context
  * window before the final command, with authors anonymized to
  * first-appearance "Player N" labels and content run through a
  * word-list profanity censor. The HTML templating around it
  * (discord_render.py, the [[Question:…]] scaffolding) is UI, out of
  * scope; everything that touches the event data is here.
  *
  * Reference semantics mirrored:
  *  - `data[:75]` (prep_human_eval.py:126) — the first 75 instances in
  *    deterministic order; instances without a command are dropped
  *    (the reference's rows come from merged RESULTS, which exist only
  *    for commands).
  *  - `message_history[-15:]` before the last command
  *    (prep_human_eval.py:142-148) — strictly-before, oldest-first.
  *  - author anonymization (prep_human_eval.py:106-115): the bot id
  *    keeps its name, every other author becomes "Player N" in
  *    first-appearance order over the instance's FULL message stream
  *    (normalize_messages enumerates all events, not just the
  *    window), 0-based. The synthetic stand-in for AVRAE_ID is
  *    user_id 0.
  *  - the profanity censor (prep_human_eval.py:211-216): each listed
  *    word, censored character-by-character to '-' (set_censor("-")),
  *    word-boundary matched. The list here is a small fixed stand-in
  *    (the reference reads profanity.txt); `props` is the synthetic
  *    stream's only content field, so it stands in for message
  *    content.
  *
  * Scale shape: the instance cap is a tiny sorted-limit aggregate →
  * BROADCAST semi-join (never a shuffle of the event stream against
  * it); the window stack then runs only over the ≤75 kept instances'
  * rows — the per-instance sort is the same (ts_us, event_id) order
  * every event query shares. The author numbering is a dense_rank
  * over per-(instance, user) first-appearance rows — one row per
  * participant, negligible. Nothing here scales with the corpus
  * beyond the initial pushed-down instance filter.
  */
object HumanEvalOps extends QueryModule {

  private val SampleN = 75
  private val HistLen = 15

  /** Fixed censor list: word → the reference's per-character '-'
    * mask. "k" hits every synthetic props row (so the censor is
    * exercised on real data); the others document multi-char masking
    * and the no-hit path. */
  private val Profanity = Seq("k" -> "-", "grue" -> "----", "vile" -> "----")

  private def censor(c: Column): Column =
    Profanity.foldLeft(c) { case (acc, (w, mask)) =>
      regexp_replace(acc, "\\b" + w + "\\b", mask)
    }

  private def q66(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
    val ev = raw.select(
      col("event_id"), tsUs(raw).as("ts_us"), col("user_id"),
      col("event_type"),
      graft.plans.FirstInt(col("props")).as("instance_id"), col("props"))

    // deterministic cap: first N instance ids — a tiny sorted-limit
    // aggregate, broadcast back as a semi-join filter
    val insts = ev.select(col("instance_id")).distinct()
      .orderBy(col("instance_id")).limit(SampleN)
    val kept = ev.join(broadcast(insts), Seq("instance_id"), "left_semi")
      .filter(isMsg || isCmd)

    // ONE window pipeline over one hash exchange on instance_id (every
    // window partition key below starts with instance_id, so the
    // single exchange satisfies them all; only the per-window SORTS
    // differ, and the whole-partition frames need no time order):
    //  1. last_cmd — partition-only max over cmd rows;
    //  2. first_key — partition-only min per (instance, user): each
    //     author's first appearance over ALL the instance's messages;
    //  3. player_n — dense_rank of first_key within the instance, the
    //     bot user (id 0) ordered LAST so it never shifts the 0-based
    //     player numbering (its own rank is unused — it renders as
    //     "Avrae");
    //  4. the descending top-15 window (the only (ts, id) sort that
    //     moves the full message stream — WindowGroupLimit prunes it).
    // The previous shape computed the scan + cap + window stack TWICE
    // (a separate `firsts` aggregate joined back): 2x the corpus scan
    // at scale for a column derivable inside the same pipeline.
    val wPart = Window.partitionBy(col("instance_id"))
    val wUser = Window.partitionBy(col("instance_id"), col("user_id"))
    val key = struct(col("ts_us"), col("event_id"))
    val marked = kept.withColumn("last_cmd", max(when(isCmd, key)).over(wPart))
    val msgs = marked.filter(isMsg && col("last_cmd").isNotNull)
      .withColumn("first_key", min(key).over(wUser))
      .withColumn("player_n",
        dense_rank().over(wPart.orderBy(
          (col("user_id") === 0).cast("int"), col("first_key"))) - 1)

    val wDesc = wPart.orderBy(col("ts_us").desc, col("event_id").desc)
    msgs
      .filter(key < col("last_cmd"))
      .withColumn("_rn", row_number().over(wDesc))
      .filter(col("_rn") <= HistLen)
      .withColumn("seq", (count(lit(1)).over(wPart) - col("_rn") + 1).cast("int"))
      .select(
        col("instance_id").as("scenario_id"),
        col("seq"),
        when(col("user_id") === 0, "Avrae")
          .otherwise(concat(lit("Player "), col("player_n").cast("string")))
          .as("author"),
        censor(col("props")).as("content"))
      .orderBy(col("scenario_id"), col("seq"))
  }

  private val q66Sql =
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       |         CAST(regexp_extract(props, '(\\d+)', 1) AS INT) AS instance_id, props
       |  FROM events),
       |insts AS (
       |  SELECT DISTINCT instance_id FROM ev ORDER BY instance_id LIMIT $SampleN),
       |kept AS (
       |  SELECT * FROM ev
       |  WHERE instance_id IN (SELECT instance_id FROM insts)
       |    AND event_type IN ('click', 'view', 'purchase')),
       |marked AS (
       |  SELECT *, max(CASE WHEN event_type = 'purchase'
       |      THEN struct_pack(ts_us := ts_us, event_id := event_id) END)
       |      OVER (PARTITION BY instance_id) AS last_cmd
       |  FROM kept),
       |msgs AS (
       |  SELECT * FROM marked
       |  WHERE event_type IN ('click', 'view') AND last_cmd IS NOT NULL),
       |firsts AS (
       |  SELECT instance_id, user_id,
       |    dense_rank() OVER (PARTITION BY instance_id
       |      ORDER BY min(struct_pack(ts_us := ts_us, event_id := event_id))) - 1 AS player_n
       |  FROM msgs WHERE user_id <> 0 GROUP BY instance_id, user_id),
       |win AS (
       |  SELECT *, count(*) OVER (PARTITION BY instance_id) - _rn + 1 AS seq FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY instance_id
       |        ORDER BY ts_us DESC, event_id DESC) AS _rn
       |    FROM msgs
       |    WHERE struct_pack(ts_us := ts_us, event_id := event_id) < last_cmd)
       |  WHERE _rn <= $HistLen)
       |SELECT w.instance_id AS scenario_id, CAST(w.seq AS INT) AS seq,
       |  CASE WHEN w.user_id = 0 THEN 'Avrae'
       |       ELSE 'Player ' || CAST(f.player_n AS VARCHAR) END AS author,
       |  regexp_replace(regexp_replace(regexp_replace(w.props,
       |    '\\bk\\b', '-', 'g'), '\\bgrue\\b', '----', 'g'), '\\bvile\\b', '----', 'g') AS content
       |FROM win w LEFT JOIN firsts f
       |  ON f.instance_id = w.instance_id AND f.user_id = w.user_id
       |ORDER BY scenario_id, seq""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q66_human_eval_prep", q66, Some(q66Sql)))
}

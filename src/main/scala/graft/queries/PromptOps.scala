package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._
import graft.functions.{PromptFunctions => P, TextFunctions}
import graft.operators.NearestEvent

/** §2 bonus — the FIREBALL prompt-format assembly end-to-end: the
  * reference's finetune_prep `utt_cmd` task (finetune_prep.py:52-63 →
  * prompts.py:55-103) run over the synthetic event stream, producing
  * one `(prompt, completion)` record per command with the full
  * Actors / Current / RP template and the `<|asep|>`/`<|aeot|>`
  * separators.
  *
  * The synthetic actor model: the reference pulls actor sheets from
  * the normalized combat state; the synthetic stream has no sheets, so
  * every actor attribute is a DETERMINISTIC function of `user_id`
  * (salted-md5 buckets — the same portable primitive as the
  * train/test split), which makes the assembled prompt strings
  * byte-reproducible in the DuckDB oracle. Attribute sparsity is
  * deliberate: each bucket has an empty outcome so the template's
  * part-dropping paths (no race, no effects, …) are exercised on real
  * rows, not just in the golden spec.
  *
  * Scale shape: the RP aggregation groups by (instance_id, cmd_id) so
  * the nearest-assoc window's hash partitioning is reused (no second
  * exchange on the big side); the Actors block is built per
  * (instance, user) then instance — two linear shuffles over slim
  * rows; the final joins attach one row per instance (actors block)
  * and one row per user (current-actor block), both tiny relative to
  * the command stream and broadcast by AQE.
  */
object PromptOps extends QueryModule {

  // Deterministic synthetic actor attributes (functions of user_id).
  private def name(u: Column) = concat(lit("u"), u.cast("string"))
  private def race(u: Column) = {
    val b = TextFunctions.hashBucket(u, "race", 4)
    when(b === 1, "Dwarf").when(b === 2, "Elf").when(b === 3, "Human").otherwise("")
  }
  private def clazz(u: Column) = {
    val b = TextFunctions.hashBucket(u, "class", 4)
    when(b === 1, "Wizard").when(b === 2, "Rogue").when(b === 3, "Fighter").otherwise("")
  }
  private def hpStr(u: Column) = TextFunctions.hpState(u % 41, lit(40))
  private def effects(u: Column) = {
    val b = TextFunctions.hashBucket(u, "eff", 5)
    when(b === 1, "Prone").when(b === 2, "Stunned").otherwise("")
  }
  private def attacks(u: Column) = {
    val b = TextFunctions.hashBucket(u, "atk", 3)
    when(b === 0, "").otherwise(concat(lit("Longsword +"), b.cast("string")))
  }
  private def spells(u: Column) = {
    val b = TextFunctions.hashBucket(u, "spell", 3)
    when(b === 1, "Fire Bolt").when(b === 2, "Cure Wounds").otherwise("")
  }
  private def actions(u: Column) = {
    val b = TextFunctions.hashBucket(u, "act", 3)
    when(b === 1, "Dash").when(b === 2, "Dodge").otherwise("")
  }

  private def description(u: Column) = {
    val b = TextFunctions.hashBucket(u, "desc", 3)
    when(b === 1, "A mysterious adventurer.")
      .when(b === 2, "A battle-scarred veteran.").otherwise("")
  }

  private def shortOf(u: Column): Column =
    P.actorShort(name(u), race(u), clazz(u), hpStr(u), effects(u))
  private def longOf(u: Column): Column =
    P.actorLong(name(u), clazz(u), race(u), attacks(u), spells(u),
      actions(u), effects(u))

  /** Per-instance `Actors:` block — the combat-state roster analog,
    * shared by q59's utt_cmd and q62's sta_nar (the reference renders
    * state_before/state_after with the same stringify; the synthetic
    * state is time-invariant per instance). The roster is the
    * instance's 8 MOST ACTIVE users (by event count, ties by
    * user_id): a real combat state holds the ~5-10 combatants, not
    * everyone who ever appeared — an all-users roster made each
    * prompt carry a ~730-line block at sf1 (~30 KB duplicated onto
    * every command: gigabytes of output strings on both engines). */
  private def actorsBlockOf(ev: DataFrame): DataFrame = {
    val byActivity = Window.partitionBy(col("instance_id"))
      .orderBy(col("_n").desc, col("user_id").asc)
    ev
      .groupBy(col("instance_id"), col("user_id")).agg(count(lit(1)).as("_n"))
      .withColumn("_rk", row_number().over(byActivity))
      .filter(col("_rk") <= 8)
      .withColumn("line", concat(lit("- "), shortOf(col("user_id"))))
      .groupBy(col("instance_id"))
      // ordered listagg emits the joined block body directly — no
      // struct array built, sorted, or transformed post-agg
      .agg(P.actorsBlockOfJoined(
        expr("listagg(line, '\n') WITHIN GROUP (ORDER BY user_id)")).as("actors_block"))
  }

  /** One-pipeline base shared by q59/q62 (the round-10 fusion): the
    * msg∪cmd stream with the nearest-command assignment (inlined
    * NearestEvent marks) and — when `needHist` — the last-5-message
    * history, ALL from a single scan + single hash exchange on
    * instance_id.
    *
    * The history trick: `lag(msg_utt, k, ignoreNulls)` over the mixed
    * stream skips command rows (their msg_utt is NULL), so a command
    * row's lag-k IS its k-th most recent preceding message — the
    * per-command history needs no message-sequence window, no
    * offset-explode, and no join at all. All ascending-order window
    * functions (prev-cmd marks + the 5 lags) share ONE Window
    * operator/sort; the next-cmd marks add the one descending sort.
    * Grouping then keys on (instance_id, grp_cmd) — command rows
    * assign to themselves — which the window's HashPartitioning
    * already satisfies: the whole query runs on one exchange before
    * the slim-row repartition boundary.
    */
  private def fusedCmdGroups(ev: DataFrame, needHist: Boolean): DataFrame = {
    val utt = concat(lit("u"), col("user_id").cast("string"),
      lit("#"), col("event_id").cast("string"))
    val asc = Window.partitionBy(col("instance_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val ascGrow = asc.rowsBetween(Window.unboundedPreceding, -1)
    // ONE ascending sort serves everything (round 19, guide §2.4 —
    // same rewrite as NearestEvent.withPrevNext): the next-cmd marks
    // are `lead(…, 1, ignoreNulls = true)` — the first command
    // STRICTLY AFTER the current row, exactly what the former
    // desc-sorted growing frame computed — so the prev marks, next
    // marks, and the 5 history lags all share one Window operator
    // over one sort (frames differ per function; WindowExec evaluates
    // multiple frames per operator). The former shape paid a second
    // full sort of the event stream for the desc pass. Byte
    // discipline is unchanged: `utt` is never materialized as a
    // column — the lags and the downstream aggregate build it on the
    // fly from the two long columns, and the sort runs BEFORE any
    // window function evaluates, so it moves only fixed-width rows.
    val histCols =
      if (needHist) (1 to 5).map(k =>
        lag(when(isMsg, utt), k, null, ignoreNulls = true).over(asc).as(s"_h$k"))
      else Seq.empty
    val marked = ev.filter(isMsg || isCmd)
      .select(Seq(
        col("*"),
        lead(when(isCmd, col("ts_us")), 1, null, ignoreNulls = true)
          .over(asc).as("next_ts"),
        lead(when(isCmd, col("event_id")), 1, null, ignoreNulls = true)
          .over(asc).as("next_id"),
        last(when(isCmd, col("ts_us")), ignoreNulls = true).over(ascGrow).as("prev_ts"),
        last(when(isCmd, col("event_id")), ignoreNulls = true).over(ascGrow).as("prev_id")
      ) ++ histCols: _*)
    val before = col("next_ts").isNull ||
      (col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us"))
    marked
      .withColumn("grp_cmd",
        when(isCmd, col("event_id"))
          .otherwise(when(before, col("prev_id")).otherwise(col("next_id"))))
      .withColumn("rp_ok", isMsg && col("value") >= 5 && before)
      .withColumn("aft_ok", isMsg && col("value") >= 5 && !before)
  }

  // q59: per-command prompt/completion in the reference's utt_cmd
  // format. Commands with no (>=5-word, distill1-filtered) before-RP
  // are dropped, mirroring prompts.py:60-62's `if not before: return`.
  //
  // Round-10 fused shape: ONE aggregation over the fused stream gives
  // each command its before-RP (conditional ordered listagg over the
  // msg rows of its group) and its own attributes (conditional max
  // over the single cmd row) — the former rp⋈cmds join, its second
  // events scan, and its shuffle are gone.
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))
    val grouped = fusedCmdGroups(ev, needHist = false)
      .groupBy(col("instance_id"), col("grp_cmd").as("cmd_id"))
      .agg(
        expr("listagg(CASE WHEN rp_ok THEN concat('u', CAST(user_id AS STRING), '#', CAST(event_id AS STRING)) END, '\n') WITHIN GROUP (ORDER BY ts_us, event_id)").as("rp"),
        max(when(isCmd, col("user_id"))).as("cmd_user"))
      .filter(col("rp").isNotNull && col("cmd_user").isNotNull)

    // Assembly order is shuffle-aware: the hash boundary moves only
    // the SLIM rows (ids + the per-command rp string); the heavy
    // per-instance actors_block — duplicated onto every command —
    // and the final prompt concat are applied AFTER the boundary via
    // a broadcast join, so the protocol sort's range sampling
    // re-executes only the cheap read-shuffle-files→concat tail, not
    // the window pipeline (the q37 lesson). The sort must come
    // last: EliminateSorts drops any Sort beneath a Join.
    // Broadcast scale: one ~400 B roster block per instance (the
    // roster is activity-bounded above), a few MB for the reference
    // corpus; a corpus with 10^7+ instances drops the hint and
    // assembles before the boundary instead.
    // The prompt concat goes ABOVE the protocol sort (Project after
    // Sort — Catalyst keeps expression Projects above Sorts): the
    // range exchange then samples and moves only the RAW parts
    // (rp + actors_block), not the assembled prompt that duplicates
    // them plus template text, and the concat itself runs once in the
    // final pass instead of twice (range sampling + final).
    grouped
      .repartition(col("cmd_id"))
      .join(broadcast(actorsBlockOf(ev)), Seq("instance_id"))
      .orderBy(col("cmd_id"))
      .select(
        col("cmd_id"),
        P.uttCmdPrompt(col("actors_block"), longOf(col("cmd_user")), col("rp"))
          .as("prompt"),
        P.uttCmdCompletion(array(concat(lit("!p"), col("cmd_id").cast("string"))))
          .as("completion"))
  }

  // q62: the sta_nar task (finetune_prep.py:91-100 →
  // prompts.py:107-169,188-198) — per command: History (the 5 most
  // recent prior messages, distill4_normalize.py:397-398's
  // utterance_history[-5:] analog), Actors (state-after block),
  // Targets (the actors the automation run touched — stood in by the
  // distinct authors of the command's after-utterances, which keeps
  // the list bounded per command; an all-instance-users stand-in
  // measured 150 s at sf1: cmds × users is a dense per-instance cross
  // product and does not survive scale), the caster description+long
  // block, the stringified automation line; completion = the
  // after-utterances (rows with none are dropped, prompts.py:191-193).
  //
  // Scale shape for "last 5 messages before each command" (round-10
  // fusion): `lag(msg_utt, k, ignoreNulls)` over the mixed msg∪cmd
  // stream — command rows' msg_utt is NULL, so lag-k on a command row
  // is its k-th most recent preceding message. The history costs five
  // lag columns in the window stack the nearest-assoc marks already
  // need (one shared sort, zero joins) — replacing the former
  // message-seq window + offset-explode + equi-join + groupBy.
  // After-RP, Targets, and the command's own attributes then come out
  // of ONE (instance, cmd) aggregation over the same stream: the whole
  // query is one scan + one exchange up to the slim-row boundary.
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))

    // after_rp via ordered listagg; the Targets list keeps the struct
    // path — it is DISTINCT-by-user then ordered by NUMERIC user_id,
    // which listagg(DISTINCT) can't express (it only orders by the
    // aggregated string itself, and "u10" < "u2" lexically), and it
    // is roster-bounded small anyway. History concatenates oldest
    // first: lag-5 down to lag-1; concat_ws skips the NULL lags of
    // commands with <5 prior messages (no messages → "" → the empty
    // History block, same as the former left-join's NULL).
    val grouped = fusedCmdGroups(ev, needHist = true)
      .groupBy(col("instance_id"), col("grp_cmd").as("cmd_id"))
      .agg(
        expr("listagg(CASE WHEN aft_ok THEN concat('u', CAST(user_id AS STRING), '#', CAST(event_id AS STRING)) END, '\n') WITHIN GROUP (ORDER BY ts_us, event_id)").as("after_rp"),
        transform(
          array_sort(array_distinct(collect_list(
            when(col("aft_ok"),
              struct(col("user_id"), shortOf(col("user_id")).as("short")))))),
          x => x.getField("short")).as("tgt_arr"),
        max(when(isCmd, col("user_id"))).as("cmd_user"),
        max(when(isCmd, col("value"))).as("value"),
        max(when(isCmd,
          concat_ws("\n", col("_h5"), col("_h4"), col("_h3"), col("_h2"), col("_h1"))))
          .as("hist"))
      .filter(col("after_rp").isNotNull && col("cmd_user").isNotNull)

    val automation = concat(lit("u"), col("cmd_user").cast("string"),
      lit(" casts #"), col("cmd_id").cast("string"),
      lit(" for "), graft.functions.Exact.u2(col("value")).cast("string"), lit(" cp."))

    // Same shuffle discipline as q59: the hash boundary moves only
    // slim rows (ids + short utt strings); the per-instance
    // actors_block and the prompt concat land after the boundary via
    // a broadcast join, and the protocol sort (last — EliminateSorts
    // drops a Sort beneath a Join) samples only the cheap
    // post-shuffle tail.
    // Prompt concat above the protocol sort, as in q59: the range
    // exchange samples/moves raw parts, and the concat runs once.
    grouped
      .repartition(col("cmd_id"))
      .join(broadcast(actorsBlockOf(ev)), Seq("instance_id"))
      .orderBy(col("cmd_id"))
      .select(
        col("cmd_id"),
        P.staNarPrompt(
          P.historyBlockOfJoined(col("hist")),
          col("actors_block"),
          P.targetsBlock(col("tgt_arr")),
          P.actorDescription(description(col("cmd_user"))),
          longOf(col("cmd_user")),
          automation).as("prompt"),
        P.staNarCompletionOfJoined(col("after_rp")).as("completion"))
  }

  // The oracle rebuilds the identical strings in DuckDB. NB chr(10)
  // everywhere a Scala literal has \n; bucket arithmetic matches
  // TextFunctions.hashBucket; the HP bucket boundaries are integer-
  // exact at max_hp=40 (hp>20 == ratio>0.5 etc, no float compares).
  private def bucketSql(salt: String, mod: Int): String =
    s"CAST(('0x' || substr(md5('$salt' || CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % $mod"

  private val attrSql =
    s"""'u' || CAST(user_id AS VARCHAR) AS name,
       |    CASE ${bucketSql("race", 4)} WHEN 1 THEN 'Dwarf' WHEN 2 THEN 'Elf' WHEN 3 THEN 'Human' ELSE '' END AS race,
       |    CASE ${bucketSql("class", 4)} WHEN 1 THEN 'Wizard' WHEN 2 THEN 'Rogue' WHEN 3 THEN 'Fighter' ELSE '' END AS clazz,
       |    user_id % 41 AS hp,
       |    CASE ${bucketSql("eff", 5)} WHEN 1 THEN 'Prone' WHEN 2 THEN 'Stunned' ELSE '' END AS effects,
       |    CASE WHEN ${bucketSql("atk", 3)} = 0 THEN '' ELSE 'Longsword +' || CAST(${bucketSql("atk", 3)} AS VARCHAR) END AS attacks,
       |    CASE ${bucketSql("spell", 3)} WHEN 1 THEN 'Fire Bolt' WHEN 2 THEN 'Cure Wounds' ELSE '' END AS spells,
       |    CASE ${bucketSql("act", 3)} WHEN 1 THEN 'Dash' WHEN 2 THEN 'Dodge' ELSE '' END AS actions""".stripMargin

  /** The actor-model CTEs (attr → short lines → Actors block → long
    * blocks), shared verbatim by the q59 and q62 oracles. */
  private val actorCtesSql =
    s"""attr AS (
       |  SELECT instance_id, user_id, $attrSql
       |  FROM (SELECT DISTINCT instance_id, user_id FROM ev)),
       |short AS (
       |  SELECT instance_id, user_id,
       |    name
       |    || CASE WHEN concat_ws('; ', nullif(race,''), nullif(clazz,'')) <> ''
       |         THEN ' (' || concat_ws('; ', nullif(race,''), nullif(clazz,'')) || ')' ELSE '' END
       |    || ' ' || '<' || CAST(hp AS VARCHAR) || '/40 HP; '
       |    || CASE WHEN hp >= 40 THEN 'Healthy' WHEN hp > 20 THEN 'Injured'
       |            WHEN hp > 6 THEN 'Bloodied' WHEN hp > 0 THEN 'Critical' ELSE 'Dead' END || '>'
       |    || CASE WHEN effects <> '' THEN ' [' || effects || ']' ELSE '' END AS short_line
       |  FROM attr),
       |roster AS (
       |  SELECT instance_id, user_id FROM (
       |    SELECT instance_id, user_id,
       |      ROW_NUMBER() OVER (PARTITION BY instance_id ORDER BY COUNT(*) DESC, user_id ASC) AS rk
       |    FROM ev GROUP BY instance_id, user_id)
       |  WHERE rk <= 8),
       |ablock AS (
       |  SELECT instance_id,
       |    'Actors:' || chr(10) || string_agg('- ' || short_line, chr(10) ORDER BY user_id) AS actors_block
       |  FROM short JOIN roster USING (instance_id, user_id) GROUP BY instance_id),
       |longb AS (
       |  SELECT DISTINCT user_id,
       |    'Name: ' || name
       |    || CASE WHEN clazz <> '' THEN chr(10) || 'Class: ' || clazz ELSE '' END
       |    || CASE WHEN race <> '' THEN chr(10) || 'Race: ' || race ELSE '' END
       |    || CASE WHEN attacks <> '' THEN chr(10) || 'Attacks: ' || attacks ELSE '' END
       |    || CASE WHEN spells <> '' THEN chr(10) || 'Spells: ' || spells ELSE '' END
       |    || CASE WHEN actions <> '' THEN chr(10) || 'Actions: ' || actions ELSE '' END
       |    || CASE WHEN effects <> '' THEN chr(10) || 'Effects: ' || effects ELSE '' END AS long_block
       |  FROM attr)""".stripMargin

  private val q59Sql =
    s"""WITH $NormSql, $NearestAssocSql,
       |rp AS (
       |  SELECT cmd_id,
       |    string_agg('u' || CAST(user_id AS VARCHAR) || '#' || CAST(msg_id AS VARCHAR), chr(10) ORDER BY ts_us, msg_id) AS rp
       |  FROM assoc WHERE side = 'before' AND value >= 5 GROUP BY cmd_id),
       |__ACTOR_CTES__,
       |cmds AS (
       |  SELECT instance_id, event_id AS cmd_id, user_id FROM ev WHERE event_type = 'purchase')
       |SELECT c.cmd_id,
       |  a.actors_block || chr(10) || chr(10)
       |    || 'Current:' || chr(10) || lb.long_block || chr(10) || chr(10)
       |    || r.rp || chr(10) || '<|asep|>' || chr(10) AS prompt,
       |  '!p' || CAST(c.cmd_id AS VARCHAR) || chr(10) || '<|aeot|>' AS completion
       |FROM rp r
       |JOIN cmds c USING (cmd_id)
       |JOIN ablock a ON a.instance_id = c.instance_id
       |JOIN longb lb ON lb.user_id = c.user_id
       |ORDER BY c.cmd_id""".stripMargin
      // spliced AFTER stripMargin: actorCtesSql's own lines start with
      // the SQL || operator, which a second stripMargin would truncate
      .replace("__ACTOR_CTES__", actorCtesSql)

  private val q62Sql =
    s"""WITH $NormSql, $NearestAssocSql,
       |aft AS (
       |  SELECT cmd_id,
       |    string_agg('u' || CAST(user_id AS VARCHAR) || '#' || CAST(msg_id AS VARCHAR), chr(10) ORDER BY ts_us, msg_id) AS after_rp
       |  FROM assoc WHERE side = 'after' AND value >= 5 GROUP BY cmd_id),
       |__ACTOR_CTES__,
       |cmds AS (
       |  SELECT instance_id, event_id AS cmd_id, user_id AS cmd_user, value, prev_seq FROM (
       |    SELECT *, COALESCE(SUM(CASE WHEN event_type IN ('click','view') THEN 1 END)
       |      OVER (PARTITION BY instance_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_seq
       |    FROM ev) WHERE event_type = 'purchase'),
       |msgs AS (
       |  SELECT instance_id,
       |    'u' || CAST(user_id AS VARCHAR) || '#' || CAST(event_id AS VARCHAR) AS utt,
       |    ROW_NUMBER() OVER (PARTITION BY instance_id ORDER BY ts_us, event_id) AS seq
       |  FROM ev WHERE event_type IN ('click','view')),
       |hist AS (
       |  SELECT c.cmd_id, string_agg(m.utt, chr(10) ORDER BY m.seq) AS hist
       |  FROM cmds c JOIN msgs m ON m.instance_id = c.instance_id
       |    AND m.seq BETWEEN c.prev_seq - 4 AND c.prev_seq
       |  GROUP BY c.cmd_id),
       |tgt AS (
       |  SELECT t.cmd_id, string_agg('- ' || s.short_line, chr(10) ORDER BY t.user_id) AS tgt
       |  FROM (SELECT DISTINCT cmd_id, user_id
       |        FROM assoc WHERE side = 'after' AND value >= 5) t
       |  JOIN (SELECT DISTINCT user_id, short_line FROM short) s ON s.user_id = t.user_id
       |  GROUP BY t.cmd_id),
       |descb AS (
       |  SELECT DISTINCT user_id,
       |    CASE ${bucketSql("desc", 3)} WHEN 1 THEN 'A mysterious adventurer.'
       |      WHEN 2 THEN 'A battle-scarred veteran.' ELSE '' END AS descr
       |  FROM attr)
       |SELECT c.cmd_id,
       |  concat_ws(chr(10) || chr(10),
       |    CASE WHEN h.hist IS NOT NULL THEN 'History:' || chr(10) || h.hist || chr(10) || '---' END,
       |    a.actors_block,
       |    CASE WHEN t.tgt IS NOT NULL THEN 'Targets:' || chr(10) || t.tgt END,
       |    (CASE WHEN d.descr <> '' THEN 'Description: ' || d.descr || chr(10) || '---' || chr(10) ELSE '' END) || lb.long_block,
       |    'u' || CAST(c.cmd_user AS VARCHAR) || ' casts #' || CAST(c.cmd_id AS VARCHAR)
       |      || ' for ' || CAST(CAST(floor(c.value * 100 + 0.5) AS BIGINT) AS VARCHAR) || ' cp.'
       |  ) || chr(10) || '<|asep|>' || chr(10) AS prompt,
       |  f.after_rp || chr(10) || '<|aeot|>' AS completion
       |FROM cmds c
       |JOIN aft f ON f.cmd_id = c.cmd_id
       |LEFT JOIN hist h ON h.cmd_id = c.cmd_id
       |LEFT JOIN tgt t ON t.cmd_id = c.cmd_id
       |JOIN ablock a ON a.instance_id = c.instance_id
       |JOIN longb lb ON lb.user_id = c.cmd_user
       |JOIN descb d ON d.user_id = c.cmd_user
       |ORDER BY c.cmd_id""".stripMargin
      .replace("__ACTOR_CTES__", actorCtesSql)

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q59_prompt_assembly", q59, Some(q59Sql)),
    QueryDef("q62_sta_nar_assembly", q62, Some(q62Sql)))
}

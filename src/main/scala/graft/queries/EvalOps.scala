package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._
import graft.functions.Exact.u2

/** Evaluation/reporting harness analogs — the reference's post-model
  * bookkeeping re-expressed as aggregations:
  *
  *  - q60: `evaluate_sta_nar.py:20-45` computes 3 metrics × 4
  *    prediction variants per test row, then per-(metric, prediction)
  *    averages into `...-eval-averages.jsonl`. The HF metric models
  *    (gpt2 perplexity, BLEURT, BERTScore) are external model
  *    downloads — out of scope exactly like the OpenAI calls — so the
  *    metric is a deterministic stub with the same (predictions,
  *    references) → score shape; the JOIN/UNPIVOT/AVG harness around
  *    it is the ported surface.
  *  - q61: `scripts/count_num_chars_in_dataset.py:17-28,100-105` —
  *    corpus totals (chars, events, messages, commands, authors) ×
  *    the inlined model-cost table → estimated inference cost per
  *    model at chars/4 tokens.
  *
  * Exactness: per-row stub scores are INTEGER-valued (scaled by 1e5,
  * floor division) so the per-group average is an exact-int sum
  * divided once — float summation order can never drift between
  * engines. Scale: q60 is explode(×12)+one hash agg on a 12-key
  * space (map-side partials collapse almost everything); q61 is one
  * global aggregate × an 8-row literal explode.
  */
object EvalOps extends QueryModule {

  private val Variants = Seq(
    "full" -> "lp_full", "nostate" -> "lp_nostate",
    "command_utterance" -> "lp_cu", "dialog_continuation" -> "lp_dc")
  private val Metrics = Seq("perplexity" -> 1, "bleurt" -> 2, "bertscore" -> 3)

  // q60: per-(metric, prediction) averages over the prediction table.
  // Prediction variants are deterministic transforms of the gold text
  // (the reference's 4 model outputs are external); stub score for
  // metric weight w: floor(1e5·w·len(pred) / (w·len(pred)+len(gold)+1))
  // — a similarity-ish ratio with the real metrics' signature.
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(
      length(col("text")).as("lg"),
      length(col("text")).as("lp_full"),
      length(regexp_replace(col("text"), "\\(.*?\\)", "")).as("lp_nostate"),
      length(substring(col("text"), 1, 100)).as("lp_cu"),
      length(concat(col("text"), lit(" ...continued"))).as("lp_dc"))
    val variants = explode(array(Variants.map { case (name, c) =>
      struct(lit(name).as("prediction"), col(c).as("lp"))
    }: _*)).as("v")
    val metrics = explode(array(Metrics.map { case (name, w) =>
      struct(lit(name).as("metric"), lit(w).as("w"))
    }: _*)).as("m")
    base
      .select(col("lg"), variants).select(col("lg"), col("v.*"), metrics)
      .select(col("m.metric").as("metric"), col("prediction"),
        expr("(100000L * m.w * lp) DIV (m.w * lp + lg + 1)").as("s"))
      .groupBy(col("metric"), col("prediction"))
      .agg((sum(col("s")).cast("double") /
        (lit(100000.0) * count(lit(1)).cast("double"))).as("average"))
      .orderBy(col("metric"), col("prediction"))
  }

  private val q60Sql =
    """WITH base AS (
      |  SELECT length(text) AS lg,
      |    length(text) AS lp_full,
      |    length(regexp_replace(text, '\(.*?\)', '', 'g')) AS lp_nostate,
      |    length(substr(text, 1, 100)) AS lp_cu,
      |    length(text || ' ...continued') AS lp_dc
      |  FROM documents),
      |v AS (
      |  SELECT lg, 'full' AS prediction, lp_full AS lp FROM base
      |  UNION ALL SELECT lg, 'nostate', lp_nostate FROM base
      |  UNION ALL SELECT lg, 'command_utterance', lp_cu FROM base
      |  UNION ALL SELECT lg, 'dialog_continuation', lp_dc FROM base),
      |m(metric, w) AS (VALUES ('perplexity', 1), ('bleurt', 2), ('bertscore', 3))
      |SELECT m.metric, v.prediction,
      |  CAST(SUM((100000 * m.w * v.lp) // (m.w * v.lp + v.lg + 1)) AS DOUBLE)
      |    / (CAST(100000 AS DOUBLE) * COUNT(*)) AS average
      |FROM v CROSS JOIN m
      |GROUP BY m.metric, v.prediction
      |ORDER BY m.metric, v.prediction""".stripMargin

  /** The reference's GPT-3 price table
    * (count_num_chars_in_dataset.py:19-28), verbatim. */
  private val ModelCosts = Seq(
    "Davinci" -> 0.02, "Curie" -> 0.002, "Babbage" -> 0.0005, "Ada" -> 0.0004,
    "FT Davinci" -> 0.12, "FT Curie" -> 0.012, "FT Babbage" -> 0.0024,
    "FT Ada" -> 0.0016)

  // q61: corpus totals × model-cost table. chars analog = the message
  // events' `value` (the synthetic message-length column); tokens =
  // chars/4 (count_num_chars_in_dataset.py:100); cost =
  // tokens/1000·cost_per_1k (:103-105).
  private def q61(s: SparkSession, dir: String): DataFrame = {
    val models = array(ModelCosts.map { case (n, c) =>
      struct(lit(n).as("model"), lit(c).as("cost_per_1k"))
    }: _*)
    norm(Tables.events(s, dir))
      .agg(
        sum(when(isMsg, u2(col("value")))).cast("double")./(lit(100.0)).as("n_chars"),
        count(lit(1)).as("n_events"),
        count(when(isMsg, lit(1))).as("n_messages"),
        count(when(isCmd, lit(1))).as("n_commands"),
        countDistinct(when(isMsg, col("user_id"))).as("n_authors"))
      .select(col("*"), explode(models).as("m"))
      .select(
        col("m.model").as("model"), col("m.cost_per_1k").as("cost_per_1k"),
        col("n_chars"), col("n_events"), col("n_messages"), col("n_commands"),
        col("n_authors"),
        (col("n_chars") / lit(4.0)).as("n_tokens"),
        (col("n_chars") / lit(4.0) / lit(1000.0) * col("m.cost_per_1k")).as("est_cost"))
      .orderBy(col("model"))
  }

  private val q61Sql =
    s"""WITH $NormSql,
       |tot AS (SELECT
       |  CAST(SUM(CASE WHEN event_type IN ('click','view') THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS n_chars,
       |  COUNT(*) AS n_events,
       |  COUNT(*) FILTER (WHERE event_type IN ('click','view')) AS n_messages,
       |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_commands,
       |  COUNT(DISTINCT CASE WHEN event_type IN ('click','view') THEN user_id END) AS n_authors
       |FROM ev),
       |m(model, cost_per_1k) AS (VALUES
       |  ('Davinci', CAST(0.02 AS DOUBLE)), ('Curie', CAST(0.002 AS DOUBLE)),
       |  ('Babbage', CAST(0.0005 AS DOUBLE)), ('Ada', CAST(0.0004 AS DOUBLE)),
       |  ('FT Davinci', CAST(0.12 AS DOUBLE)), ('FT Curie', CAST(0.012 AS DOUBLE)),
       |  ('FT Babbage', CAST(0.0024 AS DOUBLE)), ('FT Ada', CAST(0.0016 AS DOUBLE)))
       |SELECT m.model, m.cost_per_1k,
       |  tot.n_chars, tot.n_events, tot.n_messages, tot.n_commands, tot.n_authors,
       |  tot.n_chars / CAST(4 AS DOUBLE) AS n_tokens,
       |  tot.n_chars / CAST(4 AS DOUBLE) / CAST(1000 AS DOUBLE) * m.cost_per_1k AS est_cost
       |FROM tot CROSS JOIN m
       |ORDER BY m.model""".stripMargin

  // ---------------------------------------------------------------
  // q63: `results/merge_results.py:62-112` — merge the prediction
  // variants back onto the canonical test rows, keep only rows with
  // ALL variants present (the reference prints "missing some
  // predictions, skipping"), and attach the gold completion
  // (prompts.utt_cmd_completion with include_sep=False). The
  // reference finds each canonical row by scanning for a 7-key exact
  // match (its JSONL rows carry no id — O(n·m) per file); the
  // Spark-first re-expression keys everything on cmd_id and merges
  // with four slim inner equi-joins.
  //
  // The prediction tables are deterministic stand-ins (the real ones
  // are model-output files): each variant covers a salted-hash subset
  // of commands — so the all-variants-present filter actually drops
  // rows — and is "correct" (== gold) on a further subset, which
  // keeps the merged output useful to a downstream q60-style eval.

  private val PredVariants = Seq(
    // (column name, salt, 1-in-K miss rate) — miss rates differ so the
    // intersection is a proper subset of every variant.
    ("prediction_full", "pfull", 23),
    ("prediction_nostate", "pnostate", 19),
    ("prediction_fewshot_full", "pfsfull", 17),
    ("prediction_fewshot_nostate", "pfsnostate", 13))

  // Spark shape: the four variant tables are deterministic functions
  // of cmd_id (salted-hash stand-ins for the model-output FILES), so
  // the four-way merge collapses to one scan — per-variant coverage
  // becomes a conjunctive filter and the prediction columns a single
  // projection; zero joins (the q57 lesson: don't join a table whose
  // key universe and values are derivable from the probe side). The
  // oracle keeps the reference's four-CTE join shape as the spec.
  // With REAL prediction files the fold-of-equi-joins returns — four
  // slim tables the planner broadcasts while small, shuffles when
  // corpus-scale: that path is the callable [[mergePredictions]]
  // operator below (MergePredictionsSpec drives it on variant tables
  // that are NOT cmd_id-derivable).
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val gold = concat(lit("!p"), col("cmd_id").cast("string"))
    val covered = PredVariants
      .map { case (_, salt, k) =>
        graft.functions.TextFunctions.hashBucket(col("cmd_id"), salt, k) =!= 0
      }
      .reduce(_ && _)
    val withVariants = PredVariants.foldLeft(
      norm(Tables.events(s, dir)).filter(isCmd)
        .select(col("event_id").as("cmd_id"))
        .filter(covered)
        .withColumn("gold", gold)) {
      case (acc, (name, salt, _)) =>
        acc.withColumn(name,
          when(graft.functions.TextFunctions.hashBucket(col("cmd_id"), salt + "ok", 3) =!= 0,
            gold).otherwise(concat(lit("!wrong "), gold)))
    }
    // Presentation sort WITHIN partitions only (round 14, the
    // q87/q97 lesson): this is a MAP-ONLY plan — no exchange below
    // the sort — so a global orderBy's range sampler re-executes the
    // whole scan+norm+filter child as a separate job (the norm regex
    // pass is the query's cost; the sf10 pair measured q63 scaling
    // 10.3x on 10x data, the double-execution made visible as sf1's
    // action floor amortized). The driver compare re-sorts both
    // engines' rows, so global order was never load-bearing.
    withVariants.sortWithinPartitions(col("cmd_id"))
  }

  /** The REAL-file prediction merge (reference:
    * results/merge_results.py:62-112): each variant is an arbitrary
    * prediction table — model-output files whose values are NOT
    * derivable from the canonical side — and the merge is the fold of
    * slim inner equi-joins on the key the q63 comment promises. Inner
    * joins implement the reference's drop-if-any-missing ("missing
    * some predictions, skipping"); the canonical row set and its gold
    * column pass through untouched.
    *
    * Each variant `(name, df)` must expose `keyCol` and a prediction
    * column named `name` (extra columns are dropped — the joins stay
    * slim by construction); keys are assumed unique per variant table,
    * like one prediction per test row in the reference's files.
    *
    * Scale: four key+string tables against a corpus-scale canonical —
    * the planner broadcasts a variant while its stats are under the
    * threshold and falls back to a shuffled hash/merge join when a
    * variant is corpus-scale itself (MergePredictionsSpec gates both
    * shapes; no hint pinned because NEITHER side is provably bounded
    * here, unlike the roster broadcasts).
    */
  def mergePredictions(canonical: DataFrame,
                       variants: Seq[(String, DataFrame)],
                       keyCol: String = "cmd_id"): DataFrame =
    variants.foldLeft(canonical) { case (acc, (name, v)) =>
      acc.join(v.select(col(keyCol), col(name)), Seq(keyCol))
    }

  private val q63Sql = {
    val variantCtes = PredVariants.map { case (name, salt, k) =>
      s"""$name AS (
         |  SELECT cmd_id,
         |    CASE WHEN CAST(('0x' || substr(md5('${salt}ok' || CAST(cmd_id AS VARCHAR)), 1, 4)) AS BIGINT) % 3 <> 0
         |      THEN '!p' || CAST(cmd_id AS VARCHAR)
         |      ELSE '!wrong ' || '!p' || CAST(cmd_id AS VARCHAR) END AS $name
         |  FROM cmds
         |  WHERE CAST(('0x' || substr(md5('$salt' || CAST(cmd_id AS VARCHAR)), 1, 4)) AS BIGINT) % $k <> 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $NormSql,
       |cmds AS (SELECT event_id AS cmd_id FROM ev WHERE event_type = 'purchase'),
       |canonical AS (SELECT cmd_id, '!p' || CAST(cmd_id AS VARCHAR) AS gold FROM cmds),
       |$variantCtes
       |SELECT c.cmd_id, c.gold,
       |  f.prediction_full, n.prediction_nostate,
       |  ff.prediction_fewshot_full, fn.prediction_fewshot_nostate
       |FROM canonical c
       |JOIN prediction_full f USING (cmd_id)
       |JOIN prediction_nostate n USING (cmd_id)
       |JOIN prediction_fewshot_full ff USING (cmd_id)
       |JOIN prediction_fewshot_nostate fn USING (cmd_id)
       |ORDER BY c.cmd_id""".stripMargin
  }

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q60_eval_metrics", q60, Some(q60Sql)),
    QueryDef("q61_corpus_cost", q61, Some(q61Sql)),
    QueryDef("q63_merge_predictions", q63, Some(q63Sql)))
}

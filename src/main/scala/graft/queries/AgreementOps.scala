package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.EventFunctions._

/** Annotator-agreement analytics — the reference's human-eval results
  * analysis (reference: human_eval/results_analysis.py:107-166)
  * re-expressed as aggregations:
  *
  *  - per rater PAIR with overlapping scenarios, Cohen's kappa over
  *    the paired binary (sense, specific) ratings and Kendall's tau-b
  *    over the paired ordinal `interesting` ratings
  *    (results_analysis.py:112-152: `itertools.combinations(users, 2)`,
  *    overlap intersection, `cohen_kappa_score`, `kendalltau`);
  *  - the overall averages the script prints
  *    (results_analysis.py:148-155).
  *
  * Rating model: the reference reads a Qualtrics CSV (external file,
  * like the model-output files elsewhere); the stand-in derives a
  * deterministic panel from the event stream — raters are the 10
  * first state-event users (the "DM" set analog), each rating a
  * salted-hash-selected CAP of 20 scenarios (the reference's each-
  * rater-sees-3-or-7-pages design) × 5 models, with salted-md5 rating
  * values — the same portable primitive as the train/test split, so
  * every statistic is reproducible exactly in the DuckDB oracle.
  *
  * Exactness: each pair's kappa and tau are computed from exact int64
  * counts with ONE double division (+ one IEEE sqrt for tau) and
  * floored at 1e5 scale — identical bit patterns on both engines; the
  * q65 averages divide exact int64 sums once (float summation order
  * can never drift). Sequence-equal pairs short-circuit kappa to 1
  * exactly like the reference's sklearn guard
  * (results_analysis.py:138-141); zero-variance tau pairs are NULL
  * and excluded from the average exactly like its NaN guard (:143-147).
  *
  * Scale shape: the panel is bounded by construction (raters ×
  * CAP × models — the human-eval contract, like the roster
  * broadcast), so the rater fan-out is a bounded broadcast cross and
  * the per-pair item-pair join for tau is a keyed equi-join whose
  * per-key quadratic is capped at C(CAP·models, 2); the dials a
  * larger panel would turn are CAP and the rater count. Everything
  * downstream of the bounded panel is hash-keyed aggregation.
  */
object AgreementOps extends QueryModule {

  private val NRaters = 10
  private val Cap = 20
  private val NModels = 5

  /** Same md5-prefix bucket primitive as TextFunctions.hashBucket but
    * over a composite string key. */
  private def bucket(key: Column, salt: String, mod: Int): Column =
    (conv(substring(md5(concat(lit(salt), key)), 1, 4), 16, 10)
      .cast("bigint") % mod).cast("bigint")

  /** The deterministic ratings panel:
    * (r, q, m, sense 0/1, specific 0/1, interesting 1..7). */
  private def ratings(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))
    val raters = ev.filter(isState)
      .select(col("user_id").as("r")).distinct()
      .orderBy(col("r")).limit(NRaters)
    val insts = ev.select(col("instance_id").as("q")).distinct()
    val seenKey = concat(col("r").cast("string"), lit("_"), col("q").cast("string"))
    val wSeen = Window.partitionBy(col("r"))
      .orderBy(md5(concat(lit("seen_"), seenKey)), col("q"))
    val seen = insts.crossJoin(broadcast(raters))
      .withColumn("_rn", row_number().over(wSeen))
      .filter(col("_rn") <= Cap)
    val rqm = concat(col("r").cast("string"), lit("_"),
      col("q").cast("string"), lit("_"), col("m").cast("string"))
    seen
      .select(col("r"), col("q"),
        explode(array((1 to NModels).map(lit(_)): _*)).as("m"))
      .select(col("r"), col("q"), col("m"),
        bucket(rqm, "sense_", 2).as("sense"),
        bucket(rqm, "spec_", 2).as("specific"),
        (lit(1) + bucket(rqm, "int_", 7)).as("interesting"))
  }

  // ----------------------------------------------------------------
  // q102: the Qualtrics EXPORT ingest (round 13; reference:
  // human_eval/qualtrics_rank_to_matrix.py + results_analysis.py:52-74
  // User.from_qualtrics_row). The export is an external file like the
  // ratings CSV, so a deterministic WIDE stand-in is built from the
  // same rater set: one row per rater, the survey-design constant
  // column grid (seen{q} page flags; Sense/Specific binary matrix
  // answers post-RecodeValues; Interesting 1-10 slider answers — the
  // QSF's CSSliderMax=10). The operator under test is the UNPIVOT
  // (operators/QualtricsIngest.rankToMatrix): wide → (rater, item,
  // rating) long matrix, q64's input shape.

  private val WScenarios = 1 to 8
  private val WModels = 1 to NModels

  /** The deterministic wide export stand-in: 1 row × 128 answer
    * columns per rater. */
  private def wideExport(s: SparkSession, dir: String): DataFrame = {
    val ev = norm(Tables.events(s, dir))
    val raters = ev.filter(isState)
      .select(col("user_id").as("r")).distinct()
      .orderBy(col("r")).limit(NRaters)
    def kq(q: Int) = concat(col("r").cast("string"), lit(s"_$q"))
    def k(q: Int, m: Int) = concat(col("r").cast("string"), lit(s"_${q}_$m"))
    val answerCols = WScenarios.flatMap { q =>
      bucket(kq(q), "wseen_", 2).as(s"seen$q") +:
        WModels.flatMap { m => Seq(
          bucket(k(q, m), "wsense_", 2).as(s"Sense${q}_$m"),
          bucket(k(q, m), "wspec_", 2).as(s"Specific${q}_$m"),
          (lit(1) + bucket(k(q, m), "wint_", 10)).as(s"Interesting${q}_$m"))
        }
    }
    raters.select(col("r") +: answerCols: _*)
  }

  private def q102(s: SparkSession, dir: String): DataFrame =
    graft.operators.QualtricsIngest.rankToMatrix(
      wideExport(s, dir), WScenarios, WModels)
      .sortWithinPartitions(col("r"), col("q"), col("m"))

  private val q102Sql =
    s"""WITH $NormSql,
       |raters AS (
       |  SELECT user_id AS r FROM ev WHERE event_type = 'signup'
       |  GROUP BY user_id ORDER BY user_id LIMIT $NRaters),
       |scen(q) AS (VALUES ${WScenarios.map(q => s"($q)").mkString(", ")}),
       |models(m) AS (VALUES ${WModels.map(m => s"($m)").mkString(", ")}),
       |cells AS (
       |  SELECT r, q, m,
       |    CAST(('0x' || substr(md5('wseen_' || CAST(r AS VARCHAR) || '_' || CAST(q AS VARCHAR)), 1, 4)) AS BIGINT) % 2 AS seen,
       |    CAST(('0x' || substr(md5('wsense_' || key), 1, 4)) AS BIGINT) % 2 AS sense,
       |    CAST(('0x' || substr(md5('wspec_' || key), 1, 4)) AS BIGINT) % 2 AS specific,
       |    1 + CAST(('0x' || substr(md5('wint_' || key), 1, 4)) AS BIGINT) % 10 AS interesting
       |  FROM (SELECT r, q, m,
       |          CAST(r AS VARCHAR) || '_' || CAST(q AS VARCHAR) || '_' || CAST(m AS VARCHAR) AS key
       |        FROM raters CROSS JOIN scen CROSS JOIN models))
       |SELECT r, CAST(q AS BIGINT) AS q, CAST(m AS BIGINT) AS m,
       |  sense, specific, interesting
       |FROM cells WHERE seen = 1 ORDER BY r, q, m""".stripMargin

  /** Paired items of overlapping rater pairs: one row per
    * (r1 < r2, scenario, model) both rated. */
  private def pairItems(rt: DataFrame): DataFrame = {
    val a = rt.select(col("r").as("r1"), col("q"), col("m"),
      col("sense").as("s1"), col("specific").as("p1"), col("interesting").as("i1"))
    val b = rt.select(col("r").as("r2"), col("q"), col("m"),
      col("sense").as("s2"), col("specific").as("p2"), col("interesting").as("i2"))
    a.join(b, Seq("q", "m")).filter(col("r1") < col("r2"))
  }

  /** Per-pair agreement: n_items, kappa, tau (NULL when tau has a
    * zero-variance side). */
  private def pairAgreement(s: SparkSession, dir: String): DataFrame =
    pairAgreementOf(ratings(s, dir))

  /** The q64 computation over ANY (r, q, m, sense, specific,
    * interesting) panel — public so an ingested export
    * ([[graft.operators.QualtricsIngest.rankToMatrix]]'s output)
    * feeds it unchanged (spec-exercised). */
  def pairAgreementOf(rt: DataFrame): DataFrame = {
    // Pin the paired-item table: it is BOUNDED by the panel contract
    // (≤ C(NRaters,2)·Cap·NModels rows — the scaladoc's scale
    // argument) but its lineage is the whole ev-scan → distinct →
    // cross → seen-window → ratings pipeline, and it sits on THREE
    // plan branches (the kappa aggregation and both sides of the tau
    // item-pair self-join). Without the pin the event-stream pipeline
    // plans — and runs — once per branch (6 ev scans, 56 exchanges at
    // sf0.1); exchange reuse cannot be trusted to dedup it because
    // AQE's broadcast conversion drops the exchanges reuse keys on
    // (the q36 lesson, operators/Pin scaladoc). Measured: q64
    // 1.96 → 1.13 s and q65 1.57 → 1.02 s at sf1 (1.09 → 1.00 /
    // 1.08 → 0.92 at sf0.1, where fixed stage overhead dominates).
    val items = graft.operators.Pin(pairItems(rt))

    // Cohen's kappa over the interleaved (sense, specific) binary
    // sequences: po−pe arithmetic on exact counts —
    // kappa = (n·agree − pe_num) / (n² − pe_num),
    // pe_num = c1_0·c2_0 + c1_1·c2_1.
    val kap = items.groupBy(col("r1"), col("r2")).agg(
      count(lit(1)).as("n_items"),
      (count(lit(1)) * 2).as("n_bin"),
      (sum(when(col("s1") === col("s2"), 1L).otherwise(0L)) +
        sum(when(col("p1") === col("p2"), 1L).otherwise(0L))).as("agree"),
      (sum(col("s1")) + sum(col("p1"))).as("c1_1"),
      (sum(col("s2")) + sum(col("p2"))).as("c2_1"))
      .withColumn("pe_num",
        (col("n_bin") - col("c1_1")) * (col("n_bin") - col("c2_1")) +
          col("c1_1") * col("c2_1"))
      .withColumn("kappa_s",
        when(col("agree") === col("n_bin"), lit(100000L))
          .otherwise(floor(
            (lit(100000L) * (col("n_bin") * col("agree") - col("pe_num"))).cast("double") /
              (col("n_bin") * col("n_bin") - col("pe_num")).cast("double"))))
      .select(col("r1"), col("r2"), col("n_items"), col("kappa_s"))

    // Kendall tau-b: every unordered item pair within a rater pair
    // once (lexicographic (q, m) order), concordant−discordant via
    // sign, tie counts per side; the per-key quadratic is bounded by
    // C(Cap·NModels, 2).
    val x = items.select(col("r1"), col("r2"), col("q"), col("m"), col("i1"), col("i2"))
    val y = x.select(col("r1"), col("r2"), col("q").as("q2"), col("m").as("m2"),
      col("i1").as("j1"), col("i2").as("j2"))
    val ta = x.join(y, Seq("r1", "r2"))
      .filter(col("q") < col("q2") || (col("q") === col("q2") && col("m") < col("m2")))
      .groupBy(col("r1"), col("r2")).agg(
        count(lit(1)).as("n0"),
        sum(signum((col("i1") - col("j1")) * (col("i2") - col("j2"))).cast("long")).as("cd"),
        sum(when(col("i1") === col("j1"), 1L).otherwise(0L)).as("t1"),
        sum(when(col("i2") === col("j2"), 1L).otherwise(0L)).as("t2"))
      .withColumn("tau_s",
        when(col("n0") === col("t1") || col("n0") === col("t2"),
          lit(null).cast("bigint"))
          .otherwise(floor(
            (lit(100000L) * col("cd")).cast("double") /
              sqrt(((col("n0") - col("t1")) * (col("n0") - col("t2"))).cast("double")))))
      .select(col("r1"), col("r2"), col("tau_s"))

    kap.join(ta, Seq("r1", "r2"), "left")
  }

  // q64: the pairwise agreement table.
  private def q64(s: SparkSession, dir: String): DataFrame =
    pairAgreement(s, dir)
      .select(col("r1"), col("r2"), col("n_items"),
        (col("kappa_s").cast("double") / 100000.0).as("kappa"),
        (col("tau_s").cast("double") / 100000.0).as("tau"))
      .orderBy(col("r1"), col("r2"))

  // q65: the overall averages the reference prints.
  private def q65(s: SparkSession, dir: String): DataFrame =
    pairAgreement(s, dir)
      .agg(
        count(lit(1)).as("n_pairs"),
        (sum(col("kappa_s")).cast("double") / count(lit(1)).cast("double") / 100000.0)
          .as("avg_kappa"),
        (sum(col("tau_s")).cast("double") / count(col("tau_s")).cast("double") / 100000.0)
          .as("avg_tau"))

  // q69: pooled Krippendorff alpha over the binary ratings — the
  // NLTK AnnotationTask.alpha() call of results_analysis.py:157-166:
  // coders = raters, items = (scenario, model, metric) exactly like
  // the reference's f"{metric}{question_idx}_{model}" item keys,
  // labels = the 0/1 ratings. NLTK's nominal alpha reduces to
  //   alpha = 1 − (N−1)·Σ_i[ones_i·zeros_i/(n_i−1)] / (N1·N0)
  // over items with n_i ≥ 2 ratings (items rated once are ignored,
  // matching its `labels_count < 2: continue`). Exactness: n_i ≤
  // NRaters = 10, so every per-item denominator (n_i−1) ∈ 1..9
  // divides LCM(1..9) = 2520 — the sum is computed as exact int64 at
  // 2520 scale and alpha is ONE floored scaled division of two exact
  // int64s, bit-identical in DuckDB. Zero-variance panels (all labels
  // equal → De = 0, where NLTK raises) yield NULL.
  private val AlphaLcm = 2520L

  private def q69(s: SparkSession, dir: String): DataFrame = {
    // Same pin discipline as pairAgreementOf: the bounded panel
    // (raters·Cap·NModels rows) feeds BOTH unionAll branches, so
    // without it the ev-scan → seen-window pipeline runs twice.
    val rt = graft.operators.Pin(ratings(s, dir))
    val vals = rt.select(col("q"), col("m"), lit("sense").as("metric"),
        col("sense").as("label"))
      .unionAll(rt.select(col("q"), col("m"), lit("spec").as("metric"),
        col("specific").as("label")))
    val items = vals.groupBy(col("q"), col("m"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("ones"))
      .filter(col("n") >= 2)
    items.agg(
      count(lit(1)).as("n_items"),
      sum(col("n")).as("n_ratings"),
      sum(col("ones")).as("n1"),
      sum(col("ones") * (col("n") - col("ones")) *
        (lit(AlphaLcm) / (col("n") - 1)).cast("long")).as("do_s"))
      .select(
        col("n_items"),
        col("n_ratings"),
        (when(col("n1") === 0 || col("n1") === col("n_ratings"),
          lit(null).cast("bigint"))
          .otherwise(floor(
            (lit(100000L) * (lit(AlphaLcm) * col("n1") * (col("n_ratings") - col("n1"))
              - col("do_s") * (col("n_ratings") - 1))).cast("double") /
              (lit(AlphaLcm) * col("n1") * (col("n_ratings") - col("n1"))).cast("double")))
          .cast("double") / 100000.0).as("alpha"))
  }

  // ----------------------------------------------------------------
  // Oracle SQL (DuckDB) — identical panel, identical arithmetic.

  private val pairSql =
    s"""raters AS (
       |  SELECT user_id AS r FROM ev WHERE event_type = 'signup'
       |  GROUP BY user_id ORDER BY user_id LIMIT $NRaters),
       |insts AS (SELECT DISTINCT instance_id AS q FROM ev),
       |seen AS (
       |  SELECT r, q FROM (
       |    SELECT r, q, ROW_NUMBER() OVER (PARTITION BY r
       |      ORDER BY md5('seen_' || CAST(r AS VARCHAR) || '_' || CAST(q AS VARCHAR)), q) AS rn
       |    FROM insts CROSS JOIN raters)
       |  WHERE rn <= $Cap),
       |models(m) AS (VALUES (1), (2), (3), (4), (5)),
       |ratings AS (
       |  SELECT r, q, m,
       |    CAST(('0x' || substr(md5('sense_' || key), 1, 4)) AS BIGINT) % 2 AS sense,
       |    CAST(('0x' || substr(md5('spec_' || key), 1, 4)) AS BIGINT) % 2 AS specific,
       |    1 + CAST(('0x' || substr(md5('int_' || key), 1, 4)) AS BIGINT) % 7 AS interesting
       |  FROM (SELECT r, q, m,
       |          CAST(r AS VARCHAR) || '_' || CAST(q AS VARCHAR) || '_' || CAST(m AS VARCHAR) AS key
       |        FROM seen CROSS JOIN models)),
       |items AS (
       |  SELECT a.r AS r1, b.r AS r2, a.q, a.m,
       |    a.sense AS s1, a.specific AS p1, a.interesting AS i1,
       |    b.sense AS s2, b.specific AS p2, b.interesting AS i2
       |  FROM ratings a JOIN ratings b ON a.q = b.q AND a.m = b.m AND a.r < b.r),
       |kap AS (
       |  SELECT r1, r2, n_items, CASE WHEN agree = n_bin THEN 100000
       |    ELSE CAST(floor(CAST(100000 * (n_bin * agree - pe_num) AS DOUBLE)
       |                    / CAST(n_bin * n_bin - pe_num AS DOUBLE)) AS BIGINT) END AS kappa_s
       |  FROM (
       |    SELECT r1, r2, n_items, n_bin, agree, c1_1, c2_1,
       |      (n_bin - c1_1) * (n_bin - c2_1) + c1_1 * c2_1 AS pe_num
       |    FROM (
       |      SELECT r1, r2, COUNT(*) AS n_items, COUNT(*) * 2 AS n_bin,
       |        SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END)
       |          + SUM(CASE WHEN p1 = p2 THEN 1 ELSE 0 END) AS agree,
       |        SUM(s1) + SUM(p1) AS c1_1, SUM(s2) + SUM(p2) AS c2_1
       |      FROM items GROUP BY r1, r2))),
       |ta AS (
       |  SELECT r1, r2, CASE WHEN n0 = t1 OR n0 = t2 THEN NULL
       |    ELSE CAST(floor(CAST(100000 * cd AS DOUBLE)
       |                    / sqrt(CAST((n0 - t1) * (n0 - t2) AS DOUBLE))) AS BIGINT) END AS tau_s
       |  FROM (
       |    SELECT x.r1, x.r2, COUNT(*) AS n0,
       |      SUM(CAST(sign((x.i1 - y.i1) * (x.i2 - y.i2)) AS BIGINT)) AS cd,
       |      SUM(CASE WHEN x.i1 = y.i1 THEN 1 ELSE 0 END) AS t1,
       |      SUM(CASE WHEN x.i2 = y.i2 THEN 1 ELSE 0 END) AS t2
       |    FROM items x JOIN items y ON x.r1 = y.r1 AND x.r2 = y.r2
       |      AND (x.q < y.q OR (x.q = y.q AND x.m < y.m))
       |    GROUP BY x.r1, x.r2)),
       |pairs AS (
       |  SELECT kap.r1, kap.r2, kap.n_items, kap.kappa_s, ta.tau_s
       |  FROM kap LEFT JOIN ta ON kap.r1 = ta.r1 AND kap.r2 = ta.r2)""".stripMargin

  private val q64Sql =
    s"""WITH $NormSql,
       |$pairSql
       |SELECT r1, r2, n_items,
       |  CAST(kappa_s AS DOUBLE) / 100000.0 AS kappa,
       |  CAST(tau_s AS DOUBLE) / 100000.0 AS tau
       |FROM pairs ORDER BY r1, r2""".stripMargin

  private val q65Sql =
    s"""WITH $NormSql,
       |$pairSql
       |SELECT COUNT(*) AS n_pairs,
       |  CAST(SUM(kappa_s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100000.0 AS avg_kappa,
       |  CAST(SUM(tau_s) AS DOUBLE) / CAST(COUNT(tau_s) AS DOUBLE) / 100000.0 AS avg_tau
       |FROM pairs""".stripMargin

  private val q69Sql =
    s"""WITH $NormSql,
       |$pairSql,
       |vals AS (
       |  SELECT q, m, 'sense' AS metric, sense AS label FROM ratings
       |  UNION ALL
       |  SELECT q, m, 'spec' AS metric, specific AS label FROM ratings),
       |it AS (
       |  SELECT q, m, metric, COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS ones
       |  FROM vals GROUP BY q, m, metric HAVING COUNT(*) >= 2),
       |ag AS (
       |  SELECT COUNT(*) AS n_items, CAST(SUM(n) AS BIGINT) AS n_ratings,
       |    CAST(SUM(ones) AS BIGINT) AS n1,
       |    CAST(SUM(ones * (n - ones) * ($AlphaLcm // (n - 1))) AS BIGINT) AS do_s
       |  FROM it)
       |SELECT n_items, n_ratings,
       |  CAST(CASE WHEN n1 = 0 OR n1 = n_ratings THEN NULL
       |    ELSE CAST(floor(CAST(100000 * ($AlphaLcm * n1 * (n_ratings - n1) - do_s * (n_ratings - 1)) AS DOUBLE)
       |              / CAST($AlphaLcm * n1 * (n_ratings - n1) AS DOUBLE)) AS BIGINT)
       |  END AS DOUBLE) / 100000.0 AS alpha
       |FROM ag""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q64_annotator_agreement", q64, Some(q64Sql)),
    QueryDef("q65_agreement_summary", q65, Some(q65Sql)),
    QueryDef("q69_krippendorff_alpha", q69, Some(q69Sql)),
    QueryDef("q102_qualtrics_matrix", q102, Some(q102Sql)))
}

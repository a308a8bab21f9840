package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Batched external-classifier harness — the reference's GPT
  * OOC/in-character scorer shape (reference:
  * distill3b_ic_classifier_gpt.py:38-64 `get_ooc_ic_label`: heuristic
  * pre-gate, 200-word truncation, up-to-3 retries accepting only the
  * three known labels; :70-76 keeps rows only when
  * `label == "in-character" and prob > 0.8`). The OpenAI call itself
  * is out of scope (external service) — the scorer is a pluggable
  * batch function; everything around it is the ported surface.
  *
  * Spark-first shape: the scorer runs inside ONE `mapPartitions` pass
  * (the documented escape hatch for imperative per-partition logic —
  * a remote-call loop cannot be a Catalyst expression), lazily
  * batching `batchSize` rows per call so a partition is never
  * materialized and a 1000-executor run makes
  * rows/(partitions·batchSize) calls per task with no driver
  * involvement. Rows the heuristic pre-gate already decides NEVER
  * reach the scorer — at corpus scale that is most rows and most of
  * the money. [[scoreCached]] wraps the pass in the checksum-gated
  * [[HeuristicCache]] so an unchanged corpus is never re-scored
  * (mirroring how the reference caches distill stages on disk
  * between runs).
  */
object ExternalScorer {

  /** One remote call: a batch of prompts → one (label, prob) per
    * prompt, order-preserved. May throw or return junk labels — the
    * harness retries. */
  type ScoreFn = Seq[String] => Seq[(String, Double)]

  /** The three labels the reference's loop accepts
    * (distill3b_ic_classifier_gpt.py:59). */
  val ValidLabels: Set[String] = Set("in-character", "out-of-character", "mixed")
  /** Truncation bound (distill3b_ic_classifier_gpt.py:45-46). */
  val MaxWords = 200
  /** Attempt bound (distill3b_ic_classifier_gpt.py:47 `for _ in range(3)`). */
  val MaxAttempts = 3
  /** Prompt-length bound: the reference's prediction harness skips
    * prompts over 8000 chars — "probably more than 2048 tokens"
    * (utt_cmd_test_predictions.py:44-46). */
  val MaxPromptChars = 8000

  /** Pre-call length gate (utt_cmd_test_predictions.py:44-46):
    * filter with this BEFORE [[score]] to drop rows whose prompt
    * would blow the model's context, as the reference's loop does. */
  def promptLengthOk(textCol: Column): Column =
    length(textCol) <= MaxPromptChars

  /** Heuristic pre-gate (distill3b_ic_classifier_gpt.py:39-43): empty,
    * OOC/OOG-marked, or paren-opening text is out-of-character with
    * certainty — no remote call. None = needs the scorer. */
  def heuristicLabel(text: String): Option[(String, Double)] =
    if (text == null || text.isEmpty) Some(("out-of-character", 1.0))
    else if (text.contains("OOC") || text.contains("OOG") || text.startsWith("("))
      Some(("out-of-character", 1.0))
    else None

  /** First-200-space-split-words truncation
    * (distill3b_ic_classifier_gpt.py:45-46). */
  def truncateWords(text: String): String = {
    val words = text.split(" ", -1)
    if (words.length > MaxWords) words.take(MaxWords).mkString(" ") else text
  }

  /** Scores `textCol` of every row, appending `label` (string, null
    * when all attempts failed — the reference's `return None, 1`) and
    * `prob` (double) columns. Batches of `batchSize` per scorer call;
    * per-row retry up to [[MaxAttempts]] across re-batched calls;
    * heuristic-gated rows are answered locally.
    *
    * COST WARNING: this is a plain lazy transformation — Spark
    * re-executes it whenever the plan runs twice (a downstream global
    * sort's range-sampling pass, task retries, AQE re-plans), which
    * re-invokes the remote scorer and re-spends the money. Production
    * runs should use [[scoreCached]] (parquet-materialized, so the
    * scorer executes exactly once per corpus content) or pin the
    * result (graft.operators.Pin) before any global sort. */
  /** @param fewshotPrefix prepended to every REMOTE prompt (after
    *        truncation) — the reference's few-shot harness sends
    *        `fewshot_prompt + prompt` per call (fewshot_predict.py:
    *        40-53); heuristic-gated rows never see it. */
  def score(df: DataFrame, textCol: Column, scorer: ScoreFn,
            batchSize: Int = 32, fewshotPrefix: String = ""): DataFrame = {
    val tagged = df.withColumn("_scorer_text", textCol)
    val schema = tagged.schema.add("label", StringType).add("prob", DoubleType)
    val textIdx = tagged.schema.fieldIndex("_scorer_text")
    val scored = tagged.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val results = new Array[(String, Double)](batch.size)
        // local answers first; remote indices collected
        var remote = Vector.newBuilder[Int]
        batch.zipWithIndex.foreach { case (row, i) =>
          val text = if (row.isNullAt(textIdx)) null else row.getString(textIdx)
          heuristicLabel(text) match {
            case Some(lp) => results(i) = lp
            case None => remote += i
          }
        }
        var pending = remote.result()
        var attempt = 0
        while (pending.nonEmpty && attempt < MaxAttempts) {
          attempt += 1
          val prompts =
            pending.map(i => fewshotPrefix + truncateWords(batch(i).getString(textIdx)))
          val answers =
            try scorer(prompts).map(Option(_))
            catch { case _: Exception => Seq.fill(prompts.size)(None) }
          require(answers.size == prompts.size,
            s"scorer returned ${answers.size} answers for ${prompts.size} prompts")
          pending = pending.zip(answers).flatMap {
            case (i, Some(lp @ (label, _))) if ValidLabels(label) =>
              results(i) = lp; None
            case (i, _) => Some(i) // junk label or call failure: retry
          }
        }
        pending.foreach(i => results(i) = (null, 1.0)) // reference: None, 1
        batch.zipWithIndex.map { case (row, i) =>
          Row.fromSeq(row.toSeq :+ results(i)._1 :+ results(i)._2)
        }
      }
    }(Encoders.row(schema))
    scored.drop("_scorer_text")
  }

  /** The reference's keep-gate (distill3b_ic_classifier_gpt.py:70-76):
    * in-character with confidence > 0.8. */
  def icFilter: Column =
    col("label") === "in-character" && col("prob") > 0.8

  /** [[score]] behind the checksum-gated [[HeuristicCache]]: an
    * unchanged input never re-scores (reruns cost zero scorer calls);
    * any content change invalidates and rescoreds the corpus. */
  def scoreCached(df: DataFrame, textCol: Column, scorer: ScoreFn,
                  cacheDir: String, batchSize: Int = 32,
                  fewshotPrefix: String = ""): DataFrame =
    HeuristicCache.computeOrLoad(df, cacheDir)(in =>
      score(in, textCol, scorer, batchSize, fewshotPrefix))
}

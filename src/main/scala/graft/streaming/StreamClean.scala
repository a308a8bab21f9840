package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The clean-corpus pipeline (q78) as an always-on STREAM — the
  * live-ingest hygiene a training-data firehose consumer runs instead
  * of periodic batch sweeps. Every q78 stage except the dedup is a
  * stateless map over native expressions, so the streaming plan is
  * the batch plan with exactly ONE stateful operator swapped in:
  *
  *   - exact dedup: `dropDuplicatesWithinWatermark` on the SAME
  *     normalized fingerprint batch q34/q78 group on
  *     ([[graft.functions.TextFunctions.fingerprint]]), with
  *     [[StreamDedup]]'s bounded-state contract (state ∝ arrival rate
  *     × watermark delay, never stream lifetime). Canonical-row
  *     choice differs by construction: batch keeps the min doc_id,
  *     the stream keeps the FIRST ARRIVAL — identical output when
  *     arrival order follows doc_id (the replay test), and the
  *     at-scale trade (late duplicates beyond the horizon re-admit)
  *     is inherited and documented there.
  *   - Gopher repetition keep: [[graft.plans.RepetitionStats]] inline
  *     filter — pure map, no gram shuffle, streams unchanged.
  *   - PII redaction: [[graft.plans.PiiScan]] (withCounts=false —
  *     only the redacted text flows on), pure map.
  *   - BPE-ish token count: [[graft.plans.BpeTokenCount]], pure map.
  *
  * No protocol sort (streams have no total order — consumers key on
  * docId); otherwise the emitted columns match q78's
  * (doc_id, red_text, n_tokens) plus the event time. */
object StreamClean {

  /** Streaming q78: dedup-within-watermark → repetition keep → PII
    * redaction → [optional quality-classifier keep] → token count.
    * Input rows are [[StreamDedup.Doc]] (docId, event-time ts, text).
    *
    * `classifier` (round 13): a FITTED [[graft.operators
    * .QualityClassifier]] + keep threshold — the q97 scorer riding
    * the stream. The fit stays a batch job on exemplar data (models
    * are versioned artifacts, not per-batch state); scoring is
    * [[graft.operators.Quality.classifierScore]]'s pure in-row
    * projection (constant-folded weight literals, no explode/join/
    * shuffle — the streaming-composability the batch scaladoc
    * claims, proven here by the batch-equivalence spec). Scored on
    * the REDACTED text — the text the model trains on is the text
    * that should be quality-gated. */
  def cleanCorpusStream(docs: Dataset[StreamDedup.Doc],
                        watermarkDelay: String = "10 seconds",
                        classifier: Option[(graft.operators.Quality.QualityClassifier, Double)] = None)
      : DataFrame = {
    val st = graft.plans.RepetitionStats(trim(col("text")))
    val cleaned = docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("st", st)
      .filter(col("st.top2_cov") * 5 <= col("st.tot") &&
        col("st.dup5_cov") * 20 <= col("st.tot") * 3)
      .withColumn("red_text",
        graft.plans.PiiScan(col("text"), withCounts = false)
          .getField("red_text"))
    val gated = classifier match {
      case Some((m, threshold)) => cleaned
        .withColumn("p_quality",
          graft.operators.Quality.classifierScore(col("red_text"), m))
        .filter(col("p_quality") >= threshold)
      case None => cleaned
    }
    gated.select(
      col("docId").as("doc_id") +: col("ts") +: col("red_text") +:
        graft.functions.TextFunctions.bpeTokenCount(col("red_text")).as("n_tokens") +:
        classifier.map(_ => col("p_quality")).toSeq: _*)
  }

  /** Streaming DECONTAMINATION (q71 live): the benchmark n-gram
    * collision check as an always-on QUARANTINE stream — every
    * arriving doc that shares a word-n-gram hash with the held-out
    * benchmark set is emitted once (first arrival within the
    * watermark horizon). Stream-static inner join against the
    * broadcast benchmark hash set (tiny by definition — q71's
    * discipline; the static side is planned per micro-batch exactly
    * like the batch join), then `dropDuplicatesWithinWatermark` on
    * doc_id collapses multi-hash hits to one alert row. Streams
    * cannot anti-join stream-vs-stream, so the CLEAN stream is not
    * derivable here — production wires this as the quarantine side
    * channel (drop-listing downstream by doc_id), the shape
    * monitoring/alerting actually wants. `bench` must carry one
    * `h` column of [[graft.operators.Dedup.P]]-domain hashes (build
    * with [[benchHashes]]). */
  def contaminatedStream(docs: Dataset[StreamDedup.Doc], bench: DataFrame,
                         n: Int = 5,
                         watermarkDelay: String = "10 seconds"): DataFrame =
    docs
      .select(col("docId").as("doc_id"), col("ts"),
        explode(graft.plans.ShingleHashes(trim(col("text")), n,
          graft.operators.Dedup.P)).as("h"))
      .join(broadcast(bench.select(col("h"))), Seq("h"))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col("ts"))

  /** The static benchmark hash-set side for [[contaminatedStream]]:
    * distinct word-n-gram hashes of the benchmark docs. */
  def benchHashes(benchDocs: DataFrame, n: Int = 5): DataFrame =
    benchDocs
      .select(explode(graft.plans.ShingleHashes(trim(col("text")), n,
        graft.operators.Dedup.P)).as("h"))
      .distinct()
}

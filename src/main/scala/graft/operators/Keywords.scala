package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction by tf·idf — the relevance scan a
  * corpus toolkit runs for tagging / routing / near-dup triage
  * (reference analog: the heuristic explorers rank instances by
  * hand-picked signals; this is the corpus-general automatic one).
  *
  * EXACT-integer idf variant: idf(t) = floor(log2(N / df(t)))
  * computed as length(bin(N DIV df)) − 1 — integer arithmetic end to
  * end, so scores, ranks, and the emitted top-k are cross-engine
  * byte-reproducible (a float ln(N/df) is not: `ln` carries no
  * correct-rounding guarantee, which is why the q85 LM keeps its ln
  * out of the oracle). Base-2 integer idf preserves the tf·idf
  * ordering semantics (common terms with df = N score 0 and vanish)
  * and is the documented house trade for a fully oracle-checked
  * surface.
  *
  * Scale shape (the q75 lesson applied): term strings NEVER key an
  * exchange. Words are zipped IN-ROW with their 48-bit
  * [[graft.plans.ShingleHashes]] unigram hashes; the per-doc term
  * table groups on (doc_id, h) — map-side combine collapses
  * within-doc repetition, and the exchange is bounded by the output
  * (the per-doc term table itself); document frequency aggregates
  * the slim (h) stream; the df join back is int64-keyed. Both
  * engines key EVERYTHING on h (the ShingleHashes collision
  * discipline — a 48-bit collision merges the same two terms on both
  * sides, with min(term) the deterministic display name). Documents
  * whose every split segment is empty contribute no rows.
  */
object Keywords {

  /** 48-bit identity modulus (the q75 convention). */
  val HashP: Long = 1L << 48

  /** Top-k terms per document by (tf·idf desc, h asc):
    * (doc_id, rank, term, tf, df, score).
    *
    * Exchange audit (the shape is the point): ONE scan, ONE exchange
    * of the word stream — `repartition(h)` up front, which the
    * (doc_id, h) tf/min-term aggregate, the per-h document frequency
    * (string column pruned away → pure hash aggregate), and the
    * tf⋈df join ALL reuse (h-clustering satisfies each; the
    * SHUFFLE_HASH pin keeps the planner from broadcasting the
    * vocabulary-sized df side, the round-9 discipline — the first
    * draft measured that broadcast + an unshared exchange at 3.9 s
    * vs 1.6 s for this shape at sf1). The word stream crosses the
    * wire once WITH its term strings — the same corpus-bytes volume
    * any shape must move at least once to name the winners, and
    * moving it here deletes the second scan + name-recovery join a
    * split int/string pipeline needs (measured 2.0 s). The per-doc
    * top-k window runs AFTER the join; Spark's WindowGroupLimit
    * prunes to ≤ k rows per doc per partition before the window
    * exchange, so only ~k·docs slim rows re-shuffle. Ranking ties on
    * score resolve by h asc ON BOTH SIDES (the oracle ranks by the
    * identical h — the "key everything on h" discipline):
    * deterministic, total, exactly reproducible. */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val n = docs.count() // driver scalar, bounded by construction
    val trimmed = trim(col("text"))
    val zipped = zip_with(
      split(trimmed, " "),
      graft.plans.ShingleHashes(trimmed, 1, HashP),
      (w, h) => struct(w.as("term"), h.as("h")))
    val occ = docs.select(col("doc_id"), explode(zipped).as("t"))
      .filter(length(col("t.term")) > 0)
      .select(col("doc_id"), col("t.h").as("h"), col("t.term").as("term"))
      .repartition(col("h"))
    val terms = occ.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("tf"), min(col("term")).as("term"))
    val dfreq = terms.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val scored = terms.hint("shuffle_hash").join(dfreq, Seq("h"))
      .withColumn("score",
        (col("tf") * (length(bin(expr(s"$n DIV df"))) - 1)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("h"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }
}

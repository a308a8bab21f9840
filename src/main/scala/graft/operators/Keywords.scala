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

  /** Top-k terms per document by (tf·idf desc, term asc):
    * (doc_id, rank, term, tf, df, score). */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val n = docs.count() // driver scalar, bounded by construction
    val zipped = zip_with(
      split(trim(col("text")), " "),
      graft.plans.ShingleHashes(trim(col("text")), 1, HashP),
      (w, h) => struct(w.as("term"), h.as("h")))
    val terms = docs.select(col("doc_id"), explode(zipped).as("t"))
      .filter(length(col("t.term")) > 0)
      .groupBy(col("doc_id"), col("t.h").as("h"))
      .agg(count(lit(1)).as("tf"), min(col("t.term")).as("term"))
    val dfreq = terms.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val scored = terms.join(dfreq, Seq("h"))
      .withColumn("score",
        (col("tf") * (length(bin(expr(s"$n DIV df"))) - 1)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }
}

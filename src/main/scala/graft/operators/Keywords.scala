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
    * Exchange audit (the shape is the point): ONE scan of the text
    * column, ONE exchange of the word stream — `repartition(h)` up
    * front — then EVERYTHING downstream rides that clustering with
    * zero further wide operators until the per-doc rank: the
    * (doc_id, h) tf/min-term aggregate (h ⊆ its keys), and the
    * per-h document frequency as a WINDOW COUNT over h (h IS the
    * partition key) — no join, no second aggregate branch. The
    * round-11 join shape claimed the df branch "reused" the word
    * stream exchange; the final adaptive plan says otherwise:
    * column pruning slims the df branch's pre-exchange projection
    * (term string dropped), the two subtrees stop canonicalizing
    * equal, AQE stage reuse never fires, and the corpus was
    * scanned + split + hashed TWICE (measured: the join shape's
    * second scan branch is ~40% of the query). The window-df shape
    * deletes that second scan and the join outright. Per-h window
    * groups are df-sized — a stop-word's group is O(#docs), which
    * WindowExec sorts and spills like any other partition; the same
    * rows concentrated on the same task under the join shape too,
    * so the skew profile is unchanged while the redundant pass is
    * gone. The word stream crosses the wire once WITH its term
    * strings — the same corpus-bytes volume any shape must move at
    * least once to name the winners. The per-doc top-k window runs
    * after scoring; Spark's WindowGroupLimit prunes to ≤ k rows per
    * doc per partition before the window exchange, so only ~k·docs
    * slim rows re-shuffle. Ranking ties on score resolve by h asc
    * ON BOTH SIDES (the oracle ranks by the identical h — the "key
    * everything on h" discipline): deterministic, total, exactly
    * reproducible.
    *
    * Global N without a second SEQUENTIAL corpus job (the round-11
    * weak-row fix): the old shape paid a separate `docs.count()`
    * driver action — a full extra job scheduled BEFORE the pipeline
    * starts — just to embed N as a literal. N now arrives as a
    * column via a 1-row broadcast branch (`groupBy().count()` on the
    * document table, cross-joined as a broadcast nested loop): the
    * branch's scan is pruned to ZERO columns (ReadSchema struct<>,
    * row counts straight off parquet page headers) and materializes
    * CONCURRENTLY with the word-stream stages inside the same
    * action, so the sequential action floor and the second corpus
    * read both disappear. (The tempting alternative — an in-row
    * sentinel so df(sentinel) = N — was tried and rejected: the
    * post-agg sentinel filters push BELOW the word-stream exchange
    * and de-canonicalize the branches, tripling the scan.) The
    * 1-row side is bounded by construction — NOT the round-9
    * vocabulary-broadcast trap, which PlanSpec still forbids. N as
    * a column (not a pre-action literal) leaves score computable
    * before the rank window, preserving the WindowGroupLimit prune. */
  def tfidfTopK(docs: DataFrame, k: Int): DataFrame = {
    val nRow = docs.groupBy().agg(count(lit(1)).as("n"))
    // Round 13: the word stream is ONE codegen'd byte pass
    // (plans/WordHashPairs: segments + md5 + empty-drop fused) — the
    // previous zip_with(split, ShingleHashes) ran the zip INTERPRETED
    // (higher-order functions have no codegen) over two separate text
    // passes, and the empty-segment filter churned exploded rows.
    val occ = docs.select(col("doc_id"),
        explode(graft.plans.WordHashPairs(trim(col("text")), HashP)).as("t"))
      .select(col("doc_id"), col("t.h").as("h"), col("t.term").as("term"))
      .repartition(col("h"))
    // The (doc, term) rollup is WINDOWS over the h-clustered stream,
    // not a groupBy: min(term) is a var-length string, which forces
    // the aggregate down to SortAggregate — one sort plus TWO
    // streaming agg passes (partial+final, both above the exchange,
    // where partial combining buys nothing). The window formulation
    // pays the same single (h, doc_id, term) sort and then ONE
    // merged WindowExec (tf and the group-representative row_number
    // share a window spec, so Spark fuses them), with the rn = 1
    // filter keeping the min-term row: measured 0.85 → 0.79 s for
    // the rollup at sf1. The df window (partition by h alone) rides
    // the same sort as a PREFIX — no re-sort, no second exchange,
    // and per-h window groups concentrate exactly the rows the join
    // shape concentrated on the same task anyway (WindowExec sorts
    // and spills like any partition, so a stop-word group is skew,
    // not a new failure mode).
    val w1 = Window.partitionBy(col("h"), col("doc_id")).orderBy(col("term"))
    val scored = occ
      .withColumn("tf", count(lit(1)).over(
        w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .crossJoin(broadcast(nRow))
      .withColumn("score",
        (col("tf") * (length(bin(expr("n DIV df"))) - 1)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("h"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }
}

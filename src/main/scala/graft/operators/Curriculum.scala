package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two ORDERING/SELECTION stages between a scored corpus and the
  * data loader, as PARAMETERIZED operators a pipeline can call (the
  * q67/q68/q95 discipline — q98/q99 were round-12 inline queries with
  * hard-coded constants; this lifts them without touching their
  * oracle surfaces, which now run through here):
  *
  *  - [[curriculumOrder]] (q98): quality-phase buckets + seeded
  *    in-phase shuffle + a dense global position via [[GlobalRank]]
  *    (range exchange + per-partition sorts + O(#partitions) prefix
  *    offsets — never a SinglePartition window).
  *  - [[tokenBudget]] (q99): per source, keep the highest-quality
  *    documents until a token budget — with the SKETCH-QUANTILE
  *    PRE-PRUNE in front of the exact running-sum window (the scale
  *    mitigation round 12's scaladoc promised; see below).
  *
  * Token-budget scale shape: the exact cut needs a per-source
  * running sum, which is a per-source TOTAL ORDER — one task chain
  * sorts and scans each source end to end. At 100 TB with a handful
  * of giant sources that is a straggler by construction. The
  * pre-prune bounds it: a per-source TOKEN-WEIGHTED score histogram
  * (uniform bins between the source's min/max score — a bounded
  * exchange of ≤ #sources × bins rows at any corpus size) picks the
  * highest bin cut below which strictly-higher bins already hold ≥
  * budget tokens; only documents at-or-above the cut bin enter the
  * window. SUPERSET PROOF (why the kept set is untouched): every
  * document in a bin strictly above the cut has a strictly higher
  * score than any document below it, hence ranks strictly earlier in
  * the (score desc, id) order; those documents alone carry ≥ budget
  * tokens, so any below-cut document has cum_before ≥ budget and the
  * exact window would drop it anyway. And because the sliver is a
  * score-PREFIX of each source's rank order, ranks and running sums
  * computed within the sliver equal their full-corpus values — the
  * output is byte-identical (spec-pinned), so q99's oracle runs the
  * pruned path. Sliver size: ≤ budget + the two cut-adjacent bins'
  * token mass (~2·total/bins on spread-out scores). Degenerate case:
  * massively tied scores concentrate mass in one bin and the prune
  * degrades toward keep-everything — which is inherent (no score
  * threshold can separate ties; the exact order inside a tie is by
  * id), never incorrect. Cost: two extra column-pruned passes over
  * (source, score[, tok]) — the min/max agg and the histogram — in
  * exchange for a window input bounded near the budget instead of
  * the corpus.
  */
object Curriculum {

  /** q98 parameterized: deterministic global training order.
    * `thresholds` are the phase boundaries in DESCENDING order
    * (score ≥ thresholds(i) → phase i; below all → phase
    * thresholds.length); `salt` seeds the reproducible in-phase
    * shuffle (the q33 split primitive). Output: idCol, phase, skey,
    * pos — `pos` a dense 1-based permutation of the corpus. */
  def curriculumOrder(docs: DataFrame, score: Column,
                      idCol: String = "doc_id",
                      thresholds: Seq[Double] = Seq(0.8, 0.6, 0.4),
                      salt: String = "order:"): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted.reverse,
      s"phase thresholds must be descending: $thresholds")
    // foldRight so the HIGHEST threshold is the outermost test
    // (a 0.9-score doc must take phase 0, not the lowest band)
    val phase = thresholds.zipWithIndex
      .foldRight(lit(thresholds.length.toLong)) { case ((t, i), acc) =>
        when(score >= t, i.toLong).otherwise(acc)
      }
    val base = docs
      .withColumn("phase", phase)
      .withColumn("skey",
        conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
          1, 12), 16, 10).cast("long"))
      .select(col(idCol), col("phase"), col("skey"))
    GlobalRank.withRowNumber(base,
      Seq(col("phase"), col("skey"), col(idCol)), "pos")
      .select(col(idCol), col("phase"), col("skey"), col("pos"))
  }

  /** The pre-prune sliver (package-visible for the soak harness):
    * documents whose score bin is at or above the per-source cut.
    * Returns the staged (sourceCol, idCol, qs, tok) rows. */
  private[graft] def pruneSliver(staged: DataFrame, budget: Long,
                                 sourceCol: String, bins: Int): DataFrame = {
    val nn = staged.filter(col("qs").isNotNull)
    // stats over STAGED, not nn: a source whose scores are all NULL
    // must still survive the bin join (NULL stats → NULL bin → no
    // histogram row → no cut → keep-all, matching the exact window)
    val stats = staged.groupBy(col(sourceCol))
      .agg(min(col("qs")).as("_smin"), max(col("qs")).as("_smax"))
    def binOf(df: DataFrame): DataFrame = df
      .join(broadcast(stats), Seq(sourceCol))
      .withColumn("_bin",
        when(col("_smax") <= col("_smin"), lit(0L)).otherwise(
          least(floor((col("qs") - col("_smin"))
            / (col("_smax") - col("_smin")) * bins), lit(bins - 1L)))
          .cast("long"))
    // token-weighted histogram: bounded at ≤ #sources × bins rows
    val hist = binOf(nn).groupBy(col(sourceCol), col("_bin"))
      .agg(sum(coalesce(col("tok"), lit(0L))).as("_btok"))
    // tokens in strictly HIGHER bins; cut = highest bin whose above
    // mass already covers the budget (strictly-above, so equal-score
    // boundary straddles can never evict an exactly-kept doc)
    val wAbove = Window.partitionBy(col(sourceCol)).orderBy(col("_bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = hist
      .withColumn("_above", coalesce(sum(col("_btok")).over(wAbove), lit(0L)))
      .filter(col("_above") >= budget)
      .groupBy(col(sourceCol)).agg(max(col("_bin")).as("_cutbin"))
    // no cut row ⇒ the source's total fits near the budget: keep all
    binOf(staged).join(broadcast(cut), Seq(sourceCol), "left")
      .filter(col("_cutbin").isNull || col("_bin") >= col("_cutbin"))
      .drop("_smin", "_smax", "_bin", "_cutbin")
  }

  /** q99 parameterized: per `sourceCol`, keep the highest-`score`
    * documents until `budget` tokens (floor semantics — the doc that
    * straddles the boundary is kept). Output: sourceCol, idCol, tok,
    * rank, cum_before — ranks and running sums are the FULL-corpus
    * values whether or not the pre-prune runs (see object scaladoc).
    * `prePrune = false` keeps the round-12 direct-window shape (the
    * test baseline; production wants the default).
    *
    * Small-corpus cost: the pre-prune's fixed overhead (stats pass +
    * histogram + the staged-projection pin) is ~2x the direct window
    * at toy scale (sf0.1 measured 0.165 → 0.410 s) and only pays off
    * once a single source's doc count is large relative to its token
    * budget (5M docs / 90%-one-source measured 3.2 s pruned vs
    * 10.4 s direct). Pass `prePrune = false` for interactive work on
    * small corpora; keep the default for production pipelines — the
    * oracle gates the pruned path because that is the shape that
    * ships. */
  def tokenBudget(docs: DataFrame, budget: Long, score: Column, tok: Column,
                  sourceCol: String = "source", idCol: String = "doc_id",
                  prePrune: Boolean = true, bins: Int = 4096): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val staged = docs.select(col(sourceCol), col(idCol),
      score.as("qs"), tok.as("tok"))
    // Pre-prune consumers (min/max stats, histogram, final filter)
    // would each re-scan the corpus and RE-EVALUATE the score/token
    // expressions — typically full text scans (measured 3x q99's wall
    // at sf1). Pin the SLIM staged projection once: one text scan +
    // one ~4-column materialization, three cheap slim reads. At
    // deployment the staged table is usually an already-stored
    // scored corpus — pass cheap column refs and the pin is of slim
    // rows either way. The pin is LAZY (materialized by the first
    // consumer job — here the stats broadcast build): constructing a
    // tokenBudget plan that is then explained or discarded must not
    // run a corpus scan or leave pinned blocks resident. Released by
    // the caller's query-state hygiene (the result plan carries the
    // LogicalRDD).
    val in = if (prePrune)
      pruneSliver(Pin(staged), budget, sourceCol, bins)
    else staged
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("qs").desc, col(idCol))
    in
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("tok")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col(sourceCol), col(idCol), col("tok"), col("rank"),
        col("cum_before"))
  }
}

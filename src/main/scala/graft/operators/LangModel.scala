package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality scoring (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data"): train a small LM on a high-quality TARGET slice,
  * score every corpus document by its perplexity under that model,
  * and split the corpus into head/middle/tail quality strata — the
  * filter run on the raw crawl before LLaMA-class pretraining.
  *
  * The honest in-engine analog of CCNet's KenLM 5-gram: an add-one-
  * smoothed BIGRAM model over the hashed-bucket feature space the
  * DSIR operator established ([[Dsir.NumBuckets]] = 1024 buckets,
  * 48-bit-md5 [[graft.plans.ShingleHashes]] streams) — the model is
  * a bounded table at any corpus size, which is what makes the fit
  * one map-side-combined aggregation and the scoring a broadcast
  * join, never a vocabulary-sized shuffle.
  *
  * House split (the q76/q58 precedent): everything data-shaped — the
  * position-aligned feature stream, the fitted counts, the scoring
  * joins, the per-document int64 aggregates — is the oracle surface
  * (q85: exact BIGINTs, byte-reproducible in DuckDB). The float tail
  * (per-occurrence log-probs, their mean, the strata thresholds) is
  * spec-gated: transcendental `ln` is not required to be correctly
  * rounded, so cross-engine hash equality cannot be promised on it.
  *
  * Scale shape: fit = one explode → (kind, bucket)-keyed hash
  * aggregation (shuffle ≤ partitions × 2·NumBuckets rows regardless
  * of corpus size) collected ONCE (≤ 2048 rows, bounded by
  * construction); scoring re-derives the stream (scans are cheap,
  * state is not), joins the two broadcast model slices, and sums per
  * doc — one doc_id-keyed exchange with partial aggregation.
  */
object LangModel {

  /** Shared hashed feature space with [[Dsir]] (1024 buckets). */
  val NumBuckets: Long = Dsir.NumBuckets

  /** Position-aligned (context-unigram-bucket, bigram-bucket) pairs:
    * entry i (1-based, i = 1..n-1) pairs word_i's unigram bucket with
    * (word_i, word_i+1)'s bigram bucket, so Σ_w2 c(w1, w2) = c(w1) —
    * the bigram-LM normalization invariant — holds by construction.
    * One native byte pass (round 13: `plans/ContextPairHashes` —
    * both n-gram widths hashed zero-copy in one loop; the previous
    * two-ShingleHashes + zip_with form ran the zip INTERPRETED, the
    * q87 WordHashPairs lesson); input must be trim'd (the
    * ShingleHashes contract). Fewer than two words → empty array;
    * NULL text → NULL. Property-pinned equal to the composed form. */
  def contextPairs(trimmed: Column): Column =
    graft.plans.ContextPairHashes(trimmed, NumBuckets)

  /** The fitted model over the target slice, one pass: per-bucket
    * CONTEXT counts (kind 1: unigram buckets of words 1..n-1) and
    * BIGRAM counts (kind 2). ≤ 2·NumBuckets rows by construction. */
  def bigramModel(docs: DataFrame, targetPred: Column): DataFrame =
    docs.filter(targetPred)
      .select(explode(contextPairs(trim(col("text")))).as("p"))
      .select(explode(array(
        struct(lit(1).as("kind"), col("p.b1").as("b")),
        struct(lit(2).as("kind"), col("p.b2").as("b")))).as("e"))
      .groupBy(col("e.kind").as("kind"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** The collected model as two broadcastable local slices
    * (contexts, bigrams). Bounded collect (≤ 2048 rows). */
  private def modelSlices(docs: DataFrame, targetPred: Column)
      : (DataFrame, DataFrame) = {
    val rows = bigramModel(docs, targetPred).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    require(rows.nonEmpty,
      "LangModel: empty bigram model (no target doc has two words)")
    val spark = docs.sparkSession
    import spark.implicits._
    val m1 = rows.collect { case (1, b, c) => (b, c) }.toSeq.toDF("b1", "c1")
    val m2 = rows.collect { case (2, b, c) => (b, c) }.toSeq.toDF("b2", "c2")
    (m1, m2)
  }

  /** Per-occurrence scored stream: every (doc_id, c1, c2) with the
    * model counts attached (0 where the target never saw the
    * bucket). */
  private def scoredOccurrences(docs: DataFrame, m1: DataFrame,
                                m2: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(contextPairs(trim(col("text")))).as("p"))
      .select(col("doc_id"), col("p.b1").as("b1"), col("p.b2").as("b2"))
      .join(broadcast(m1), Seq("b1"), "left")
      .join(broadcast(m2), Seq("b2"), "left")
      .select(col("doc_id"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))

  /** q85's oracle surface — per document, the EXACT integer
    * aggregates of the scored stream: bigram count, Σ looked-up
    * bigram-bucket counts, Σ looked-up context-bucket counts.
    * Documents with no bigram (or NULL text) report zeros. Pins the
    * target fit, the stream alignment, both joins, and the per-doc
    * aggregation; only the final `ln` map is left to [[nll]]. */
  def pplFeatures(docs: DataFrame, targetPred: Column,
                  requireModel: Boolean = false): DataFrame = {
    // Empty-model guard (opt-in): all-miss zeros from an EMPTY model
    // are indistinguishable from a legitimately out-of-model corpus,
    // so a misconfigured exemplar predicate would yield
    // plausible-looking zero features silently. `requireModel = true`
    // fails fast instead: a limit-1 existence probe of the target
    // slice for any doc with >= 1 context pair (== "the fitted model
    // has >= 1 row", by construction of [[bigramModel]]) — early-
    // terminating, no aggregation, and OFF the default path so the
    // single-action plan shape below is unchanged when not asked for.
    if (requireModel) {
      val any = docs.filter(targetPred)
        .filter(size(contextPairs(trim(col("text")))) > 0)
        .limit(1).count()
      require(any > 0,
        "LangModel.pplFeatures: empty bigram model — no target doc " +
          "has two words; features would be all-zero")
    }
    // Round 12: the model rides the SAME action as the scoring scan.
    // The old shape collected the ≤2·1024-row model to the driver
    // first — a full sequential fit action (scan + aggregate + 1
    // collect) before scoring could even start, exactly the q87
    // docs.count() pattern. Broadcasting the two model slices as
    // plan BRANCHES instead materializes them CONCURRENTLY with the
    // scoring scan inside one action: the kind filters push into the
    // branch scans, so each branch reads only the target slice, and
    // the sequential action floor disappears (1.17 → measured below
    // at sf1). Empty-target edge: the broadcast slices are empty, so
    // every lookup misses and the features read zero — which is
    // EXACTLY the oracle's LEFT-JOIN semantics (the old collect path
    // threw instead; [[nll]], the spec surface, keeps [[modelSlices]]
    // and its non-empty guard).
    //
    // COMPOSITE-KEY single branch (round 12c): slicing the model by
    // `kind` filters would push each filter below the branch's
    // exchange and de-canonicalize the two subtrees — two full
    // model-fit scans (the q87 exchange-reuse lesson). Folding kind
    // into the key (k = kind·1024 + b) leaves both broadcast builds
    // as alias-only projections of ONE subtree, which canonicalize
    // equal → the second BroadcastExchange is a ReusedExchange: the
    // model is fitted and broadcast ONCE, looked up twice.
    val model = bigramModel(docs, targetPred)
      .select((col("kind").cast("long") * NumBuckets + col("b")).as("k"),
        col("c"))
    val m1 = model.select(col("k").as("k1"), col("c").as("c1"))
    val m2 = model.select(col("k").as("k2"), col("c").as("c2"))
    // Round 12b: the zero-row stitch join is GONE. The old shape
    // LEFT-joined a second doc_id-only corpus scan to re-attach docs
    // with no bigram (short/NULL text) as zero rows — one extra
    // scan, one extra keyed join, one extra exchange. Instead every
    // document appends ONE in-row sentinel pair (bucket −4096, see
    // below — it must stay negative AFTER the composite-key shifts;
    // a NULL pair array coalesces to empty first so NULL text still
    // gets its sentinel): the sentinel misses both broadcast lookups
    // (contributing 0 to both sums) and guarantees every doc_id
    // reaches the aggregate, where
    // n_bi = count − 1 removes it from the bigram count. One scan,
    // two broadcast joins, one map-side-combined aggregate — and no
    // q87-style exchange-reuse trap, because this stream has exactly
    // one consumer.
    val pairs = contextPairs(trim(col("text")))
    // sentinel bucket: −4·NumBuckets, so BOTH composite keys stay
    // negative (model keys live in [1024, 3072)) — a plain −1 would
    // alias kind-1's bucket 1023 after the +1024 shift
    val sentinelB = -4L * NumBuckets
    val withSentinel = concat(
      coalesce(pairs, array().cast("array<struct<b1:bigint,b2:bigint>>")),
      array(struct(lit(sentinelB).as("b1"), lit(sentinelB).as("b2"))))
    docs.select(col("doc_id"), explode(withSentinel).as("p"))
      // composite probe keys: kind 1 = context bucket, kind 2 =
      // bigram bucket; the sentinel's negative keys miss both lookups
      .select(col("doc_id"),
        (lit(NumBuckets) + col("p.b1")).as("k1"),
        (lit(2 * NumBuckets) + col("p.b2")).as("k2"))
      .join(broadcast(m1), Seq("k1"), "left")
      .join(broadcast(m2), Seq("k2"), "left")
      .groupBy(col("doc_id"))
      .agg((count(lit(1)) - 1L).as("n_bi"),
        sum(coalesce(col("c2"), lit(0L))).as("sum_c2"),
        sum(coalesce(col("c1"), lit(0L))).as("sum_c1"))
  }

  /** Per-document negative mean log-probability (the log-perplexity
    * proxy; LOWER = more target-like): nll = −(1/n) Σ_i ln((c2_i + 1)
    * / (c1_i + NumBuckets)) — add-one smoothing over the bucket
    * space, so unseen buckets score ln(1/(0 + k)) rather than −∞.
    * Documents with no bigram get NULL (unscorable — CCNet buckets
    * them with the tail; see [[headMiddleTail]]). Float tail:
    * spec-gated, not oracle-checked (see the object scaladoc). */
  def nll(docs: DataFrame, targetPred: Column): DataFrame = {
    val (m1, m2) = modelSlices(docs, targetPred)
    val scored = scoredOccurrences(docs, m1, m2)
      .withColumn("lp",
        log(col("c2") + 1.0) - log(col("c1") + NumBuckets.toDouble))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bi"), (-avg(col("lp"))).as("nll"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bi"))
  }

  /** CCNet's head/middle/tail strata over [[nll]] scores: head =
    * nll ≤ lo, middle = nll ≤ hi, tail = the rest; unscorable
    * documents (NULL nll) land in the tail, mirroring CCNet's
    * treatment of undecidable lines. Thresholds come from the
    * caller (CCNet derives them as per-language score percentiles
    * on a held-out sample — a bounded driver-side quantile, not an
    * engine concern). */
  def headMiddleTail(scored: DataFrame, lo: Double, hi: Double): DataFrame =
    scored.withColumn("stratum",
      when(col("nll").isNotNull && col("nll") <= lo, lit("head"))
        .when(col("nll").isNotNull && col("nll") <= hi, lit("middle"))
        .otherwise(lit("tail")))
}

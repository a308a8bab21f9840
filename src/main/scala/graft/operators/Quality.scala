package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus quality / repetition operators — the Gopher-style rule
  * family (Rae et al. 2021, "Scaling Language Models", Table A1) a
  * pretraining pipeline runs between ingestion and dedup. The
  * reference repo's distillation plays the same role for its corpus
  * (short/bot filters, distill2_authors.py single-caster gate); these
  * are the general-corpus analogs, first-class here like the dedup
  * suite.
  *
  * Scale shape: everything is either a pure map stage (PII redaction)
  * or explode → keyed hash aggregation with map-side partial
  * aggregation (n-gram counts). The gram-count shuffle carries the
  * doc key, so within-document repetition — the very thing being
  * measured — compresses in the partial aggregate before the
  * exchange. No windows, no joins except the final doc_id-keyed
  * stitch, which pins SHUFFLE_HASH because both sides are
  * corpus-shaped (round-9 broadcast-estimate discipline).
  */
object Quality {

  /** Plain word n-gram array for a single n (empty below n words). */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Gopher repetition rules per document (documents(doc_id, text)):
    *
    *   - `top2_frac`: fraction of non-space characters covered by the
    *     single word 2-gram covering the most characters (count ×
    *     gram chars). Gopher removes docs where the most frequent
    *     2-gram covers > 0.20 of the text; "covering the most
    *     characters" is the deterministic tie-free variant of "most
    *     frequent" (ties in count cannot flip the fraction).
    *   - `dup5_frac`: fraction of characters covered by occurrences
    *     of DUPLICATED word 5-grams (each occurrence's chars counted;
    *     Gopher threshold 0.15). This is the common published
    *     approximation of the paper's overlap-once accounting
    *     (overlapping occurrences may double-count characters).
    *   - `mean_word_len`, `n_words`, and the combined `keep` flag.
    *
    * `keep` is decided in exact int64 arithmetic (cov*5 <= tot,
    * cov*20 <= 3*tot) so the threshold comparison can never disagree
    * across engines on a float ulp.
    *
    * Repetition is a WITHIN-document property, so the whole rule set
    * is one native byte-scan per row ([[graft.plans.RepetitionStats]]
    * — per-row hash counting, the TextStats discipline) and the
    * operator is a pure map stage: no exchange at any size. The
    * original explode → gram-shuffle → re-join shape (preserved as
    * the oracle's composed SQL) shuffled ~2 gram rows per word —
    * 2.8 s at sf1 vs one scan, and at 100 TB the corpus's largest
    * shuffle for a quantity that never leaves its row. */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val totNz = when(col("st.tot") === 0, lit(null)).otherwise(col("st.tot"))
    docs
      .select(col("doc_id"),
        graft.plans.RepetitionStats(trim(col("text"))).as("st"))
      .select(
        col("doc_id"),
        col("st.n_words").as("n_words"),
        (col("st.top2_cov").cast("double") / totNz).as("top2_frac"),
        (col("st.dup5_cov").cast("double") / totNz).as("dup5_frac"),
        (col("st.tot").cast("double") / col("st.n_words")).as("mean_word_len"),
        (col("st.top2_cov") * 5 <= col("st.tot") &&
          col("st.dup5_cov") * 20 <= col("st.tot") * 3)
          .cast("int").as("keep"))
  }

  // PII patterns — portable between Java regex (Spark) and RE2
  // (DuckDB): character classes, bounded repetition and \b only, no
  // backrefs or lookaround. These are the ORACLE surface; Spark-side
  // evaluation is the native byte-scan [[graft.plans.PiiScan]],
  // property-pinned to these exact patterns.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Separator-delimited phone shapes: 3-3-4 (`555-123-4567`,
    * `555.123.4567`) and 3-4-4 (the synthetic corpus's injected
    * format). Parenthesized forms like `(555) 123-4567` are out of
    * scope: a leading `\b\(` can never match after a space (the `\b`
    * would need a WORD char before the paren), and the alternation
    * that fixes it isn't portable to the same leftmost-greedy shape
    * across Java regex and RE2 without lookaround — documented
    * limitation rather than a subtly engine-divergent pattern. */
  val PhoneRe = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The clean-corpus pipeline (q78): exact-dedup survivors
    * (min-doc_id canonical per normalized fingerprint, q34's
    * semantics) → Gopher repetition keep (the [[gopherRepetition]]
    * rules as an inline map filter, no gram shuffle) → PII redaction
    * (native [[graft.plans.PiiScan]]) → BPE-ish token count. ONE
    * scan, ONE exchange (the fingerprint min_by aggregate) + the
    * protocol sort; everything else fused map work — corpus hygiene
    * at scan bandwidth, zero regex passes end to end. */
  def cleanCorpus(docs: DataFrame): DataFrame =
    cleanCorpusRaw(docs)
      // the q36/q37 sort discipline: the protocol sort's range sampler
      // re-executes its child with a separate job — a user-specified
      // hash repartition is the materialized re-read point, so
      // sampling re-reads shuffle files instead of re-running the
      // dedup + scan pipeline (measured: 2.7 s → 1.8 s at sf1)
      .repartition(col("doc_id"))
      .orderBy(col("doc_id"))

  /** [[cleanCorpus]] without the presentation sort — the composable
    * form (q96 chains more stages on top; a mid-pipeline global sort
    * would be pure wasted exchange). */
  def cleanCorpusRaw(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    val st = graft.plans.RepetitionStats(trim(col("text")))
    docs
      // exact-dedup survivors as a min_by AGGREGATE on the
      // fingerprint, not a window: identical result rows (the min
      // doc_id's row per fp — the oracle SQL keeps the window form),
      // but partial aggregation collapses duplicate texts MAP-SIDE
      // before the exchange, so a pathologically duplicated document
      // (the sf10 simhash soak's cliquey-corpus lesson) ships one row
      // per map partition instead of funneling every copy through one
      // reducer's window partition. Same single exchange, no
      // within-partition sort, skew-proof by construction.
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      .withColumn("st", st)
      .filter(col("st.top2_cov") * 5 <= col("st.tot") &&
        col("st.dup5_cov") * 20 <= col("st.tot") * 3)
      // withCounts=false: q78 consumes only red_text, so the two
      // independent count scans are skipped (PiiScan scaladoc)
      .withColumn("red_text",
        graft.plans.PiiScan(col("text"), withCounts = false)
          .getField("red_text"))
      .select(col("doc_id"), col("red_text"),
        TextFunctions.bpeTokenCount(col("red_text")).as("n_tokens"))
  }

  /** The regex-chain redaction column (email first so digit runs
    * inside a matched address can't be re-matched). Reference form
    * only — kept as the spec surface [[graft.plans.PiiScan]] is
    * property-pinned against; query paths use the native scan. */
  def redactedRegex(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** PII detection + redaction over a text column: per-row match
    * counts for email / phone / IPv4 patterns on the original text
    * and the redacted text (`<EMAIL>`/`<IP>`/`<PHONE>` placeholders;
    * email replaced first so digit runs inside a matched address
    * can't be re-matched). One native byte scan per row
    * ([[graft.plans.PiiScan]]) instead of six regex traversals. Pure
    * map stage — at 100 TB this saturates scan bandwidth, nothing
    * shuffles. */
  def redactPii(df: DataFrame, textCol: Column): DataFrame = {
    val pii = graft.plans.PiiScan(textCol)
    df.withColumn("pii", pii)
      .withColumn("n_email", col("pii.n_email"))
      .withColumn("n_phone", col("pii.n_phone"))
      .withColumn("n_ip", col("pii.n_ip"))
      .withColumn("red_text", col("pii.red_text"))
      .drop("pii")
  }

  /** The data-MIXTURE table (per-source corpus composition) every
    * pretraining run builds before choosing sampling weights: for
    * each `source`, document count, exact-duplicate count (docs that
    * are NOT the min-doc_id canonical of their normalized-fingerprint
    * family — q34's survivor rule, so "dup rate" here means "what
    * exact dedup would remove"), total BPE-ish token count, and the
    * count of English-looking docs (the q76 stopword-ratio ≥ 0.05
    * predicate).
    *
    * Shape: ONE corpus exchange (the fingerprint window — each row
    * must learn whether it is its family's canonical, which is
    * per-row information an aggregate can't return) followed by a
    * groupBy on the tiny `source` key with full map-side combine;
    * token/language signals are native byte scans riding the same
    * scan. Output is one row per source — driver-safe at any corpus
    * size. */
  def sourceMix(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    val st = TextFunctions.textStats(col("text"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    docs
      // ALL per-row signals in the map stage, text dropped BEFORE the
      // window: expressions referenced only after a window would
      // otherwise force the full text through the fp exchange — the
      // slim projection ships ~40 bytes/row instead of the document
      .select(col("doc_id"), col("source"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.bpeTokenCount(col("text")).as("toks"),
        ((st.getField("n_stop").cast("double") / st.getField("n_words")) >= 0.05)
          .cast("long").as("en"))
      .withColumn("canon", min(col("doc_id")).over(w))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("doc_id") =!= col("canon")).cast("long")).as("n_dup"),
        sum(col("toks")).as("n_tokens"),
        sum(col("en")).as("n_en"))
      .orderBy(col("source"))
  }

  /** Corpus-level top-k word n-grams by occurrence count (boilerplate
    * / template detection — the heavy-hitter scan run before writing
    * a cleaning rule). Deterministic total order (count desc, gram
    * asc).
    *
    * Two passes, heavy keys NEVER as strings: pass 1 ranks candidate
    * heavy hitters by pure occurrence count keyed on the 48-bit
    * [[graft.plans.ShingleHashes]] hash — a native one-pass map stage
    * feeding an int64 count exchange with full map-side combine; the
    * vocabulary crosses the wire as 8-byte longs, never gram strings
    * (on GenSf's adversarial mostly-unique corpus the old
    * string-keyed pass shuffled ~2M ~30-byte gram strings to find 20
    * winners — 1.9 s at sf1 vs 0.6 s hashed). Pass 2 re-derives gram
    * STRINGS only for occurrences whose hash sits in the top-4k set
    * (map-side isin — the sliver is the only string exchange) and
    * recounts exactly per string, so a hash collision can merge
    * pass-1 counts but never corrupt an emitted row; the
    * distinct-doc spread is likewise computed on the sliver only —
    * per-gram distinct-counting the whole vocabulary is exactly what
    * a 100 TB heavy-hitter scan must never do. Exactness is CERTIFIED
    * per run, not assumed: any gram outside the sliver has count <=
    * its hash's count <= the (4k+1)-th hash count, so `k-th exact
    * sliver count > that bound` proves the top k (and its tie order)
    * complete; a boundary tie falls back loudly to the string-keyed
    * exact pass. Driver-side state is 4k+1 and k rows — bounded by
    * construction at any corpus size (the Dsir discipline). */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    // Pass 1 keyed on the 48-bit shingle hash (native one-pass
    // [[graft.plans.ShingleHashes]] stream, the q36 base): the
    // count exchange and the top-k selection carry 8-byte longs,
    // never gram strings — on the adversarial mostly-unique corpus
    // the string form shuffles the whole vocabulary as strings just
    // to discover that only k of them matter.
    val kk = math.max(4 * k, 64)
    val hs = docs.select(
      explode(graft.plans.ShingleHashes(trim(col("text")), n, HashP)).as("h"))
    val topH = hs.groupBy(col("h")).agg(count(lit(1)).as("hcnt"))
      .orderBy(col("hcnt").desc, col("h"))
      .limit(kk + 1)
      .collect() // bounded: kk+1 rows by construction
    // Any hash OUTSIDE the kept top-kk set has total count <= bound,
    // and a gram's count is <= its hash's count — so once the k-th
    // exact gram count strictly beats `bound`, no out-of-sliver gram
    // can belong to the top k (nor tie into it). If every observed
    // hash fits in the set the sliver IS the vocabulary and the
    // result is exact unconditionally.
    val bound =
      if (topH.length > kk) topH.last.getLong(1) else Long.MinValue
    val hset = topH.take(kk).map(_.getLong(0)).toSeq

    // Pass 2: gram STRINGS are materialized ONLY at matched
    // positions — the hash stream is recomputed (cheap native map;
    // caching the corpus-sized pass-1 stream is the non-option at
    // scale), positions whose hash sits in the top set are selected
    // by higher-order array ops INSIDE the row, and only those
    // positions' grams are built and exploded. Profiled at sf1: the
    // explode-all-grams-then-filter form spent 0.94 s just
    // allocating 2M gram strings to throw ~all of them away.
    // The recount per string makes a 48-bit collision harmless: it
    // can merge pass-1 counts but never corrupt an emitted row.
    val topArr = lit(hset.toArray)
    val d = docs.select(col("doc_id"), trim(col("text")).as("t"))
      .select(col("doc_id"), split(col("t"), " ").as("ws"),
        graft.plans.ShingleHashes(col("t"), n, HashP).as("hs"))
    val matchPos = filter(
      transform(col("hs"), (h, i) => when(array_contains(topArr, h), i + 1)),
      p => p.isNotNull)
    val matchGrams = transform(matchPos,
      i => concat_ws(" ", slice(col("ws"), i, lit(n))))
    val sliverTop = d
      .select(col("doc_id"), explode(matchGrams).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
      .collect() // bounded: k rows
    val exact = sliverTop.length < k || sliverTop.last.getLong(1) > bound
    if (exact) {
      val spark = docs.sparkSession
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(sliverTop.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("gram",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      // k-th count tied the out-of-sliver bound: the hash ranking
      // cannot certify the boundary — fall back to the exact string
      // shape (loud; data-dependent, never wrong)
      System.err.println(
        s"[topNgrams] hash-sliver boundary ambiguous (k-th cnt vs bound " +
          s"$bound) — falling back to the string-keyed exact pass")
      topNgramsStringKeyed(docs, n, k)
    }
  }

  /** The string-keyed exact form — pass 1 shuffles the vocabulary as
    * strings; kept as [[topNgrams]]'s certainty fallback for the
    * boundary-tie case the hash sliver cannot certify. */
  private def topNgramsStringKeyed(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val dd = docs.select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
    val grams = dd.select(col("doc_id"), explode(wordNgrams(col("ws"), n)).as("gram"))
    val top = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
    grams.join(broadcast(top), Seq("gram"))
      .groupBy(col("gram"), col("cnt"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .select(col("gram"), col("cnt"), col("n_docs"))
      .orderBy(col("cnt").desc, col("gram"))
  }

  /** 48-bit identity modulus for [[graft.plans.ShingleHashes]]: the
    * full first-48-md5-bits value survives (h % 2^48 == h), so the
    * only collision source is the 48-bit truncation itself
    * (~V^2/2^49 expected — ~0.01 at a 2M-gram vocabulary). */
  private val HashP: Long = 1L << 48

  // -----------------------------------------------------------------
  // q97: fastText-style hashed linear QUALITY CLASSIFIER — the
  // CCNet/LLaMA "looks-like-Wikipedia" selection stage (Wenzek et al.
  // 2020 §4.4; Touvron et al. 2023 train a fastText line classifier
  // on Wikipedia-linked exemplars). House split, the q58/q76
  // precedent: the DESIGN SURFACE — per-doc hashed bag-of-ngrams
  // counts with label and balanced class weight, everything
  // data-shaped — is the q97 oracle (exact int64 counts on the same
  // 48-bit-md5 bucket stream as DSIR, byte-reproducible in DuckDB);
  // the LBFGS fit and the sigmoid scores are spec-gated
  // (determinism, planted preference, in-row scorer == sparse-join
  // scorer) because transcendental floats are not cross-engine
  // hash-stable.

  /** The fitted classifier: one weight per [[Dsir.NumBuckets]] hashed
    * unigram+bigram bucket (in ORIGINAL count units) + intercept. */
  final case class QualityClassifier(weights: Array[Double], intercept: Double)

  /** q97 oracle surface: the classifier's DESIGN MATRIX in sparse
    * form — (doc_id, bucket, n_occ, y, w): per-doc occurrence count
    * of each occupied feature bucket ([[Dsir.featureBuckets]]: hashed
    * word 1-grams + 2-grams mod 1024), the exemplar label y ∈ {0,1},
    * and the sklearn-"balanced" class weight w = n_docs / (2 ·
    * n_class) (doc-level counts — the q58 designMatrix formula).
    * Docs with NULL text contribute no rows (no feature stream) —
    * mirrored by the oracle's explode. Scale shape (round 14): the
    * per-doc bucket counts are grouped IN-ROW
    * ([[graft.plans.BucketCounts]] — sort + run-length encode of the
    * feature array), because every (doc_id, bucket) group lives
    * entirely inside one input row: the former
    * `groupBy(doc_id, bucket)` exchange moved O(docs × features)
    * already-collapsed rows for zero combining benefit (~165M rows =
    * most of the query's cost at sf10: 15.2 s → 5.3 s warm with the
    * exchange and the range-sort sampler gone). The matrix is now
    * a pure projection — no exchange at any corpus size — plus the
    * 1-row class-count aggregate broadcast back (no window, no
    * driver round-trip). */
  def classifierDesign(docs: DataFrame, exemplarPred: Column): DataFrame = {
    val stats = docs.agg(
      count(lit(1)).cast("double").as("_n"),
      sum(when(exemplarPred, 1.0).otherwise(0.0)).as("_np"))
    docs
      .select(col("doc_id"), exemplarPred.as("is_ex"),
        explode(graft.plans.BucketCounts(
          Dsir.featureBuckets(trim(col("text"))))).as("bc"))
      .select(col("doc_id"), col("is_ex"),
        col("bc.bucket").as("bucket"), col("bc.n_occ").as("n_occ"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("bucket"), col("n_occ"),
        when(col("is_ex"), 1.0).otherwise(0.0).as("y"),
        when(col("is_ex"), col("_n") / (lit(2.0) * col("_np")))
          .otherwise(col("_n") / (lit(2.0) * (col("_n") - col("_np"))))
          .as("w"))
  }

  /** Fit the classifier: dense 1024-bucket count vectors (the
    * in-row [[graft.plans.BucketCounts]] entries `map_from_entries`'d
    * + a bounded 1024-step densify — a pure projection, no doc_id
    * exchange since round 14), then the
    * [[RegressionHead]] conventions verbatim: spark.ml
    * LogisticRegression (one treeAggregate pass per LBFGS step — no
    * row shuffle), balanced weights, standardization ON, L2.
    * Determinism is FIXED-PARTITIONING determinism, not bitwise:
    * treeAggregate sums floats in task-completion order within a
    * level, so re-fits on a different cluster/parallelism can differ
    * in low-order bits (the spec compares coefficients at 1e-9, not
    * bit equality). Driver cost: the 1024+1 fitted doubles. */
  def classifierFit(docs: DataFrame, exemplarPred: Column,
                    regParam: Double = 0.01): QualityClassifier = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val k = Dsir.NumBuckets.toInt
    val stats = docs.agg(
      count(lit(1)).cast("double").as("_n"),
      sum(when(exemplarPred, 1.0).otherwise(0.0)).as("_np"))
    val dense = docs
      .select(col("doc_id"), exemplarPred.as("is_ex"),
        graft.plans.BucketCounts(
          Dsir.featureBuckets(trim(col("text")))).as("bcs"))
      .where(col("bcs").isNotNull) // NULL text: no feature stream (design parity)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        when(col("is_ex"), 1.0).otherwise(0.0).as("y"),
        when(col("is_ex"), col("_n") / (lit(2.0) * col("_np")))
          .otherwise(col("_n") / (lit(2.0) * (col("_n") - col("_np"))))
          .as("w"),
        map_from_entries(col("bcs")).as("m"))
      .select(col("doc_id"), col("y"), col("w"),
        array_to_vector(transform(sequence(lit(0L), lit(k - 1L)),
          b => coalesce(element_at(col("m"), b), lit(0L)).cast("double")))
          .as("features"))
    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setWeightCol("w")
      .setRegParam(regParam).setElasticNetParam(0.0)
      .setStandardization(true)
      .setMaxIter(100).setTol(1e-9)
      .fit(dense)
    QualityClassifier(model.coefficients.toArray, model.intercept)
  }

  /** Score a text column against a fitted classifier IN-ROW:
    * p = σ(b + Σ_occurrences weights[bucket]) — the weights inline as
    * a constant-folded 1024-literal array (the ivfLearned
    * literal-core precedent), the feature stream is the same
    * zero-copy byte scan, and the whole thing is one PROJECTION: no
    * explode, no join, no shuffle — which is what makes the filter
    * composable onto a stream (the ExternalScorer property) or any
    * mid-pipeline stage for free. NULL text scores NULL (and so
    * never passes a threshold filter). */
  def classifierScore(text: Column, m: QualityClassifier): Column = {
    require(m.weights.length == Dsir.NumBuckets.toInt,
      s"classifier has ${m.weights.length} weights, want ${Dsir.NumBuckets}")
    val wLit = array(m.weights.map(lit(_)): _*)
    val z = aggregate(Dsir.featureBuckets(trim(text)),
      lit(m.intercept),
      (acc, b) => acc + element_at(wLit, b.cast("int") + 1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The selection stage: keep documents the classifier scores at or
    * above `threshold` (CCNet keeps the top head/middle strata; a
    * fixed threshold is the LLaMA-style variant). Emits the input
    * columns plus `p_quality`. */
  def classifierFilter(docs: DataFrame, m: QualityClassifier,
                       threshold: Double = 0.5): DataFrame =
    docs.withColumn("p_quality", classifierScore(col("text"), m))
      .filter(col("p_quality") >= threshold)
}

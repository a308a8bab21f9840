package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo 2018, "Subword Regularization"
  * — the SentencePiece `--model_type=unigram` trainer): model each
  * word as a sequence of independent subword pieces, fit piece
  * probabilities by EM over ALL segmentations (forward-backward on the
  * segmentation lattice), iteratively prune the seed vocabulary, and
  * encode with Viterbi (the single best segmentation). The complement
  * to [[BpeTrain]]'s greedy-merge induction: same (word, count)
  * vocabulary surface, probabilistic rather than merge-ordered.
  *
  * Scale shape — train on the WORD-COUNT VOCABULARY, never the corpus
  * (the [[BpeTrain]] argument: every occurrence of a word contributes
  * identically, so EM is a job over the vocabulary, ≪ corpus and
  * sublinear in corpus growth):
  *
  *  - seed: one distributed substring explode over the vocab
  *    ([[seedCounts]] — ≤ maxLen·|word| pieces per word TYPE), top-K
  *    by (cnt desc, piece asc) plus every single character (the
  *    coverage floor). The seed count table is the q105 oracle
  *    surface — exact int64 counts, SQL-expressible.
  *  - each EM iteration is ONE DataFrame job over the vocabulary: the
  *    per-word forward-backward lattice pass runs IN-ROW as
  *    higher-order-function folds against the current model inlined
  *    as a map literal (the ivfLearned literal-core precedent — no
  *    UDF, no mapPartitions), emitting per-piece expected counts that
  *    one keyed sum reduces to a model-sized table. The α/β arrays
  *    are STAGED columns before the edge enumeration reads them —
  *    interpreted HOFs have no cross-invocation CSE (the q93 lesson),
  *    so a captured α-subtree inside the edge lambda would recompute
  *    the whole forward pass per edge. E-step contributions are
  *    rounded to `Scale` fixed-point INSIDE the row, so the
  *    cross-partition sum is integer — bit-deterministic under any
  *    partitioning (the float-sum order problem solved the same way
  *    the oracle surfaces keep `ln` off their columns). Bound: corpus
  *    token count × Scale must fit int64 — ~8·10¹² tokens at
  *    Scale = 2²⁰; size Scale down for bigger corpora.
  *  - prune: after each EM round, drop the lowest-expected-count
  *    multi-char pieces down to `shrink`× the size (never below
  *    `targetVocab`, never single chars) — SentencePiece's loss-based
  *    prune replaced by its standard expected-count approximation;
  *    the spec pins the hand-computable EM round exactly.
  *  - driver state is model-sized throughout (seedSize entries): the
  *    E-table collect follows the [[Dsir]]/[[BpeTrain]] model-collect
  *    discipline, and the vocabulary is pinned once ([[Pin]]/release,
  *    the BpeTrain round discipline). The corpus is touched exactly
  *    once (the vocab aggregation).
  *
  * Encode ([[encodeViterbi]]) is an IN-ROW Viterbi fold: per word,
  * one forward pass over positions maximizing summed log-prob (ties
  * prefer the longer piece), one backward fold reconstructing the
  * path — all `aggregate`/`transform` HOFs against the
  * model-as-literal, with the per-word score array staged through a
  * `zip_with` so reconstruction reads materialized state (q93 again).
  * The encoder is a pure projection: no explode, no join, no shuffle,
  * streaming-composable (the q97 in-row scorer precedent). Characters
  * outside the model encode as themselves at [[UnkLogProb]] (the
  * sentencepiece character-fallback), so every word is segmentable.
  */
object UnigramLm {

  /** Fixed-point scale for E-step contributions (see scaladoc bound). */
  val Scale: Long = 1L << 20

  /** Log-prob for out-of-model single characters at encode time —
    * worse than any realistic trained piece, so known pieces win. */
  val UnkLogProb: Double = -20.0

  /** All substrings of `w` up to `maxLen` code points, one entry per
    * occurrence position (array<string>; `w` must be non-empty).
    * COMPOSED REFERENCE form — the oracle-SQL mirror and the
    * PropertySpec pin for [[graft.plans.SubstrPieces]]; the hot path
    * ([[seedCounts]]) uses the native expression, which computes the
    * identical stream in one byte pass instead of O(n²·maxLen)
    * interpreted substr re-walks (round-15; the WordHashPairs
    * precedent). */
  def substrPieces(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), s =>
      transform(sequence(lit(1), least(lit(maxLen), length(w) - s + lit(1))),
        l => w.substr(s, l))))

  /** Distributed seed surface over a (w, cnt) vocabulary: substring →
    * summed word count (one explode + one keyed sum; the q105 oracle
    * body). The substring stream is [[graft.plans.SubstrPieces]],
    * native codegen. */
  def seedCounts(vocab: DataFrame, maxLen: Int): DataFrame =
    vocab.select(
        explode(graft.plans.SubstrPieces(col("w"), maxLen)).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))

  /** One E-step over a (w, cnt) vocabulary against `model`: per-piece
    * expected occurrence counts in `Scale` fixed-point, as a
    * model-sized (piece, e) table. The forward-backward lattice pass
    * is entirely in-row; only the final keyed sum shuffles. Words
    * with zero total lattice probability (some character outside the
    * model) are skipped, as in SentencePiece. */
  def expectedCounts(vocab: DataFrame, model: Map[String, Double],
                     maxLen: Int): DataFrame = {
    val mapLit = typedlit(model)
    val L = maxLen
    val w = col("w")
    val n = length(w)
    def p(piece: Column): Column =
      coalesce(try_element_at(mapLit, piece), lit(0.0))
    // alphas(k) = α(k-1): total probability of the first k-1 chars
    val alphas = aggregate(
      sequence(lit(1), n), array(lit(1.0)),
      (acc, i) => concat(acc, array(
        aggregate(sequence(lit(1), least(lit(L), i)), lit(0.0),
          (s, l) => s + p(w.substr(i - l + lit(1), l)) *
            element_at(acc, i - l + lit(1))))))
    // betasRev(k) = β(n-k+1): total probability of the last k-1 chars
    val betasRev = aggregate(
      sequence(lit(1), n), array(lit(1.0)),
      (acc, t) => concat(acc, array(
        aggregate(sequence(lit(1), least(lit(L), t)), lit(0.0),
          (s, l) => s + p(w.substr(n - t + lit(1), l)) *
            element_at(acc, t - l + lit(1))))))
    val staged = vocab
      .withColumn("__n", n)
      .withColumn("__a", alphas)
      .withColumn("__b", betasRev)
      .withColumn("__z", element_at(col("__a"), col("__n") + 1))
      .filter(col("__z") > 0)
    // every lattice edge (end i, length l) whose piece is in the
    // model: E[piece] += α(i-l)·p·β(i)/Z × cnt, fixed-point rounded
    val nn = col("__n")
    val edges = flatten(transform(sequence(lit(1), nn), i =>
      filter(
        transform(sequence(lit(1), least(lit(L), i)), l =>
          struct(
            col("w").substr(i - l + lit(1), l).as("piece"),
            round(
              try_element_at(mapLit, col("w").substr(i - l + lit(1), l)) *
                element_at(col("__a"), i - l + lit(1)) *
                element_at(col("__b"), nn - i + lit(1)) / col("__z") *
                col("cnt") * Scale).cast("long").as("e"))),
        e => e.getField("e").isNotNull)))
    staged.select(explode(edges).as("p"))
      .groupBy(col("p.piece").as("piece"))
      .agg(sum(col("p.e")).as("e"))
  }

  private def isSingle(piece: String): Boolean =
    piece.codePointCount(0, piece.length) == 1

  /** Train a unigram-LM piece model over `docs.text`. Returns
    * (piece, prob) normalized over the final vocabulary, ordered
    * (prob desc, piece asc) — deterministic end to end (integer
    * E-tables, total-order pruning). */
  def train(docs: DataFrame, targetVocab: Int, seedSize: Int = 1 << 13,
            maxPieceLen: Int = 8, emPerRound: Int = 2,
            shrink: Double = 0.75): Seq[(String, Double)] = {
    require(targetVocab > 0 && seedSize >= targetVocab,
      "unigram: need targetVocab > 0 and seedSize >= targetVocab")
    val vocab = Pin(BpeTrain.vocab(docs), eager = true)
    try {
      val seeds = Pin(seedCounts(vocab, maxPieceLen), eager = true)
      // singles are the coverage floor and always survive; the rest
      // of the seed budget goes to the heaviest multi-char substrings
      val (singles, multis) = try {
        val sg = seeds.filter(length(col("piece")) === 1).collect()
          .map(r => r.getString(0) -> r.getLong(1))
        val mu = seeds.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece"))
          .limit(math.max(seedSize - sg.length, 0)).collect()
          .map(r => r.getString(0) -> r.getLong(1))
        (sg, mu)
      } finally Pin.release(seeds)
      def normalize(counts: Seq[(String, Long)]): Map[String, Double] = {
        // singles keep a count floor of 1 so coverage never collapses
        val kept = counts.map { case (p, c) =>
          p -> (if (isSingle(p)) math.max(c, 1L) else c)
        }.filter(_._2 > 0L)
        val tot = kept.map(_._2.toDouble).sum
        kept.map { case (p, c) => p -> c / tot }.toMap
      }
      var model = normalize((singles ++ multis).toSeq)
      def emTable(m: Map[String, Double]): Seq[(String, Long)] =
        expectedCounts(vocab, m, maxPieceLen)
          .collect().map(r => r.getString(0) -> r.getLong(1))
          .sortBy(_._1).toSeq
      var rounds = 0
      var lastE: Seq[(String, Long)] = Nil
      while ({
        for (_ <- 1 to emPerRound) {
          lastE = emTable(model)
          model = normalize(lastE ++
            singles.filter { case (p, _) => !lastE.exists(_._1 == p) }
              .map { case (p, _) => p -> 1L })
        }
        val nMulti = model.keys.count(!isSingle(_))
        val nSingle = model.size - nMulti
        val target = math.max(targetVocab - nSingle, 0)
        rounds += 1
        if (nMulti > target && rounds < 64) {
          val keep = math.max(target, (nMulti * shrink).toInt)
          val eOf = lastE.toMap
          // prune the lowest-expected multis; total order (e asc,
          // piece asc) keeps the cut deterministic
          val dropped = model.keys.filter(!isSingle(_)).toSeq
            .map(p => (eOf.getOrElse(p, 0L), p)).sorted
            .take(nMulti - keep).map(_._2).toSet
          model = normalize(
            model.keys.toSeq.sorted.filterNot(dropped)
              .map(p => p -> eOf.getOrElse(p, if (isSingle(p)) 1L else 0L)))
          true
        } else false
      }) ()
      model.toSeq.sortBy { case (p, pr) => (-pr, p) }
    } finally Pin.release(vocab)
  }

  /** Per-word Viterbi score array as an in-row fold: index k holds the
    * best log-prob of segmenting the first k-1 chars plus the length
    * of the final piece on that best path (0 = start). Ties prefer
    * the longer piece. */
  private def vitScores(w: Column, mapLit: Column, L: Int): Column = {
    val negInf = lit(Double.NegativeInfinity)
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0.0).as("s"), lit(0).as("l"))),
      (acc, i) => concat(acc, array(
        aggregate(
          sequence(lit(1), least(lit(L), i)),
          struct(negInf.as("s"), lit(0).as("l")),
          (b, l) => {
            val piece = w.substr(i - l + lit(1), l)
            val lp = when(l === lit(1),
              coalesce(try_element_at(mapLit, piece), lit(UnkLogProb)))
              .otherwise(try_element_at(mapLit, piece))
            val prev = element_at(acc, i - l + lit(1)).getField("s")
            val cand = prev + lp
            when(lp.isNotNull && prev > negInf &&
                (cand > b.getField("s") ||
                  (cand === b.getField("s") && l > b.getField("l"))),
              struct(cand.as("s"), l.cast("int").as("l")))
              .otherwise(b)
          }))))
  }

  /** Walk the staged score array backward from position n, collecting
    * pieces (reversed); `sc` must be a MATERIALIZED array (a lambda
    * variable), never the [[vitScores]] subtree itself. */
  private def vitWalk(w: Column, sc: Column): Column = {
    val n = length(w)
    val walked = aggregate(
      sequence(lit(1), n),
      struct(n.cast("int").as("pos"), array().cast("array<string>").as("toks")),
      (st, _) => {
        val pos = st.getField("pos")
        val pl = element_at(sc, pos + 1).getField("l")
        when(pos > 0,
          struct((pos - pl).cast("int").as("pos"),
            concat(st.getField("toks"),
              array(w.substr(pos - pl + lit(1), pl))).as("toks")))
          .otherwise(st)
      })
    reverse(walked.getField("toks"))
  }

  /** Viterbi-encode `textCol` against a trained model: emits
    * (original columns..., tokens array<string>). Pure projection —
    * see the object scaladoc. */
  def encodeViterbi(docs: DataFrame, textCol: String,
                    model: Seq[(String, Double)],
                    maxPieceLen: Int = 8): DataFrame = {
    val mapLit = typedlit(model.map { case (p, pr) => p -> math.log(pr) }.toMap)
    docs
      .withColumn("__ws",
        filter(split(trim(col(textCol)), " "), w => length(w) > 0))
      .withColumn("__sc", transform(col("__ws"), w => vitScores(w, mapLit, maxPieceLen)))
      .withColumn("tokens",
        flatten(zip_with(col("__ws"), col("__sc"), (w, sc) => vitWalk(w, sc))))
      .drop("__ws", "__sc")
  }

  // ---- driver-local references (spec surfaces) -------------------

  /** Local forward-backward expected counts for one (word, cnt) —
    * UNSCALED doubles, the hand-checkable reference for
    * [[expectedCounts]]. */
  private[graft] def expectedLocal(w: String, cnt: Long,
                                   model: Map[String, Double],
                                   maxLen: Int): Map[String, Double] = {
    val cps = BpeTrain.charSymsLocal(w)
    val n = cps.length
    def piece(from: Int, len: Int): String = cps.slice(from, from + len).mkString
    val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i))
      model.get(piece(i - l, l)).foreach(p => alpha(i) += p * alpha(i - l))
    val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
    for (j <- (n - 1) to 0 by -1; l <- 1 to math.min(maxLen, n - j))
      model.get(piece(j, l)).foreach(p => beta(j) += p * beta(j + l))
    val z = alpha(n)
    if (z <= 0) Map.empty
    else {
      val e = scala.collection.mutable.HashMap.empty[String, Double]
      for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
        val pc = piece(i - l, l)
        model.get(pc).foreach { p =>
          val c = alpha(i - l) * p * beta(i) / z * cnt
          if (c > 0) e(pc) = e.getOrElse(pc, 0.0) + c
        }
      }
      e.toMap
    }
  }

  /** Local Viterbi with the same tie-break (longer piece wins) and
    * unk fallback — the reference for [[encodeViterbi]]. */
  private[graft] def viterbiLocal(w: String, logp: Map[String, Double],
                                  maxLen: Int): Array[String] = {
    val cps = BpeTrain.charSymsLocal(w)
    val n = cps.length
    def piece(from: Int, len: Int): String = cps.slice(from, from + len).mkString
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val bl = Array.fill(n + 1)(0)
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      val pc = piece(i - l, l)
      val lp = logp.get(pc).orElse(if (l == 1) Some(UnkLogProb) else None)
      lp.foreach { v =>
        if (best(i - l) > Double.NegativeInfinity) {
          val cand = best(i - l) + v
          if (cand > best(i) || (cand == best(i) && l > bl(i))) {
            best(i) = cand; bl(i) = l
          }
        }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += piece(pos - bl(pos), bl(pos)); pos -= bl(pos) }
    out.reverse.toArray
  }
}

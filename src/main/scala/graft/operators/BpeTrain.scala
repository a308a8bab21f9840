package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * the GPT-2/LLaMA tokenizer training recipe): iteratively merge the
  * most frequent adjacent symbol pair, starting from per-character
  * symbols.
  *
  * Scale shape — train on the WORD-COUNT VOCABULARY, never the
  * corpus: real BPE trainers aggregate the corpus to (word, count)
  * first because every occurrence of a word contributes identically,
  * so each merge round is a job over the vocabulary (≪ corpus, and
  * sublinear in corpus growth) weighted by the counts. Here that is
  * one corpus exchange up front ([[vocab]]: groupBy word with full
  * map-side combine), then per round: one explode → (pair)-keyed sum
  * aggregation → a 1-row argmax collect, and a higher-order
  * `aggregate` rewrite of the symbol arrays INSIDE each row (the
  * greedy left-to-right merge — no explode, no shuffle). Rounds pin
  * their vocabulary and release the superseded round's blocks (the
  * [[ConnectedComponents]] storage discipline), so lineage stays
  * flat and block-manager storage is O(vocab).
  *
  * House split (the q58/q76/q85 precedent): the initial weighted
  * pair-count table — the data-shaped surface every round's argmax
  * is an instance of — is the q86 oracle (exact int64 counts,
  * deterministic (cnt desc, pair asc) order); the merge LOOP is
  * driver-iterative by nature (each round depends on the previous
  * argmax) and is spec-gated on the literature's hand-computable
  * example (low/lower/newest/widest).
  */
object BpeTrain {

  /** Corpus → word-count vocabulary (empty words from whitespace
    * runs dropped; one corpus exchange, map-side combined). */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Per-character initial symbol array. */
  def charSyms(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Adjacent-pair weighted counts over a (syms, cnt) vocabulary:
    * one explode of within-row zipped neighbors → keyed sum. */
  def pairCounts(v: DataFrame): DataFrame = {
    val pairs = zip_with(
      slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
      slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
      (a, b) => struct(a.as("lft"), b.as("rgt")))
    v.select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Greedy left-to-right application of ONE merge (a, b) → a+b to a
    * symbol array, entirely inside the row: a fold whose accumulator
    * appends the symbol, or replaces its own last element when it is
    * `a` and the incoming symbol is `b`. Non-overlapping by
    * construction — a just-merged element equals a+b, which can never
    * equal `a` (b is non-empty), so "aaa" under (a,a) becomes
    * [aa, a], exactly the reference algorithm. */
  def mergeSyms(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
          .otherwise(concat(acc, array(s))))

  /** Train `rounds` merges over the corpus. Returns the merge table
    * (rank, lft, rgt, merged) — rank 1 first — possibly shorter than
    * `rounds` if the vocabulary runs out of adjacent pairs. Ties on
    * count break (lft asc, rgt asc), making the whole table
    * deterministic for any partitioning. */
  def train(docs: DataFrame, rounds: Int): Seq[(Int, String, String, String)] = {
    var v = vocab(docs)
      .select(charSyms(col("w")).as("syms"), col("cnt"))
      .transform(Pin(_, eager = true))
    var pinned = v
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("lft"), col("rgt"))
        .limit(1).collect() // 1 row by construction
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((r, a, b, a + b))
        v = v.select(mergeSyms(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))
          .transform(Pin(_, eager = true))
        Pin.release(pinned)
        pinned = v
      }
    }
    Pin.release(pinned)
    merges.toSeq
  }

  /** Tokenize a text column with a trained merge table: per word,
    * start from characters and fold the merges in rank order; emit
    * the concatenated token stream. The merge table is INLINED into
    * the expression tree (one `aggregate` per merge — the
    * ivfLearned literal-core precedent), so this is the bounded-
    * merge-list path: fine for the spec/eval scale it serves; a
    * production encoder with 10k+ merges would iterate the same
    * fold as `rounds` distributed passes instead of one expression. */
  def encode(text: Column, merges: Seq[(Int, String, String, String)]): Column =
    flatten(transform(
      filter(split(trim(text), " "), w => length(w) > 0),
      w => merges.sortBy(_._1).foldLeft(charSyms(w)) {
        case (acc, (_, a, b, _)) => mergeSyms(acc, lit(a), lit(b))
      }))

  /** The PRODUCTION encoder shape for large merge tables: instead of
    * inlining every merge into one expression tree ([[encode]] —
    * fine for bounded tables, but 10k+ nested `aggregate`s would sink
    * codegen), apply the merges as `rounds` ITERATIVE projections
    * over a staged symbol-array column — each pass one stateless map,
    * vocabulary-agnostic, with the [[ConnectedComponents]]
    * pin/release keeping lineage flat (an unpinned 10k-deep
    * expression lineage is its own stack overflow). Emits
    * (original columns..., tokens array<string>); exactly equal to
    * [[encode]] by construction (same fold, spec-pinned). */
  def encodeIter(docs: DataFrame, textCol: String,
                 merges: Seq[(Int, String, String, String)],
                 pinEvery: Int = 64): DataFrame = {
    val words = filter(split(trim(col(textCol)), " "), w => length(w) > 0)
    var cur = docs.withColumn("__syms",
      transform(words, w => charSyms(w)))
    var sincePin = 0
    for ((_, a, b, _) <- merges.sortBy(_._1)) {
      cur = cur.withColumn("__syms",
        transform(col("__syms"), s => mergeSyms(s, lit(a), lit(b))))
      sincePin += 1
      if (sincePin >= pinEvery) {
        val pinned = Pin(cur, eager = true)
        Pin.release(cur)
        cur = pinned
        sincePin = 0
      }
    }
    cur.withColumn("tokens", flatten(col("__syms"))).drop("__syms")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication building blocks (exact, shingle-Jaccard,
  * MinHash+LSH, SimHash) — the LLM-pipeline operators the reference
  * repo's corpus prep implies but never needed at its scale.
  *
  * Scale design (SURVEY.md §5): nothing here ever does all-pairs.
  *  - exact: ONE hash aggregation on the normalized fingerprint.
  *  - Jaccard: explode joins are bounded per shingle bucket.
  *  - MinHash/LSH: candidate pairs exist only inside (band, band-key)
  *    buckets — the join key is the banded signature hash, so the
  *    shuffle is keyed and bounded, never quadratic.
  *  - SimHash: pairs only inside a 16-bit prefix bucket.
  * The per-shingle md5 hash is computed ONCE per shingle, then k=32
  * affine permutations fold over the cached hash array — all inside
  * whole-stage codegen (transform/aggregate, no UDFs).
  */
object Dedup {

  /** Mersenne prime 2^31-1: modulus of the affine MinHash permutations. */
  val P: Long = 2147483647L
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4

  /** Distinct word n-gram shingles from single-space text (docs with
    * fewer than n words are dropped — they have no shingle set).
    * Array-per-doc form; fine for small inputs and tests. */
  def shingled(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("ws", split(trim(col("text")), " "))
      .filter(size(col("ws")) >= n)
      .withColumn("sh", array_distinct(expr(
        s"transform(sequence(0, size(ws) - $n), i -> " +
          (1 to n).map(j => s"element_at(ws, i + $j)").mkString("concat_ws(' ', ", ", ", "))"))))
      .drop("ws")

  /** Same shingle SET as [[shingled]], but as distinct (doc_id, g)
    * ROWS built from posexplode + window leads — everything stays in
    * whole-stage codegen (the per-row transform lambda above runs
    * interpreted and dominates MinHash wall-clock at scale). One
    * shuffle on doc_id (sort for the leads) + one distinct.
    *
    * `dedup = false` skips the distinct (and its shuffle): correct for
    * any consumer invariant under duplicate shingles — MIN aggregation
    * (MinHash) sees the same minimum over a multiset as over its set.
    * Jaccard's intersection COUNTS are not invariant: q35 keeps the
    * set form.
    *
    * `maxDocFreq`: stop-shingle guard. A shingle present in more than
    * this many DISTINCT documents is dropped entirely — at corpus
    * scale one boilerplate phrase shared by 10⁶ docs otherwise turns
    * its LSH/Jaccard bucket into a 10¹²-pair quadratic hot spot. The
    * hot set is tiny by construction (only shingles above the bound),
    * so the anti-join broadcasts; hot shingles carry no dedup signal
    * (they don't discriminate between documents), which is why
    * dropping them is the standard guard rather than a recall loss. */
  def shingleRows(docs: DataFrame, n: Int = 3, dedup: Boolean = true,
                  maxDocFreq: Option[Long] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val leadCols = (1 until n).map(j => lead(col("w"), j).over(w).as(s"w$j"))
    val exploded = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), " ")).as(Seq("i", "w")))
      .select(col("doc_id") +: col("w") +: leadCols: _*)
    val complete = if (n > 1) exploded.filter(col(s"w${n - 1}").isNotNull) else exploded
    val rows = complete
      .select(col("doc_id"),
        concat_ws(" ", col("w") +: (1 until n).map(j => col(s"w$j")): _*).as("g"))
    val out = if (dedup) rows.distinct() else rows
    maxDocFreq.fold(out) { t =>
      val hot = out.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("df_"))
        .filter(col("df_") > t)
        .select(col("g"))
      out.join(hot, Seq("g"), "left_anti")
    }
  }

  /** k-wide MinHash signature: sig[i] = min over shingles of
    * ((2i+3)·h + (5i+7)) mod P, with h the portable 48-bit md5 hash
    * mod P (== DuckDB ('0x'||substr(md5(s),1,12))::BIGINT % P).
    *
    * Shape: shingle rows → one md5 per (doc, shingle) row → 32
    * codegen'd MIN aggregates with map-side partial aggregation.
    * (A per-row transform/array_min lambda nest computes the same
    * thing but runs interpreted per element — 15x slower at sf0.1.)
    */
  def withSignature(shingleRows: DataFrame): DataFrame = {
    val h = expr(s"CAST(conv(substr(md5(g), 1, 12), 16, 10) AS BIGINT) % $P")
    val mins = (0 until NumHashes).map(i =>
      min((lit(2 * i + 3) * col("h") + lit(5 * i + 7)) % P).as(s"m$i"))
    shingleRows
      .withColumn("h", h)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .withColumn("sg", array((0 until NumHashes).map(i => col(s"m$i")): _*))
      .select(col("doc_id"), col("sg"))
  }

  /** Explode signatures into (band, bkey) LSH buckets. */
  def lshBuckets(signed: DataFrame): DataFrame =
    signed
      .withColumn("b", explode(sequence(lit(0), lit(Bands - 1))))
      .withColumn("bkey", md5(array_join(
        transform(slice(col("sg"), col("b") * RowsPerBand + 1, lit(RowsPerBand)),
          v => v.cast("string")), ",")))

  /** Estimated Jaccard from two signatures: matching fraction (k a
    * power of two → the division is exact in float64). */
  def signatureSimilarity(sa: Column, sb: Column): Column =
    size(filter(zip_with(sa, sb, (x, y) => x === y), v => v))
      .cast("double") / NumHashes

  /** SimHash banding: 6 bands × 10 bits over the 60-bit hash. */
  val SimBands = 6
  val SimBandBits = 10

  /** Near-dup pairs from a (doc_id, simhash) table via multi-band
    * bucketing: candidates share ANY of the [[SimBands]] bands; the
    * full hamming distance is computed only for deduped candidates.
    * Pigeonhole guarantee: a pair with hamming < [[SimBands]] differs
    * in at most SimBands-1 bands, so at least one band matches — 100%
    * recall for hamming ≤ 5 at 6 bands. Beyond that, recall is the
    * probability some band escapes all flips. A single prefix band,
    * by contrast, misses ~half of all hamming-2 pairs: any flip
    * inside the prefix hides the pair.
    *
    * Band width is the standard Manku-et-al selectivity/recall dial:
    * fewer, wider bands (4×15) give 32x more bucket values per band
    * (smaller buckets at huge corpus sizes) but only guarantee
    * hamming ≤ 3; more, narrower bands raise the guarantee but
    * concentrate buckets. 6×10 fits this corpus (votes over short
    * docs are noisy, so true near-dups reach hamming ~9); a 10⁹-doc
    * deployment would widen bands (or key tables on block PAIRS,
    * Manku §3) and lower `maxHamming` to match its doc lengths.
    *
    * Scale shape: bands are slim (doc_id, b, bkey) rows; the
    * self-join is hash-keyed on (band, bkey), never all-pairs; the
    * 8-byte hashes join back once per deduped pair.
    */
  def simhashPairs(base: DataFrame, maxHamming: Int = 12): DataFrame = {
    val bands = base
      .withColumn("b", explode(sequence(lit(0), lit(SimBands - 1))))
      .withColumn("bkey", expr(s"shiftright(simhash, b * $SimBandBits) % ${1 << SimBandBits}"))
      .select(col("doc_id"), col("b"), col("bkey"))
    val cand = bands.select(col("doc_id").as("a"), col("b"), col("bkey"))
      .join(bands.select(col("doc_id").as("b_id"), col("b"), col("bkey")), Seq("b", "bkey"))
      .filter(col("a") < col("b_id"))
      .select(col("a"), col("b_id")).distinct()
    cand
      .join(base.select(col("doc_id").as("a"), col("simhash").as("ha")), Seq("a"))
      .join(base.select(col("doc_id").as("b_id"), col("simhash").as("hb")), Seq("b_id"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b_id").as("b"), col("hamming"))
  }
}

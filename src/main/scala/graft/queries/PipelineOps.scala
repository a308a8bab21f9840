package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Quality, SequencePack, TrainTestSplit}

/** q96: the END-TO-END PRETRAINING CAPSTONE — the full corpus →
  * training-stream path as ONE job graph, every stage an
  * already-oracle-checked operator:
  *
  *   clean (q78: exact-dedup survivors → Gopher repetition keep →
  *   PII redact) → surgical decontamination against the raw held-out
  *   benchmark (q81) → near-dup pairs on the CLEANED text (q36
  *   machinery) → leakage-free train/test split keyed on cluster id
  *   (q95) → per-language mixture sampling of the train slice (q68)
  *   → 2048-token sequence packing (q67) → per-bin summary.
  *
  * What the composition proves (and PlanSpec gates): the stages
  * chain WITHOUT redundant corpus scans — the raw table is read
  * ONCE for the clean stage and once (column-pruned, bench-filtered
  * sliver) for the benchmark windows; everything downstream flows
  * from the pinned decontaminated corpus, which is materialized a
  * single time and fans out to the pair/split/mixture branches. No
  * global sort runs mid-pipeline ([[Quality.cleanCorpusRaw]] — the
  * composable form without q78's presentation sort).
  *
  * Composition choices (the semantics a real pipeline wants):
  *  - benchmark windows come from the RAW benchmark text (doc_id <
  *    20, the q71/q81 stand-in) — the eval set is external and
  *    unredacted; cleaning must not weaken the decontamination;
  *  - near-dup pairs and the leakage-free split run on the CLEANED,
  *    DECONTAMINATED text — grouping must reflect what the model
  *    will actually see;
  *  - the q36 stop-shingle guard is omitted: the corpus is already
  *    exact-deduped by the clean stage and the guard's broadcast is
  *    corpus-profile-dependent (at 100 TB you would enable it; the
  *    oracle mirrors the unguarded formula exactly);
  *  - only the `train` split is mixed and packed — valid/test stay
  *    untouched, which is the entire point of the split.
  */
object PipelineOps extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("text"))

  val BenchDocs = 20L
  val SubL = 40
  val Capacity = 2048L
  private val WEn = 1500L
  private val WOther = 250L

  /** Stage A, UNPINNED — the PlanSpec gate surface: cleaned corpus
    * (exact-dedup survivors → repetition keep → PII redact) unioned
    * with the RAW benchmark sliver. Exactly TWO parquet scans: the
    * full corpus (clean branch) and the doc_id-pushed benchmark
    * filter — the gate counts them, locking "no redundant scans"
    * for the whole capstone's corpus-reading front. */
  def cleanPlusBench(raw: DataFrame): DataFrame =
    raw.filter(col("doc_id") < BenchDocs)
      .unionByName(Quality.cleanCorpusRaw(raw)
        .filter(col("doc_id") >= BenchDocs)
        .select(col("doc_id"), col("red_text").as("text")))

  /** The CALLABLE capstone (round 13): `raw` must carry (doc_id,
    * text). Optional TAIL STAGES between the split and the packer —
    * the two ordering/selection operators the round-12 verdict asked
    * to compose ([[graft.operators.Curriculum]]):
    *
    *  - `budgetPerSource`: per-source token-budget selection of the
    *    train slice (q99's operator, pre-prune ON) — `raw` must then
    *    also carry `source`;
    *  - `curriculumTail`: the packed stream follows q98's curriculum
    *    order (phase buckets on the CLEANED text's quality score +
    *    seeded in-phase shuffle) instead of doc_id order.
    *
    * Defaults leave the stream byte-identical to the q96 oracle. */
  def capstone(raw: DataFrame,
               curriculumTail: Boolean = false,
               budgetPerSource: Option[Long] = None): DataFrame = {
    // PINNED before the strip: decontaminateStrip references its
    // training side twice (window join + final left join) — unpinned
    // that would re-run the entire clean pipeline per reference
    val unioned = cleanPlusBench(raw.select(col("doc_id"), col("text")))
      .transform(graft.operators.Pin(_))
    val decon = Dedup.decontaminateStrip(unioned, col("doc_id") < BenchDocs, SubL)
      .select(col("doc_id"), col("clean_text"))
      // ONE materialization fans out to the pair, split-probe and
      // mixture branches (the minhashPairs signature-pin discipline)
      .transform(graft.operators.Pin(_))
    val sig = Dedup.withSignatureFromHashes(
      Dedup.shingleHashRows(
        decon.select(col("doc_id"), col("clean_text").as("text"))))
      .transform(graft.operators.Pin(_))
    val pairs = Dedup.minhashPairsOwned(sig)
    val split = TrainTestSplit.leakageFree(decon.select(col("doc_id")), pairs)
    val train = decon.join(
      split.filter(col("split") === "train").select(col("doc_id")),
      Seq("doc_id"))
    // optional tail: best-N-tokens per source (slim id join back)
    val selected = budgetPerSource match {
      case Some(b) =>
        val kept = graft.operators.Curriculum.tokenBudget(
          train.join(raw.select(col("doc_id"), col("source")), Seq("doc_id")),
          b, TextFunctions.qualityScore(col("clean_text")),
          bpeTokenCount(col("clean_text")))
        train.join(kept.select(col("doc_id")), Seq("doc_id"))
      case None => train
    }
    // optional tail: curriculum stream order (default = doc_id order,
    // exactly the round-12 stream the oracle mirrors)
    val ordered =
      if (curriculumTail)
        selected.join(graft.operators.Curriculum.curriculumOrder(
          selected, TextFunctions.qualityScore(col("clean_text")))
          .select(col("doc_id"), col("pos")), Seq("doc_id"))
      else selected.withColumn("pos", col("doc_id"))
    val mix = ordered
      .withColumn("_st", textStats(col("clean_text")))
      .withColumn("lang_pred",
        when(col("_st.n_stop") / col("_st.n_words") >= 0.05, "en")
          .otherwise("other"))
      .withColumn("w", when(col("lang_pred") === "en", WEn).otherwise(WOther))
      .withColumn("n_copies",
        (col("w") / 1000).cast("bigint") +
          when(TextFunctions.hashBucket(col("doc_id"), "mix_", 1000) < col("w") % 1000, 1L)
            .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("pos"), bpeTokenCount(col("clean_text")).as("tok"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
    SequencePack.withBin(mix, col("tok"),
      Seq(col("pos"), col("doc_id"), col("copy")), Capacity)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), sum(col("tok")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))
  }

  private def q96(s: SparkSession, dir: String): DataFrame =
    capstone(docs(s, dir))

  // ---------------- Incremental capstone (round 13) ----------------
  // q90's delta-vs-base shape extended through the capstone's front:
  // the DAILY-INGEST deployment reruns nothing on the base — it
  // persists two indexes at base-ingest time and runs the pipeline on
  // the delta alone, with two slim index joins where the batch form
  // had corpus-wide self-joins.

  /** The capstone's decon FRONT on arbitrary tables: clean (q78
    * stages) → surgical strip (q81) against an EXPLICIT raw benchmark
    * table (ids must be disjoint from `raw`'s). Emits (doc_id,
    * clean_text). */
  def deconFront(raw: DataFrame, bench: DataFrame): DataFrame = {
    val unioned = bench.select(col("doc_id"), col("text"))
      .withColumn("_is_bench", lit(true))
      .unionByName(Quality.cleanCorpusRaw(raw.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("red_text").as("text"))
        .withColumn("_is_bench", lit(false)))
      .transform(graft.operators.Pin(_))
    Dedup.decontaminateStrip(unioned, col("_is_bench"), SubL)
      .select(col("doc_id"), col("clean_text"))
  }

  /** The near-dup SURVIVOR set of the front (clean → strip → q36
    * pairs on the cleaned text → min-id cluster survivor) — the batch
    * form the incremental path decomposes; the spec's equivalence
    * baseline. */
  def frontSurvivors(raw: DataFrame, bench: DataFrame): DataFrame = {
    val decon = deconFront(raw, bench).transform(graft.operators.Pin(_))
    val sig = Dedup.withSignatureFromHashes(Dedup.shingleHashRows(
      decon.select(col("doc_id"), col("clean_text").as("text"))))
      .transform(graft.operators.Pin(_))
    graft.operators.ConnectedComponents.survivors(
      decon, Dedup.minhashPairsOwned(sig))
  }

  /** The two base-side indexes a deployment persists once at
    * base-ingest time:
    *  - `rawFp`: distinct fingerprints of ALL raw base docs (q90's
    *    exact-dedup index — over raw rows, not survivors: the batch
    *    clean dedups before its keep filters, so a delta copy of a
    *    later-dropped base doc is still never resurrected);
    *  - `deconBands`: the LSH band index (b, bkey, sg) of the base's
    *    DECONTAMINATED text — the near-dup side a delta probes.
    * At deployment both are parquet tables written at ingest; here
    * they are DataFrames the caller may Pin. */
  final case class BaseIndexes(rawFp: DataFrame, deconBands: DataFrame)

  def baseIndexes(rawBase: DataFrame, bench: DataFrame): BaseIndexes = {
    val decon = deconFront(rawBase, bench)
    val sig = Dedup.withSignatureFromHashes(Dedup.shingleHashRows(
      decon.select(col("doc_id"), col("clean_text").as("text"))))
    BaseIndexes(
      rawBase.select(TextFunctions.fingerprint(col("text")).as("fp")).distinct(),
      Dedup.lshBuckets(sig).select(col("b"), col("bkey"), col("sg")))
  }

  /** The DEPLOYMENT shape of [[BaseIndexes]]: persist both indexes as
    * BUCKETED + SORTED parquet tables ([[graft.operators.Bucketing]] —
    * rawFp on `fp`, deconBands on `(b, bkey)`, the exact join keys the
    * incremental path probes) and return a [[BaseIndexes]] reading
    * them back through the catalog. The payoff is the whole point of
    * persisting: every nightly [[incrementalCapstone]] run's fp
    * anti-join and band probe plan with ZERO exchanges on the index
    * side — the base corpus is shuffled once at ingest, never per
    * delta (plan-gated in OrderPipelineSpec; `buckets` should match
    * `spark.sql.shuffle.partitions` so the delta side's exchange
    * co-partitions without a second shuffle). Tables are
    * `<prefix>_rawfp` / `<prefix>_bands` under `basePath`. */
  def persistBaseIndexes(idx: BaseIndexes, basePath: String,
                         prefix: String = "graft_baseidx",
                         buckets: Int = 32): BaseIndexes = {
    graft.operators.Bucketing.writeBucketed(
      idx.rawFp, s"${prefix}_rawfp", s"$basePath/rawfp", Seq("fp"), buckets)
    graft.operators.Bucketing.writeBucketed(
      idx.deconBands, s"${prefix}_bands", s"$basePath/bands",
      Seq("b", "bkey"), buckets)
    val spark = idx.rawFp.sparkSession
    BaseIndexes(spark.table(s"${prefix}_rawfp"), spark.table(s"${prefix}_bands"))
  }

  /** DEPLOYMENT index growth: append a batch's index delta to the
    * persisted bucketed tables from [[persistBaseIndexes]]. Spark
    * appends NEW per-bucket files under the same bucket spec, so the
    * hash-partitioning metadata — and therefore the zero-exchange
    * probe plans — survive every append; what degrades is the file
    * count (one file set per append) and the cross-file sort, which
    * the nightly [[compactBaseIndexes]] restores. Appended rows are
    * disjoint from the existing ones by construction:
    * [[incrementalStep]] emits only base-unseen fingerprints and only
    * fresh docs' band rows. */
  def appendBaseIndexes(delta: BaseIndexes,
                        prefix: String = "graft_baseidx",
                        buckets: Int = 32): Unit = {
    // repartition on the bucket keys so each append adds ONE file per
    // bucket, not one per (task, bucket) — the Bucketing.writeBucketed
    // argument
    delta.rawFp.repartition(buckets, col("fp"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(s"${prefix}_rawfp")
    delta.deconBands.repartition(buckets, col("b"), col("bkey"))
      .write.mode("append").format("parquet")
      .bucketBy(buckets, "b", "bkey").sortBy("b", "bkey")
      .saveAsTable(s"${prefix}_bands")
  }

  /** The NIGHTLY COMPACTION job the streaming capstone's scaladoc
    * promises: rewrite each index table's accumulated file sets
    * (base + every appended delta) as one fresh bucketed+sorted copy
    * under `compactPath`, then swap the catalog NAME to the new copy.
    * The swap is the commit point: the compacted files are fully
    * materialized (and `saveAsTable` has committed them) before the
    * old name is dropped, so any reader resolves either the complete
    * old table or the complete new one — never a half-written mix.
    * Old data files are left on disk (the tables are external);
    * retire `basePath` out-of-band once no running job references it.
    * Returns the compacted [[BaseIndexes]] read back through the
    * catalog — same rows, same zero-exchange probe plans, one file
    * set per bucket again (OrderPipelineSpec gates all three). */
  def compactBaseIndexes(spark: SparkSession, compactPath: String,
                         prefix: String = "graft_baseidx",
                         buckets: Int = 32): BaseIndexes = {
    def compactOne(table: String, path: String, keyCols: Seq[String]): Unit = {
      val tmpTable = s"${table}_compacting"
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
      // read the table's FILES, not the catalog table: over a bucketed
      // scan the planner elides writeBucketed's aligning repartition
      // (the bucket spec satisfies it) and THEN disables the bucketed
      // scan as unnecessary — leaving arbitrary file-split tasks that
      // each write a file per bucket they hold (measured: 127 files
      // for 32 buckets). A plain parquet scan keeps the exchange and
      // the one-file-per-bucket output.
      val location = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location.toString
      graft.operators.Bucketing.writeBucketed(
        spark.read.parquet(location), tmpTable, path, keyCols, buckets)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
    }
    compactOne(s"${prefix}_rawfp", s"$compactPath/rawfp", Seq("fp"))
    compactOne(s"${prefix}_bands", s"$compactPath/bands", Seq("b", "bkey"))
    BaseIndexes(spark.table(s"${prefix}_rawfp"),
      spark.table(s"${prefix}_bands"))
  }

  /** The INCREMENTAL capstone front: clean → decontaminate → dedup
    * the DELTA against the base indexes + itself. Equivalence
    * contract (spec-pinned, soaked at 500k/5k): when delta ids exceed
    * base ids — the daily-ingest reality — the output equals
    * [[frontSurvivors]] of base ∪ delta RESTRICTED to delta ids.
    * Decomposition (and why it is exact):
    *  1. raw-fp LEFT ANTI vs `rawFp` (q90): batch's fp groups that
    *     span base+delta keep the base row (min id), so every
    *     base-seen delta fp drops — row-local, order-free;
    *  2. clean + strip on the surviving delta alone — all per-row
    *     stages (the within-delta dedup is the same min_by);
    *  3. near-dup: delta band rows probe `deconBands` ((b, bkey)
    *     equi-join + the same signature filter) — a delta doc hitting
    *     base is in a batch cluster whose min is a base id, so it and
    *     its WHOLE within-delta cluster drop (batch connects them
    *     through the base doc); delta-only clusters keep their min id
    *     via the same ConnectedComponents survivor rule. Two delta
    *     docs connected only THROUGH a base doc each band-hit it
    *     directly, so both drop without the bridge being materialized.
    * Scale shape: everything is delta-sized except the two index
    * joins (fp anti-join and the (b, bkey) probe — both keyed,
    * SHUFFLE_HASH-pinned; at deployment the band probe's build side
    * is the delta, both indexes are bucketed parquet). */
  def incrementalCapstone(idx: BaseIndexes, rawDelta: DataFrame,
                          bench: DataFrame): DataFrame =
    incrementalFront(idx, rawDelta, bench)._1

  /** One incremental step PLUS the index delta: the batch's survivors
    * and the rows to append to the base indexes so the NEXT delta
    * dedups against this one — the micro-batch unit of the streaming
    * capstone ([[graft.streaming.StreamCapstone]]). The delta is
    * sufficient by the same decomposition argument: new distinct raw
    * fingerprints (base-seen fps are already indexed, and identical
    * raw text decontaminates identically, so a dropped fp-dup's bands
    * are its base twin's), and the band rows of ALL the batch's
    * decontaminated docs — including docs the near-dup stage then
    * drops, exactly as [[baseIndexes]] indexes the base's deconFront
    * (pre-survivor), so a later doc connected only THROUGH a dropped
    * one still band-hits it. */
  def incrementalStep(idx: BaseIndexes, rawDelta: DataFrame,
                      bench: DataFrame): (DataFrame, BaseIndexes) = {
    val (survivors, fresh, sig) = incrementalFront(idx, rawDelta, bench)
    (survivors, BaseIndexes(
      fresh.select(TextFunctions.fingerprint(col("text")).as("fp")).distinct(),
      Dedup.lshBuckets(sig).select(col("b"), col("bkey"), col("sg"))))
  }

  private def incrementalFront(idx: BaseIndexes, rawDelta: DataFrame,
                               bench: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val fresh = rawDelta
      .withColumn("_fp", TextFunctions.fingerprint(col("text")))
      .join(idx.rawFp.select(col("fp").as("_fp")).hint("SHUFFLE_HASH"),
        Seq("_fp"), "left_anti")
      .drop("_fp")
    val decon = deconFront(fresh, bench).transform(graft.operators.Pin(_))
    val sig = Dedup.withSignatureFromHashes(Dedup.shingleHashRows(
      decon.select(col("doc_id"), col("clean_text").as("text"))))
      .transform(graft.operators.Pin(_))
    // hint on the DELTA side: the shuffled-hash build must be the
    // delta's band rows (delta-sized at ANY index size), never the
    // index's — a build-side index hash map is corpus-sized per task
    // and OOMed the 5M-doc soak (40M band rows × signature arrays);
    // the bucketed index side streams through the probe with zero
    // exchange either way (OrderPipelineSpec plan gate).
    val hitsBase = Dedup.lshBuckets(sig).hint("SHUFFLE_HASH")
      .join(idx.deconBands
        .select(col("b"), col("bkey"), col("sg").as("_bsg")), Seq("b", "bkey"))
      .filter(Dedup.signatureSimilarity(col("sg"), col("_bsg")) >= 0.5)
      .select(col("doc_id")).distinct()
    val cl = graft.operators.ConnectedComponents.clusters(
      Dedup.minhashPairsOwned(sig))
    val hitClusters = cl
      .join(hitsBase.select(col("doc_id").as("node")), Seq("node"))
      .select(col("cluster_id")).distinct()
    val drops = hitsBase
      .unionAll(cl.join(hitClusters, Seq("cluster_id"))
        .select(col("node").as("doc_id")))
      .unionAll(cl.filter(col("node") =!= col("cluster_id"))
        .select(col("node").as("doc_id")))
      .distinct()
    (decon.join(drops, Seq("doc_id"), "left_anti"), fresh, sig)
  }

  // The chained oracle mirror: q78's clean CTEs → q81's strip CTEs
  // (benchmark windows from RAW bench text) → q36's unguarded pair
  // formula on the decontaminated text → q95's recursive closure +
  // bucket split → q68's mixture gates → q67's prefix-sum packing.
  // Every fragment is the corresponding query's oracle with the text
  // source substituted; constants are shared with the Spark side.
  private val q96Sql = {
    val red = s"""regexp_replace(regexp_replace(regexp_replace(text,
       |    '${Quality.EmailRe}', '<EMAIL>', 'g'),
       |    '${Quality.IpRe}', '<IP>', 'g'),
       |    '${Quality.PhoneRe}', '<PHONE>', 'g')""".stripMargin
    s"""WITH RECURSIVE f AS (SELECT doc_id, text,
       |    md5(lower(trim(regexp_replace(text, '$WsPlusRe', ' ', 'g')))) AS fp
       |  FROM documents),
       |surv AS (SELECT doc_id, text FROM
       |  (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY fp) AS canon FROM f)
       |  WHERE doc_id = canon),
       |d0 AS (SELECT doc_id, text, string_split(trim(text), ' ') AS ws,
       |    length(replace(text, ' ', '')) AS tot FROM surv),
       |g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
       |         i -> ws[i] || ' ' || ws[i+1])) AS g
       |       FROM d0 WHERE len(ws) >= 2),
       |c2 AS (SELECT doc_id, max(cnt * (length(g) - 1)) AS top2_cov
       |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2)
       |       GROUP BY 1),
       |g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
       |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS g
       |       FROM d0 WHERE len(ws) >= 5),
       |c5 AS (SELECT doc_id, sum(cnt * (length(g) - 4)) AS dup5_cov
       |       FROM (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2)
       |       WHERE cnt > 1 GROUP BY 1),
       |keepd AS (SELECT d0.doc_id, $red AS ct
       |  FROM d0 LEFT JOIN c2 USING (doc_id) LEFT JOIN c5 USING (doc_id)
       |  WHERE coalesce(top2_cov, 0) * 5 <= d0.tot
       |    AND coalesce(dup5_cov, 0) * 20 <= 3 * d0.tot),
       |bw AS (SELECT DISTINCT substr(text, CAST(i AS INT), $SubL) AS slice
       |       FROM (SELECT text, unnest(range(1, greatest(length(text) - ${SubL - 1}, 0) + 1)) AS i
       |             FROM documents WHERE doc_id < $BenchDocs)),
       |tr AS (SELECT doc_id, ct, length(ct) AS n FROM keepd WHERE doc_id >= $BenchDocs),
       |occ AS (SELECT doc_id, ct, unnest(range(0, greatest(n - ${SubL - 1}, 0))) AS pos FROM tr),
       |rem AS (SELECT o.doc_id, o.pos FROM occ o
       |        JOIN bw ON substr(o.ct, CAST(o.pos + 1 AS INT), $SubL) = bw.slice),
       |rem2 AS (SELECT doc_id, pos,
       |    CASE WHEN pos <= coalesce(max(pos + $SubL) OVER (PARTITION BY doc_id ORDER BY pos
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 0 ELSE 1 END AS brk
       |  FROM rem),
       |rem3 AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM rem2),
       |iv AS (SELECT doc_id, min(pos) AS s, max(pos) + $SubL AS e FROM rem3 GROUP BY doc_id, grp),
       |tails AS (SELECT doc_id, max(e) AS ks FROM iv GROUP BY doc_id),
       |segs AS (
       |  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ks, s AS ke FROM iv
       |  UNION ALL
       |  SELECT t.doc_id, t.ks, tr.n AS ke FROM tails t JOIN tr USING (doc_id)
       |),
       |cln AS (SELECT s.doc_id,
       |    string_agg(substr(tr.ct, CAST(s.ks + 1 AS INT), CAST(greatest(s.ke - s.ks, 0) AS INT)), '' ORDER BY s.ks) AS dt
       |  FROM segs s JOIN tr USING (doc_id) GROUP BY s.doc_id),
       |dd AS (SELECT tr.doc_id, CASE WHEN c.dt IS NULL THEN tr.ct ELSE c.dt END AS dt
       |       FROM tr LEFT JOIN cln c USING (doc_id)),
       |dw AS (SELECT doc_id, string_split(trim(dt), ' ') AS ws FROM dd),
       |sh AS (SELECT doc_id, list_transform(range(1, len(ws)-1), i -> CAST(('0x'||substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]),1,12)) AS BIGINT) % ${Dedup.P}) AS sh
       |      FROM dw WHERE len(ws) >= 3),
       |sig AS (SELECT doc_id, list_transform(range(0, ${Dedup.NumHashes}), i -> list_min(list_transform(sh, h -> ((2*i+3)*h + (5*i+7)) % ${Dedup.P}))) AS sg FROM sh),
       |bands AS (SELECT doc_id, sg, b, md5(array_to_string(sg[b*${Dedup.RowsPerBand}+1 : b*${Dedup.RowsPerBand}+${Dedup.RowsPerBand}], ',')) AS bkey
       |          FROM sig, range(0, ${Dedup.Bands}) t(b)),
       |cand AS (SELECT a.doc_id AS a, b.doc_id AS b, first(a.sg) AS sa, first(b.sg) AS sb
       |         FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |         GROUP BY a.doc_id, b.doc_id),
       |prs AS (SELECT a, b FROM cand
       |        WHERE CAST(list_sum(list_transform(range(1, ${Dedup.NumHashes + 1}), i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) AS DOUBLE) / ${Dedup.NumHashes} >= 0.5),
       |edges AS (SELECT a AS x, b AS y FROM prs
       |          UNION ALL SELECT b AS x, a AS y FROM prs),
       |r(node, m) AS (
       |  SELECT DISTINCT x, x FROM edges
       |  UNION
       |  SELECT e.x, r.m FROM edges e JOIN r ON r.node = e.y),
       |cl AS (SELECT node, min(m) AS cluster_id FROM r GROUP BY node),
       |gk AS (SELECT dd.doc_id, dd.dt, coalesce(cl.cluster_id, dd.doc_id) AS group_key
       |       FROM dd LEFT JOIN cl ON dd.doc_id = cl.node),
       |trn AS (SELECT doc_id, dt FROM gk
       |  WHERE CAST(('0x' || substr(md5('split' || CAST(group_key AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8),
       |lg AS (SELECT doc_id, dt, string_split(lower(trim(dt)), ' ') AS lws FROM trn),
       |mx AS (SELECT doc_id, dt,
       |    (CASE WHEN len(list_filter(lws, x -> x IN $StopwordsSql)) / len(lws) >= 0.05
       |          THEN $WEn ELSE $WOther END) AS w
       |  FROM lg),
       |cp AS (SELECT doc_id, dt,
       |    w // 1000
       |    + CASE WHEN CAST(('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000 < w % 1000
       |           THEN 1 ELSE 0 END AS n_copies
       |  FROM mx),
       |stream AS (SELECT doc_id, CAST(u.copy AS BIGINT) AS copy,
       |    CAST(len(regexp_extract_all(dt, '$BpeTokenRe')) AS BIGINT) AS tok
       |  FROM cp, unnest(range(1, n_copies + 1)) AS u(copy)
       |  WHERE n_copies >= 1),
       |cum AS (SELECT doc_id, copy, tok,
       |    COALESCE(SUM(tok) OVER (ORDER BY doc_id, copy
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
       |  FROM stream)
       |SELECT CAST(floor(bef / $Capacity) AS BIGINT) AS bin,
       |  count(*) AS n_rows, CAST(sum(tok) AS BIGINT) AS tok_sum,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Excluded from the bench headline: the chained mirror contains
    * BOTH timing-pathological oracle fragments (q81's slice
    * materialization and q95's recursive closure — each already
    * skipped by tools/bench_duck.py as a timing side); the capstone
    * is a correctness + plan-shape artifact, and its Spark wall is
    * soak-recorded instead (BENCH_SF10.md round 12). */
  override def headline: Seq[String] = Seq.empty

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q96_pretrain_capstone", q96, Some(q96Sql)))
}

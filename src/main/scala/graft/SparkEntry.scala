package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AgreementOps, CleanOps, DatasetOps, DedupOps, EvalOps, EventOps, ExtraHeuristics, FinetuneOps, HumanEvalOps, IcOocOps, JoinOps, OrderOps, PackOps, PipelineOps, PromptOps, QueryDef, QueryModule, Relational, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented query modules (SURVEY.md §2 sections). */
  def modules: Seq[QueryModule] =
    Seq(Relational, EventOps, TextOps, DedupOps, SimilarityOps, FinetuneOps,
      ExtraHeuristics, JoinOps, DatasetOps, PromptOps, EvalOps, AgreementOps,
      HumanEvalOps, PackOps, CleanOps, PipelineOps, OrderOps, IcOocOps)

  private lazy val defs: Seq[QueryDef] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q50 runs the reference pipeline's full distill chain
    * (ingest → nearest-association → triple assembly → pair
    * emission → split) end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q50_finetune_pairs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Benchmark headline set: representative queries per §2 family,
    * run by graft.Bench at sf0.1 (warm-up + timed pass). */
  def headline: Seq[String] = modules.flatMap(_.headline)

  /** Oracle queries EXCLUDED from the headline set (quadratic
    * correctness baselines, recursive-closure oracle mirrors, the
    * capstone). They have no DuckDB timing side — their oracle
    * mirrors are correctness surfaces, not fair timing ones — but
    * they still deserve a Spark-only perf floor: q96 is the single
    * most expensive production job in the repo, and a silent codegen
    * fallback there would otherwise be invisible to BenchGuard.
    * graft.Bench times them when SPARK_GRAFT_BENCH_EXTRA=1;
    * BenchGuardSpec gates any of them with an envelope line. */
  def benchExtra: Seq[String] = {
    val head = headline.toSet
    defs.map(_.name).filterNot(head).sorted
  }
}

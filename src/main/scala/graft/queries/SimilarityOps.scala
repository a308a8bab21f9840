package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** §2.E — similarity search over `embeddings`. q39 is the exact
  * baseline with a DuckDB oracle (integer-quantized cosine, identical
  * float64 both engines); q40/q41 are the bucketed ANN scale paths
  * (rows-only check — their candidate sets are implementation-defined,
  * the spec pins recall against the q39 baseline instead).
  */
object SimilarityOps extends QueryModule {

  private val K = 5
  private val NumQueries = 10   // query set: vec_id < 10
  private val NumCents = 8      // IVF seed centroids: vec_id < 8

  // q39: brute-force cosine top-k.
  private def q39(s: SparkSession, dir: String): DataFrame =
    Similarity.knnBrute(Tables.embeddings(s, dir), col("vec_id") < NumQueries, K)

  private val q39Sql =
    s"""WITH q AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (SELECT vec_id, qv,
       |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) AS nrm
       |  FROM q),
       |p AS (SELECT qr.vec_id AS query_id, n.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1,65), i -> qr.qv[i] * n.qv[i])) AS DOUBLE)
       |      / (qr.nrm * n.nrm) AS sim
       |  FROM n qr JOIN n ON n.vec_id <> qr.vec_id
       |  WHERE qr.vec_id < $NumQueries),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
       |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim
       |FROM r WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // q40: random-hyperplane LSH bucketed ANN + exact rerank.
  private def q40(s: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(Tables.embeddings(s, dir), col("vec_id") < NumQueries, K)

  // q41: IVF-style seeded centroids, home-cell assignment, 2-probe.
  private def q41(s: SparkSession, dir: String): DataFrame =
    Similarity.ivf(Tables.embeddings(s, dir),
      col("vec_id") < NumCents, col("vec_id") < NumQueries, K)

  override val all: Seq[QueryDef] = Seq(
    QueryDef("q39_knn_brute", q39, Some(q39Sql)),
    QueryDef("q40_ann_lsh", q40, None),
    QueryDef("q41_ivf_centroids", q41, None))
}

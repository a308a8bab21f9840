package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Opq, Pq}

/** Streaming VECTOR ingest for the persisted IVF-PQ index — the
  * vector analog of the daily-document capstone
  * ([[StreamCapstone.incrementalCapstoneStreamPersisted]]): embeddings
  * arrive as a stream, each micro-batch is ENCODED against the frozen
  * codebook (one map-side pass — the model is a driver-held reference
  * object, exactly [[Pq.encode]]'s batch shape) and APPENDED to the
  * bucketed codes table, with the batch's own reconstruction radius
  * appended to the sidecar so the auto shortlist's error band stays a
  * valid bound for every indexed row as the index grows
  * ([[Pq.appendIndex]] owns both writes). The nightly
  * [[Pq.compactIndex]] job restores one file set per bucket and
  * collapses the sidecar.
  *
  * Restart semantics: appends are AT-LEAST-ONCE — a batch retried
  * across a crash may re-append its (vec_id, cell, pq) rows. That is
  * safe end-to-end by construction: [[Pq.searchIndex]] dedups
  * candidates before the rank cut (a duplicated candidate would
  * otherwise consume rank-floor slots and tighten the error band),
  * compaction drops the duplicate rows, and a re-appended radius row
  * is idempotent under the sidecar's max.
  *
  * The model stays FROZEN while the stream runs: PQ code words are
  * meaningless under any other codebook, so retraining means building
  * a new index (a new `prefix`) and swapping readers — the same
  * blue/green shape [[Pq.compactIndex]]'s catalog swap uses.
  */
object VectorIngest {

  /** Start the ingest: `vectors` is a streaming DataFrame with the
    * corpus vector schema (vec_id bigint, embedding array<float>). */
  def pqIngestStream(vectors: DataFrame, model: Pq.PqModel,
                     prefix: String, checkpointDir: String,
                     buckets: Int = 32): StreamingQuery = {
    require(vectors.isStreaming, "vectors must be a streaming DataFrame")
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Pq.appendIndex(batch, model, prefix, buckets)
        ()
      }
      .start()
  }

  /** The OPQ'd variant over a persisted [[Opq.OpqIndex]]: each
    * micro-batch is ROTATED against the index's persisted rotation and
    * appended through [[Opq.appendIndex]] — which also verifies per
    * batch that the caller's model still IS the persisted model (a
    * retrain mid-stream under the same prefix would otherwise corrupt
    * the index silently; the verify turns it into a loud batch
    * failure). Same at-least-once restart semantics as
    * [[pqIngestStream]], same frozen-model contract. */
  def opqIngestStream(vectors: DataFrame, model: Opq.OpqModel,
                      prefix: String, checkpointDir: String,
                      buckets: Int = 32): StreamingQuery = {
    require(vectors.isStreaming, "vectors must be a streaming DataFrame")
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Opq.appendIndex(batch, model, prefix, buckets)
        ()
      }
      .start()
  }
}

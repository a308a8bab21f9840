package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column plumbing: image/audio/video payloads ride
  * as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extraction runs as a BATCHED per-partition stage so
  * a real decoder (JNI image lib, ONNX runtime session, …) is
  * initialized once per partition and fed fixed-size batches — the
  * Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; only the innermost decode is stubbed.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  case class MediaRecord(
      mediaId: Long,
      kind: String,                // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int, durationMs: Long)

  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      features: Array[Float])     // fixed FeatureDim-length embedding

  val FeatureDim = 8
  val BatchSize = 32

  /** ========================= STUB =========================
    * Deterministic FAKE decoder standing in for a real image/audio
    * decode + feature extraction (codec libraries are not available
    * in this environment). Real implementation would decode
    * `batch.map(_.payload)` through a per-partition codec/model
    * session. The fake derives stable pseudo-features from payload
    * bytes so tests can assert exact values and batch plumbing.
    * ======================================================== */
  private def decodeBatchStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      var h = 1125899906842597L // deterministic FNV-ish byte fold
      for (b <- r.payload) h = h * 31 + (b & 0xff)
      val feats = Array.tabulate(FeatureDim) { i =>
        (((h >>> (i * 8)) & 0xff).toFloat - 128f) / 128f
      }
      MediaFeatures(r.mediaId, r.kind, r.payload.length.toLong, feats)
    }

  /** Batched per-partition feature extraction. Batching inside
    * mapPartitions (grouped iterator — lazy, never materializes the
    * partition) is the Scala analog of mapInPandas' arrow batches. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(decodeBatchStub)
    }
  }

  /** Loads a parquet/DataFrame of media rows into the typed Dataset,
    * validating the expected physical schema. */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.schema("payload").dataType == BinaryType, "payload must be binary")
    df.select(
      col("mediaId").cast("long"),
      col("kind").cast("string"),
      col("payload"),
      col("width").cast("int"),
      col("height").cast("int"),
      col("durationMs").cast("long"))
      .as[MediaRecord]
  }
}

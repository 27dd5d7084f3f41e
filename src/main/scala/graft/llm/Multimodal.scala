package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the
  * standard shape for 100 TB-scale multimodal training pipelines: parquet
  * stores the bytes page-compressed, column pruning means metadata-only
  * queries never touch the blobs, and per-partition batch processing keeps
  * decode vectorized.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container ships no image/audio codecs); the Spark-side plumbing —
  * schema, partition-wise batching, resize/frame-sample signatures — is
  * real and tested. Swap `decodeStub` for a codec-backed implementation
  * (JNI or `mapInArrow` to a Python worker) without touching the plan
  * shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int)
  final case class Feature(media_id: Long, kind: String, n_bytes: Long,
                           checksum: String, feature: Array[Float])

  /** Wrap raw text/bytes into the canonical media schema (used by tests to
    * fabricate media from any binary-able column). */
  def asMedia(df: DataFrame, id: org.apache.spark.sql.Column,
              payload: org.apache.spark.sql.Column, kind: String): DataFrame =
    df.select(id.cast("long").as("media_id"), lit(kind).as("kind"),
      payload.cast("binary").as("bytes"),
      lit(0).as("width"), lit(0).as("height"))

  /** Metadata-only projection — reads zero blob bytes thanks to parquet
    * column pruning (verify with `.explain`: ReadSchema excludes `bytes`). */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      octet_length(col("bytes")).as("n_bytes"),
      sha2(col("bytes"), 256).as("sha256"))

  /** Deterministic fake "decode + feature extract": per-partition batch
    * loop (the Scala analogue of `mapInPandas` batching), emitting a fixed
    * `featureDim`-float vector derived from the byte content. Real decoders
    * drop in here. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      featureDim: Int = 8): Dataset[Feature] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val feat = decodeStub(r.bytes, featureDim)
          Feature(r.media_id, r.kind, r.bytes.length.toLong,
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(r.bytes).take(8).map("%02x".format(_)).mkString,
            feat)
        }
      }
  }

  /** STUB decoder: deterministic feature vector from byte histogram
    * moments. Replace with a real codec for production. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    if (bytes.length > 0) out.indices.foreach(j => out(j) /= bytes.length)
    out
  }

  /** Resize plan shape for images: per-partition batch transform emitting
    * the target-dimension payload. The pixel work is STUBBED (no codecs in
    * this container) with a deterministic byte downsample sized to the
    * target dimensions, but the Spark-side contract is real: binary in,
    * binary out, metadata updated, batch-per-partition execution, and the
    * blob column only materializes inside the partition iterator. A real
    * codec (JNI / `mapInArrow` to a worker) drops into `resizeStub`. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaRow(r.media_id, r.kind,
            resizeStub(r.bytes, targetW * targetH), targetW, targetH)
        }
      }
  }

  /** STUB "resize": deterministic fixed-length downsample of the payload
    * (every ceil(n/target)-th byte). Replace with a real image scaler. */
  private def resizeStub(bytes: Array[Byte], targetLen: Int): Array[Byte] = {
    if (bytes.isEmpty || targetLen <= 0) return Array.emptyByteArray
    val n = math.min(targetLen, bytes.length)
    val step = bytes.length.toDouble / n
    Array.tabulate(n)(i => bytes((i * step).toInt))
  }

  /** Frame-sampling plan shape for video: pick every `stride`-th frame
    * index below `maxFrames` — pure metadata op until decode runs. */
  def frameSamplePlan(media: DataFrame, fps: Int, stride: Int,
                      maxFrames: Int): DataFrame =
    media.select(col("media_id"),
      filter(sequence(lit(0), lit(maxFrames - 1)),
        i => i % stride === 0).as("frame_indices"),
      (octet_length(col("bytes")) / (fps.toLong max 1L)).as("approx_frame_bytes"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata, processed per-partition in batches.
 *
 * !!! The actual media DECODE IS A STUB !!! — no codec libraries ship in
 * this container, so [[decodeMeta]] derives a deterministic fake
 * (width/height/format) from the payload bytes. The Spark-side plumbing —
 * binary schema, partition-batched typed map, metadata struct, sampling /
 * resize row shapes — is real and tested; swapping the stub for a real
 * decoder (javacv / pillow-over-pandas-udf on pyspark) changes only the
 * function body.
 */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Long)

  private val Formats = Array("png", "jpeg", "webp")

  /** STUB decode — deterministic fake: dimensions/format from byte length
    * and the first byte. Replicable in SQL for the oracle. */
  def decodeMeta(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    val w = 16 + (n % 320)
    val h = 16 + ((n * 7 + first) % 240)
    (w, h, Formats((n + first) % 3))
  }

  /** Decode metadata for a (doc_id, payload: binary) frame. Runs as a
    * partition-batched typed map — the Scala analog of mapInPandas: one
    * iterator per partition, zero shuffles, codecs initialized once per
    * partition in a real decoder. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point for a real codec context
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeMeta(bytes)
          MediaMeta(id, w, h, f, bytes.length.toLong)
        }
      }.toDF()
  }

  /** STUB resize: deterministic byte subsample to ≤ maxBytes (stands in
    * for a thumbnail encode; preserves determinism and row shape). */
  def resize(media: DataFrame, maxBytes: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val stride = math.max(1, bytes.length / maxBytes)
          (id, bytes.indices.by(stride).map(bytes).toArray)
        }
      }.toDF("doc_id", "thumb")
  }

  /** STUB frame sampling: k evenly spaced "frames" (byte windows) per
    * payload — the row-explosion shape of video frame extraction. */
  def frameSample(media: DataFrame, k: Int = 4, frameBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes.isEmpty) Iterator.empty
        else (0 until k).iterator.map { i =>
          val start = (bytes.length.toLong * i / k).toInt
          (id, i, bytes.slice(start, math.min(bytes.length, start + frameBytes)))
        }
      }.toDF("doc_id", "frame_no", "frame")
  }

  /** Adapter: treat the documents table's text bytes as a binary payload
    * column (the testdata has no real media; shapes are what matter). */
  def docsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"))
}

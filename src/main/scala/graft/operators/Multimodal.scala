package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multimodal columns with a REAL decode path: payloads are genuine PNG
 * bytes (and, for "video", a length-prefixed container of PNG frames),
 * decoded with the JDK's ImageIO — no byte-math fakes. The sandbox ships
 * no external media libraries and the driver tables carry no real media,
 * so synthesis lives here too, with dimensions DETERMINISTIC IN doc_id;
 * that is exactly what makes the decode oracle-checkable: the DuckDB side
 * predicts width/height/format from doc_id alone, while the Spark side
 * must RECOVER them from the actual encoded bytes. (PNG encode size is
 * codec-dependent, so n_bytes is carried but never oracled.)
 *
 * All per-row work runs as partition-batched typed maps — the Scala
 * analog of mapInPandas: one iterator per partition, zero shuffles,
 * codec state initialized per partition.
 */
object Multimodal {

  ImageIO.setUseCache(false) // no temp-file cache under executor threads

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      format: String, n_bytes: Long)

  /** Generation formulas — the oracle's side of the contract. */
  def imgDims(docId: Long): (Int, Int) =
    (16 + (docId % 32).toInt, 16 + ((docId * 7) % 24).toInt)
  def frameCount(docId: Long): Int = 1 + (docId % 7).toInt
  def frameDims(docId: Long, f: Int): (Int, Int) =
    (16 + ((docId + 3L * f) % 32).toInt, 12 + ((docId * 7 + f) % 24).toInt)

  private def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = ((seed * 2654435761L) & 0xffffffL).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (doc_id, payload): one real PNG per document. */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = imgDims(id)
        (id, pngBytes(w, h, id))
      }).toDF("doc_id", "payload")
  }

  /** (doc_id, payload): a "video" — frameCount(doc_id) PNG frames, each
    * prefixed by a 4-byte big-endian length. */
  def synthesizeVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val bos = new ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        (0 until frameCount(id)).foreach { f =>
          val (w, h) = frameDims(id, f)
          val png = pngBytes(w, h, id * 31 + f)
          out.writeInt(png.length)
          out.write(png)
        }
        (id, bos.toByteArray)
      }).toDF("doc_id", "payload")
  }

  /** Header-only decode (no full raster): (width, height, format), or
    * None for undecodable bytes. */
  def decodeHeader(payload: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode metadata for (doc_id, payload: binary) rows; undecodable
    * payloads are dropped (a real pipeline's quality filter). */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeHeader(bytes).map { case (w, h, f) =>
          MediaMeta(id, w, h, f, bytes.length.toLong)
        }
      }).toDF()
  }

  /** Real thumbnail: full decode, integer-factor downscale to fit
    * `maxDim`, PNG re-encode. Output (doc_id, thumb: binary). */
  def resize(media: DataFrame, maxDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
          val scale = math.max(1,
            (math.max(img.getWidth, img.getHeight) + maxDim - 1) / maxDim)
          val w2 = math.max(1, img.getWidth / scale)
          val h2 = math.max(1, img.getHeight / scale)
          val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(img, 0, 0, w2, h2, null)
          g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          (id, bos.toByteArray)
        }
      }).toDF("doc_id", "thumb")
  }

  /** Parse the frame container and header-decode every `stride`-th frame:
    * (doc_id, frame_no, width, height) — the row-explosion shape of video
    * frame extraction, with the dims recovered from the actual bytes. */
  def frameSample(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually {
          if (in.available() < 4) None
          else {
            val len = in.readInt()
            val frame = new Array[Byte](len)
            in.readFully(frame)
            Some(frame)
          }
        }.takeWhile(_.isDefined).flatten.zipWithIndex.collect {
          case (frame, f) if f % stride == 0 =>
            decodeHeader(frame) match {
              case Some((w, h, _)) => (id, f, w, h)
              case None            => (id, f, -1, -1)
            }
        }.toSeq
      }.toDF("doc_id", "frame_no", "width", "height")
  }
}

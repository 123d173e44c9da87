package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as a
  * partition-batched transform (the Scala analog of `mapInPandas` — one
  * batch-shaped call per partition, so a real decoder amortizes model/codec
  * init across the batch).
  *
  * Both the header decode AND the pixel decode are REAL:
  * [[MediaCodec.decodeDims]] parses PNG IHDR / JPEG SOF bytes, and the
  * feature stage decodes ACTUAL PIXELS — gray-8 PNGs through the
  * zero-dependency [[MediaCodec.decodeGray8Pixels]] (inflate + all five
  * scanline filters), everything else through the JDK's `ImageIO`
  * (arbitrary color PNGs and real baseline JPEGs) — and emits an 8-bin
  * LUMINANCE histogram over the decoded image. Only blobs no decoder
  * accepts (e.g. the header-only synthetic JPEG stubs) fall back to a
  * byte-value histogram of the encoded stream; the `feature_src` column
  * says per row which path produced the vector, so a corrupt shard is
  * visible, not hidden. An ML embedding model would replace
  * [[pixelHistogram]] in the same per-partition slot.
  */
object Multimodal {

  /** Metadata + features emitted per media blob. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false),
    StructField("feature_src", StringType, nullable = false)))

  /** Fallback feature for undecodable blobs: 8-bin byte-value histogram
    * ratios over the ENCODED stream.
    */
  private[pipeline] def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](8)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) % 8) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    counts.map(_ / n)
  }

  /** Real image feature: 8-bin luminance histogram over DECODED pixels
    * (bin = value / 32).
    */
  private[pipeline] def pixelHistogram(pixels: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](8)
    var i = 0
    while (i < pixels.length) { counts((pixels(i) & 0xff) >> 5) += 1; i += 1 }
    val n = math.max(pixels.length, 1).toFloat
    counts.map(_ / n)
  }

  /** Decode to gray pixels: own PNG path first (deterministic, no AWT),
    * then ImageIO (color PNG, real JPEG; luminance = (r+g+b)/3).
    */
  private def grayPixels(bytes: Array[Byte]): Option[(Array[Byte], String)] =
    MediaCodec.decodeGray8Pixels(bytes).map { case (_, _, px) => (px, "png-pixels") }
      .orElse {
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val out = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                out(y * w + x) = lum.toByte
                x += 1
              }
              y += 1
            }
            Some((out, "imageio-pixels"))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }

  /** Batch decode: input needs (doc_id: long, media: binary). Runs once per
    * partition over the whole iterator (batch shape), not per row. Blobs
    * whose headers parse as PNG/JPEG get real dims; anything else is
    * surfaced as format="unknown" with zero dims rather than dropped (at
    * corpus scale silent drops hide corrupt shards).
    */
  def decodeFeatures(media: DataFrame, id: String, binCol: String): DataFrame = {
    val src = media.select(col(id).cast("long").as("doc_id"), col(binCol).cast("binary").as("media"))
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      // per-partition init: ImageIO's default stream cache spools every
      // read through an executor temp FILE — pure syscall overhead for
      // in-memory byte arrays; a heavier decoder/model would init here too
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val docId = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (fmt, w, h) = MediaCodec.decodeDims(bytes).getOrElse(("unknown", 0, 0))
        val (feature, srcTag) = grayPixels(bytes) match {
          case Some((px, tag)) => (pixelHistogram(px), tag)
          case None => (byteHistogram(bytes), "bytes")
        }
        Row(docId, bytes.length.toLong, fmt, w, h, feature.toSeq, srcTag)
      }
    }
  }

  /** Synthesize an opaque media column from text: REAL encoded blobs
    * ([[MediaCodec]]) whose dims derive deterministically from the text's
    * first two UTF-8 bytes and whose format alternates on byte length —
    * so an external oracle can recompute the expected metadata while the
    * engine-side path exercises a genuine header parse. (Used by tests and
    * the driver queries; the testdata has no binary column.)
    */
  def syntheticMedia(docs: DataFrame, id: String, text: String): DataFrame = {
    // real per-row deflate/encode work: floor the scan parallelism so a
    // one-split input doesn't serialize the whole encode+decode pipeline
    // (Portable.parallelized scaladoc; downstream decodeFeatures inherits
    // the partitioning — no extra shuffle)
    val src = Portable.parallelized(docs)
      .select(col(id).cast("long").as("doc_id"),
        encode(col(text), "UTF-8").as("txt"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    implicit val enc = RowEncoder.encoderFor(schema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val docId = r.getLong(0)
        val t = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val w = 64 + (if (t.length > 0) (t(0) & 0xff) % 64 else 0)
        val h = 64 + (if (t.length > 1) (t(1) & 0xff) % 64 else 0)
        val blob =
          if (t.length % 2 == 0) MediaCodec.encodePng(w, h)
          else MediaCodec.encodeJpeg(w, h)
        Row(docId, blob)
      }
    }.toDF()
  }
}

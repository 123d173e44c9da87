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
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[FakeDecoder]] is a deterministic stand-in that derives
  * "features" from the bytes. Everything around it — schema, binary
  * handling, batch shape, partitioning — is real and tested, so a real
  * decoder drops into [[decodeFeatures]] unchanged.
  */
object Multimodal {

  /** Metadata + features emitted per media blob. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** STUB decoder: a real implementation would decode the image/audio blob
    * and run feature extraction. This deterministic fake derives dims and a
    * tiny feature vector from the byte content so the pipeline shape is
    * fully exercisable without media libs.
    */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Array[Float]) = {
      val n = bytes.length
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      val w = 64 + (math.abs(if (n > 0) bytes(0).toInt else 0) % 64)
      val h = 64 + (math.abs(if (n > 1) bytes(1).toInt else 0) % 64)
      val feat = Array.tabulate(8)(i => (if (n > i) bytes(i % n).toFloat else 0f) / 128f)
      (fmt, w, h, feat)
    }
  }

  /** Batch decode: input needs (doc_id: long, media: binary). Runs once per
    * partition over the whole iterator (batch shape), not per row.
    */
  def decodeFeatures(media: DataFrame, id: String, binCol: String): DataFrame = {
    val src = media.select(col(id).cast("long").as("doc_id"), col(binCol).cast("binary").as("media"))
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      // per-partition init of a real decoder/model would go here
      rows.map { r =>
        val docId = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (fmt, w, h, feat) = FakeDecoder.decode(bytes)
        Row(docId, bytes.length.toLong, fmt, w, h, feat.toSeq)
      }
    }
  }

  /** Synthesize an opaque media column from text (deterministic; used by
    * tests and the driver queries since the testdata has no binary column).
    */
  def syntheticMedia(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).cast("long").as("doc_id"),
      encode(col(text), "UTF-8").as("media"))
}

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
  * The header decode is REAL ([[MediaCodec.decodeDims]] parses PNG IHDR and
  * JPEG SOF bytes — the same parse any production dims extractor does, zero
  * dependencies). What stays deliberately simple is the FEATURE stage: with
  * no ML/vision runtime in this environment it emits a deterministic 8-bin
  * byte histogram; a real embedding model drops into the same per-partition
  * slot in [[decodeFeatures]] unchanged.
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

  /** Deterministic placeholder feature: 8-bin byte-value histogram ratios.
    * Stands in for the model-forward pass of a real feature extractor.
    */
  private[pipeline] def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](8)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0xff) % 8) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    counts.map(_ / n)
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
      // per-partition init of a real decoder/model would go here
      rows.map { r =>
        val docId = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val (fmt, w, h) = MediaCodec.decodeDims(bytes).getOrElse(("unknown", 0, 0))
        Row(docId, bytes.length.toLong, fmt, w, h, byteHistogram(bytes).toSeq)
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
    val src = docs.select(col(id).cast("long").as("doc_id"),
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

package graft.pipeline

import java.nio.charset.StandardCharsets
import java.util.zip.{Adler32, CRC32}

/** Zero-dependency media header codec: REAL parsing of PNG IHDR and JPEG
  * SOF segments for (format, width, height), plus deterministic tiny
  * encoders used to synthesize test/bench media.
  *
  * The decode side is a genuine format parser (it reads the same bytes a
  * full decoder would): it handles arbitrary PNG files and multi-segment
  * JPEGs (APP0/DQT/DHT/COM segments are walked by their length fields until
  * a start-of-frame marker carries the dimensions). Pixel decoding /
  * feature extraction beyond the header is NOT done here — that is the
  * pluggable per-partition stage in [[Multimodal.decodeFeatures]].
  *
  * The encode side:
  *  - [[encodePng]] emits a COMPLETE valid PNG (signature, IHDR, an IDAT
  *    holding a hand-rolled zlib stream of stored-blocks over zero
  *    pixels, IEND; all CRCs real) — `javax.imageio` reads it back
  *    (pinned by MediaCodecSpec). Size is closed-form:
  *    `68 + h·(w+1)` bytes (grayscale 8-bit, one filter byte per row).
  *  - [[encodeJpeg]] emits a header-accurate JPEG stub
  *    (SOI + JFIF APP0 + SOF0 + EOI, 35 bytes): dimensionally real —
  *    any conformant dims parser reads w/h from its SOF0 — but carrying
  *    no entropy-coded data (a full baseline JPEG needs DQT/DHT/SOS
  *    tables that would dwarf the test corpus for no extra coverage;
  *    the dims PARSER is instead proven against real `ImageIO`-encoded
  *    JPEGs in MediaCodecSpec).
  */
object MediaCodec {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Complete valid grayscale-8 PNG of the given dims with zeroed pixels.
    * Total size = 68 + h·(w+1) bytes (8 sig + 25 IHDR + 12 IDAT framing +
    * 11 zlib framing + h·(w+1) stored bytes + 12 IEND).
    */
  def encodePng(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && h.toLong * (w + 1) <= 65535,
      "tiny-PNG encoder: one stored zlib block (raw size <= 65535)")
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
    val raw = new Array[Byte](h * (w + 1)) // per row: filter byte 0 + w px
    // hand-rolled zlib stream (deterministic by construction): header
    // 0x78 0x01, ONE final stored block (0x01, len LE16, ~len), raw, adler32
    val n = raw.length
    val adler = new Adler32; adler.update(raw)
    val zlib = Array[Byte](0x78, 0x01, 0x01,
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      (~n & 0xff).toByte, ((~n >> 8) & 0xff).toByte) ++ raw ++
      be32(adler.getValue.toInt)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Header-accurate JPEG stub: SOI + JFIF APP0 + SOF0(dims) + EOI,
    * 35 bytes (see object scaladoc for what "stub" means here).
    */
  def encodeJpeg(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      "JFIF".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      1, 1, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def i32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Parse (format, width, height) from real header bytes. PNG: signature +
    * IHDR (width/height big-endian at data offsets 0/4, i.e. file offsets
    * 16/20 — PNG spec, IHDR is always the first chunk). JPEG: SOI then a
    * marker-segment walk skipping each segment by its length field until a
    * start-of-frame marker (0xC0–0xCF except DHT 0xC4 / JPG 0xC8 /
    * DAC 0xCC), whose payload is [precision, height:2, width:2, ...].
    * None for anything unparseable.
    */
  def decodeDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), StandardCharsets.US_ASCII) == "IHDR")
      return Some(("png", i32(bytes, 16), i32(bytes, 20)))
    if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) {
      var i = 2
      while (i + 1 < bytes.length) {
        if (u8(bytes, i) != 0xff) return None // not at a marker: corrupt
        val m = u8(bytes, i + 1)
        if (m == 0xff) { i += 1 } // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m == 0xd9) return None // EOI before any SOF
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= bytes.length) return None
          return Some(("jpeg", u16(bytes, i + 7), u16(bytes, i + 5)))
        } else {
          if (i + 3 >= bytes.length) return None
          i += 2 + u16(bytes, i + 2) // skip segment by its length field
        }
      }
      None
    } else None
  }
}

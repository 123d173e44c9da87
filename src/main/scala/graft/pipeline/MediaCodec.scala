package graft.pipeline

import java.io.ByteArrayOutputStream
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
  def encodePng(w: Int, h: Int): Array[Byte] =
    encodePng(w, h, new Array[Byte](w * h))

  /** Same encoder with caller-supplied grayscale pixels (row-major w·h). */
  def encodePng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && h.toLong * (w + 1) <= 65535,
      "tiny-PNG encoder: one stored zlib block (raw size <= 65535)")
    require(pixels.length == w * h, "pixels must be row-major w*h")
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
    val raw = new Array[Byte](h * (w + 1)) // per row: filter byte 0 + w px
    var y = 0
    while (y < h) {
      System.arraycopy(pixels, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
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
  /** FULL pixel decode of an 8-bit GRAYSCALE, non-interlaced PNG — real
    * end-to-end: chunk walk concatenating every IDAT payload, zlib inflate
    * (JDK `Inflater`, so ANY conformant compressor's output works, not
    * just [[encodePng]]'s stored blocks), and scanline de-filtering with
    * all five PNG filter types (None/Sub/Up/Average/Paeth — an
    * ImageIO-encoded gray PNG uses whichever its heuristic picks, and
    * MediaCodecSpec pins pixel equality against `ImageIO.read`). Returns
    * (w, h, row-major pixels); None for other color types / depths /
    * interlaced images or any malformed stream (the caller falls back to
    * a general decoder).
    */
  def decodeGray8Pixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!(bytes.length >= 33 && bytes.take(8).sameElements(PngSig) &&
        new String(bytes.slice(12, 16), StandardCharsets.US_ASCII) == "IHDR"))
      return None
    val w = i32(bytes, 16); val h = i32(bytes, 20)
    val bitDepth = u8(bytes, 24); val colorType = u8(bytes, 25)
    val interlace = u8(bytes, 28)
    if (bitDepth != 8 || colorType != 0 || interlace != 0) return None
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None // 64 MB cap
    // chunk walk: concatenate IDAT payloads until IEND
    val idat = new ByteArrayOutputStream()
    var i = 33 // 8 sig + 25 IHDR
    var done = false
    while (!done) {
      if (i + 8 > bytes.length) return None
      val len = i32(bytes, i)
      // bounds check in Long: a hostile length near Int.MaxValue must not
      // wrap the sum negative and slip past the guard
      if (len < 0 || i.toLong + 8L + len + 4L > bytes.length) return None
      val typ = new String(bytes.slice(i + 4, i + 8), StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(bytes, i + 8, len)
      if (typ == "IEND") done = true
      i += 8 + len + 4
    }
    // inflate to h scanlines of (filter byte + w pixels)
    val stride = w + 1
    val raw = new Array[Byte](h * stride)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // de-filter (bpp = 1)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * stride) & 0xff
      var x = 0
      while (x < w) {
        val r = raw(y * stride + 1 + x) & 0xff
        val a = if (x > 0) out(y * w + x - 1) & 0xff else 0
        val b = if (y > 0) out((y - 1) * w + x) & 0xff else 0
        val c = if (x > 0 && y > 0) out((y - 1) * w + x - 1) & 0xff else 0
        val v = ft match {
          case 0 => r
          case 1 => r + a
          case 2 => r + b
          case 3 => r + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            r + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(y * w + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

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

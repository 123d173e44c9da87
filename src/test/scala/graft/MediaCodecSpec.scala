package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MediaCodec

/** The media header codec must parse REAL encoder output, not just its own
  * synthesis: `javax.imageio` (in the JDK — no external deps) writes
  * genuine PNG and baseline-JPEG files (the JPEG carrying the full
  * APP0/DQT/SOF0/DHT/SOS segment train the marker walk has to skip), and
  * [[MediaCodec.decodeDims]] must recover the exact dimensions. The inverse
  * holds for PNG: ImageIO must fully decode [[MediaCodec.encodePng]]'s
  * output (valid CRCs, valid zlib stream), proving the synthetic blobs are
  * real PNGs rather than look-alikes.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def imageIoBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // non-trivial pixels so the JPEG entropy coder emits real data
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("decodeDims parses real ImageIO-encoded PNGs") {
    for ((w, h) <- Seq((1, 1), (64, 127), (123, 45))) {
      assert(MediaCodec.decodeDims(imageIoBytes("png", w, h))
        .contains(("png", w, h)))
    }
  }

  test("decodeDims parses real ImageIO-encoded baseline JPEGs") {
    for ((w, h) <- Seq((8, 8), (64, 127), (123, 45))) {
      assert(MediaCodec.decodeDims(imageIoBytes("jpg", w, h))
        .contains(("jpeg", w, h)))
    }
  }

  test("encodePng output is a fully valid PNG (ImageIO decodes it)") {
    for ((w, h) <- Seq((1, 1), (64, 127), (127, 127))) {
      val bytes = MediaCodec.encodePng(w, h)
      assert(bytes.length == 68 + h * (w + 1)) // the closed form the oracle uses
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected the synthetic PNG")
      assert(img.getWidth == w && img.getHeight == h)
      assert(MediaCodec.decodeDims(bytes).contains(("png", w, h)))
    }
  }

  test("encodeJpeg header stub round-trips through decodeDims") {
    for ((w, h) <- Seq((64, 64), (127, 70), (1000, 2000))) {
      val bytes = MediaCodec.encodeJpeg(w, h)
      assert(bytes.length == 35)
      assert(MediaCodec.decodeDims(bytes).contains(("jpeg", w, h)))
    }
  }

  test("decodeGray8Pixels round-trips encodePng(pixels) exactly") {
    for ((w, h) <- Seq((1, 1), (17, 9), (64, 127))) {
      val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
      val bytes = MediaCodec.encodePng(w, h, px)
      val got = MediaCodec.decodeGray8Pixels(bytes)
      assert(got.isDefined, "own PNG must decode")
      val (gw, gh, gp) = got.get
      assert(gw == w && gh == h)
      assert(gp.sameElements(px))
    }
  }

  test("decodeGray8Pixels decodes real ImageIO gray PNGs (live filters) pixel-exact") {
    // ImageIO's PNG writer deflate-compresses and picks scanline filters
    // per row — decoding its output exercises inflate + Sub/Up/Avg/Paeth,
    // not just our own stored-block zlib with filter 0
    for ((w, h) <- Seq((16, 16), (61, 33))) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (x <- 0 until w; y <- 0 until h) {
        val v = (x * x + 3 * y + (x * y) % 7) % 256
        img.getRaster.setSample(x, y, 0, v)
      }
      val out = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val got = MediaCodec.decodeGray8Pixels(out.toByteArray)
      assert(got.isDefined, "ImageIO gray PNG must decode")
      val (gw, gh, gp) = got.get
      assert(gw == w && gh == h)
      for (x <- 0 until w; y <- 0 until h)
        assert((gp(y * w + x) & 0xff) == img.getRaster.getSample(x, y, 0),
          s"pixel ($x,$y)")
    }
  }

  test("decodeGray8Pixels refuses color/truncated/garbage input, never throws") {
    // a chunk header claiming a near-Int.MaxValue length must fail the
    // bounds check, not wrap it negative and index out of bounds
    val huge = {
      val b = MediaCodec.encodePng(10, 10).clone()
      b(33) = 0x7f.toByte; b(34) = 0xff.toByte // first chunk after IHDR:
      b(35) = 0xff.toByte; b(36) = 0xf8.toByte // len := 0x7ffffff8
      b
    }
    val cases = Seq(
      imageIoBytes("png", 8, 8),                    // RGB color type ⇒ None
      MediaCodec.encodePng(10, 10).take(40),        // truncated after IHDR
      MediaCodec.encodeJpeg(10, 10),                // not a PNG
      huge,
      Array.empty[Byte])
    for (c <- cases) assert(MediaCodec.decodeGray8Pixels(c).isEmpty)
  }

  test("garbage and truncated inputs return None, never throw") {
    val cases = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      "plain text, not media at all".getBytes("UTF-8"),
      MediaCodec.encodePng(10, 10).take(20),        // truncated PNG
      MediaCodec.encodeJpeg(10, 10).take(6),        // truncated JPEG
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)) // SOI+EOI only
    for (c <- cases) assert(MediaCodec.decodeDims(c).isEmpty)
  }
}

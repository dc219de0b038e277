package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaCodec

/**
 * The BMP and WAV codecs are pinned against the JDK's INDEPENDENT
 * implementations (javax.imageio BMP plugin, javax.sound.sampled WAV
 * reader) in both directions where the JDK supports it — a padding,
 * row-direction, endianness, or chunk-layout bug in either codec
 * breaks the cross-read. Y4M has no JDK twin; it is roundtrip- and
 * malformed-input-tested, and its on-the-wire framing is value-pinned
 * by the q_media_pipeline oracle.
 */
class MediaCodecSpec extends AnyFunSuite {

  test("BMP roundtrip across padding widths") {
    for (w <- 4 to 9; h <- Seq(3, 5)) { // 3w mod 4 covers all pad sizes
      val raster = Array.tabulate(3 * w * h)(i => ((i * 11 + w) % 256).toByte)
      val (dw, dh, dr) = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, raster))
      assert(dw == w && dh == h && dr.sameElements(raster), s"w=$w h=$h")
    }
  }

  test("JDK ImageIO reads our BMP pixel-for-pixel") {
    val w = 5; val h = 3 // rowSize 16: one pad byte per row
    val raster = Array.tabulate(3 * w * h)(i => ((i * 7 + 3) % 256).toByte)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaCodec.encodeBmp(w, h, raster)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (y * w + x)
      val expected = ((raster(p + 2) & 0xff) << 16) |
        ((raster(p + 1) & 0xff) << 8) | (raster(p) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == expected, s"pixel ($x,$y)")
    }
  }

  test("our decoder reads JDK ImageIO's BMP") {
    val w = 6; val h = 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40 + 7) << 16) | ((y * 60 + 5) << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", baos))
    val (dw, dh, raster) = MediaCodec.decodeBmp(baos.toByteArray)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (y * w + x)
      val got = ((raster(p + 2) & 0xff) << 16) |
        ((raster(p + 1) & 0xff) << 8) | (raster(p) & 0xff)
      assert(got == (img.getRGB(x, y) & 0xffffff), s"pixel ($x,$y)")
    }
  }

  test("JDK AudioSystem reads our WAV sample-for-sample") {
    val samples = Array.tabulate(50)(i => ((i * 1103 + 77) % 65536).toShort)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MediaCodec.encodeWavPcm16(8000, samples)))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val data = ais.readAllBytes()
    assert(data.length == 2 * samples.length)
    for (i <- samples.indices) {
      val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      assert(v == samples(i), s"sample $i")
    }
  }

  test("WAV roundtrip and unknown-chunk skipping") {
    val samples = Array.tabulate(33)(i => ((i * 977 + 13) % 65536).toShort)
    val bytes = MediaCodec.encodeWavPcm16(44100, samples)
    val (rate, ch, out) = MediaCodec.decodeWavPcm16(bytes)
    assert(rate == 44100 && ch == 1 && out.sameElements(samples))
    // splice an odd-sized LIST chunk between fmt and data: a spec
    // decoder must skip it (word-aligned) and still find the data
    val b = java.nio.ByteBuffer.allocate(bytes.length + 8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(bytes, 0, 36) // RIFF header + fmt chunk
    b.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // 5 data + 1 pad
    b.put(bytes, 36, bytes.length - 36)
    val spliced = b.array()
    // patch RIFF size
    val riffSize = spliced.length - 8
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, riffSize)
    val (r2, c2, out2) = MediaCodec.decodeWavPcm16(spliced)
    assert(r2 == 44100 && c2 == 1 && out2.sameElements(samples))
  }

  test("Y4M roundtrip and frame framing") {
    for (w <- Seq(4, 8); h <- Seq(4, 6); nf <- Seq(1, 3)) {
      val m = w * h * 3 / 2
      val frames = Array.tabulate(nf)(f =>
        Array.tabulate(m)(j => ((f * 31 + j * 5 + w) % 256).toByte))
      val enc = MediaCodec.encodeY4m(w, h, frames)
      assert(new String(enc.take(9), "US-ASCII") == "YUV4MPEG2")
      val (dw, dh, df) = MediaCodec.decodeY4m(enc)
      assert(dw == w && dh == h && df.length == nf)
      assert(df.zip(frames).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("malformed inputs are rejected, not misparsed") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp("nope".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.decodeWavPcm16("RIFFxxxxNOPE".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.decodeY4m("MPEG4 W4 H4\nFRAME\n".getBytes))
    // truncated pixel data must not decode
    val ok = MediaCodec.encodeBmp(4, 4, new Array[Byte](48))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(ok.take(40)))
  }

  test("hostile headers fail the contract, never escape it") {
    import java.nio.{ByteBuffer, ByteOrder}
    // negative / huge BMP dimensions must throw IllegalArgumentException,
    // not NegativeArraySizeException or a multi-GB allocation attempt
    def bmpWith(w: Int, h: Int, dataOff: Int = 54): Array[Byte] = {
      val base = MediaCodec.encodeBmp(4, 4, new Array[Byte](48))
      val b = ByteBuffer.wrap(base.clone()).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(10, dataOff); b.putInt(18, w); b.putInt(22, h)
      b.array()
    }
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmpWith(-1, 4)))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmpWith(Int.MaxValue, 4)))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmpWith(4, Int.MinValue)))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bmpWith(4, 4, dataOff = -8)))
    // WAV chunk size near MaxInt must not wrap the bound check
    val wav = MediaCodec.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    val evil = wav.clone()
    ByteBuffer.wrap(evil).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 4) // data chunk size
    intercept[IllegalArgumentException](MediaCodec.decodeWavPcm16(evil))
    // non-numeric / odd Y4M header fields
    intercept[IllegalArgumentException](
      MediaCodec.decodeY4m("YUV4MPEG2 W4x H4 C420\nFRAME\n".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.decodeY4m("YUV4MPEG2 W3 H4 C420\nFRAME\n".getBytes))
    // huge Y4M dimensions whose plane size overflows int must fail the
    // contract, not wrap to a small positive m and mis-slice frames
    // (r19 review — the decodeBmp bound, applied to Y4M)
    intercept[IllegalArgumentException](
      MediaCodec.decodeY4m("YUV4MPEG2 W9999998 H9999998 C420\nFRAME\nxx".getBytes))
    // a plausible-but-large header with ZERO frames still decodes (the
    // plane size is only enforced when a frame is present)
    val (zw, zh, zf) = MediaCodec.decodeY4m("YUV4MPEG2 W1048576 H1048576 C420\n".getBytes)
    assert(zw == 1048576 && zh == 1048576 && zf.isEmpty)
    // and a present frame against that header is truncated by definition
    intercept[IllegalArgumentException](
      MediaCodec.decodeY4m("YUV4MPEG2 W1048576 H1048576 C420\nFRAME\nxx".getBytes))
  }
}

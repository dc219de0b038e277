package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Pure-JVM codecs for three real, publicly-specified media containers —
 * the decode step of the multimodal pipeline (no native libraries in
 * this environment, so the formats chosen are ones a few hundred lines
 * of JVM code can encode AND decode exactly):
 *
 *  - BMP: Windows bitmap, 24bpp uncompressed BITMAPINFOHEADER — 14-byte
 *    file header, 40-byte info header, BGR pixel rows stored bottom-up
 *    and padded to 4-byte boundaries.
 *  - WAV: RIFF/WAVE with PCM16 `fmt ` + `data` chunks; the decoder
 *    walks the chunk list generically (skipping unknown chunks, odd
 *    sizes padded per RIFF), as a real reader must.
 *  - Y4M: YUV4MPEG2 uncompressed video — ASCII stream header with
 *    W/H/F parameters, then per-frame `FRAME\n` markers each followed
 *    by a raw 4:2:0 plane dump (w·h luma + 2·(w/2·h/2) chroma bytes).
 *
 * Every decoder validates magic bytes and structural invariants and
 * throws on malformed input; MediaCodecSpec cross-checks BMP and WAV
 * against the JDK's independent implementations (javax.imageio,
 * javax.sound.sampled) in both directions.
 */
object MediaCodec {

  // ---- BMP (24bpp uncompressed) -------------------------------------

  /** @param raster 3·w·h BGR bytes in raster order (top-down rows) */
  def encodeBmp(w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * w * h, "raster size mismatch")
    val rowSize = ((3 * w + 3) / 4) * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(fileSize).putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // rows stored bottom-up
    while (y >= 0) {
      b.put(raster, y * 3 * w, 3 * w)
      var p = 3 * w
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** @return (width, height, raster) — raster is 3·w·h BGR bytes in
   *          top-down raster order regardless of stored row direction */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    require(b.getInt(14) >= 40, "unsupported DIB header")
    val w = b.getInt(18)
    val hRaw = b.getInt(22)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    // bound dimensions BEFORE any arithmetic: a hostile header must fail
    // the declared contract (IllegalArgumentException), not overflow
    // rowSize/allocation math into a negative-size or multi-GB array
    require(w > 0 && w <= (1 << 20) && h > 0 && h <= (1 << 20),
      "implausible dimensions")
    require(dataOff >= 54 && dataOff <= bytes.length, "bad pixel data offset")
    require(b.getShort(28) == 24, "only 24bpp supported")
    require(b.getInt(30) == 0, "only BI_RGB (uncompressed) supported")
    val rowSize = ((3 * w + 3) / 4) * 4
    require(bytes.length >= dataOff + rowSize.toLong * h, "truncated pixel data")
    val raster = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      System.arraycopy(bytes, dataOff + srcRow * rowSize, raster, y * 3 * w, 3 * w)
      y += 1
    }
    (w, h, raster)
  }

  // ---- WAV (RIFF/WAVE, PCM 16-bit) ----------------------------------

  /** Mono PCM16 WAV from raw samples. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** @return (sampleRate, channels, samples) — walks the RIFF chunk
   *          list, skipping unknown chunks (word-aligned per spec) */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && fourCC(0) == "RIFF" && fourCC(8) == "WAVE",
      "not a RIFF/WAVE")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = fourCC(off)
      val size = b.getInt(off + 4)
      // Long arithmetic: a near-MaxInt size would wrap `off + 8 + size`
      // negative and slip past an int-typed bound check
      require(size >= 0 && off.toLong + 8 + size <= bytes.length,
        s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(b.getShort(off + 8) == 1, "only PCM supported")
          channels = b.getShort(off + 10)
          rate = b.getInt(off + 12)
          bits = b.getShort(off + 22)
          require(bits == 16, "only 16-bit supported")
        case "data" =>
          require(bits == 16, "data chunk before fmt")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = b.getShort(off + 8 + 2 * i); i += 1 }
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    (rate, channels, samples)
  }

  // ---- Y4M (YUV4MPEG2, C420) ----------------------------------------

  /** @param frames one w·h·3/2 4:2:0 plane dump per frame */
  def encodeY4m(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dimensions")
    val m = w * h * 3 / 2
    require(frames.forall(_.length == m), "frame plane size mismatch")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + frames.length * (marker.length + m))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, off, marker.length)
      System.arraycopy(f, 0, out, off + marker.length, m)
      off += marker.length + m
    }
    out
  }

  /** @return (width, height, frames) */
  def decodeY4m(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "no stream header")
    val header = new String(bytes, 0, nl, "US-ASCII")
    val tokens = header.split(" ")
    require(tokens(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
    var w = -1; var h = -1
    // strict numeric parse: a malformed field ("W4x") must fail the
    // declared contract, not escape as NumberFormatException
    def num(t: String): Int = {
      val d = t.drop(1)
      require(d.nonEmpty && d.length <= 7 && d.forall(_.isDigit),
        s"bad numeric header field $t")
      d.toInt
    }
    tokens.iterator.drop(1).foreach { t =>
      if (t.startsWith("W")) w = num(t)
      else if (t.startsWith("H")) h = num(t)
      else if (t.startsWith("C")) require(t == "C420", "only C420 supported")
    }
    require(w > 0 && h > 0, "missing W/H parameters")
    // bound dimensions BEFORE the plane-size arithmetic, like decodeBmp
    // (r19 review): the 7-digit parse admits W/H up to 9999999, whose
    // product overflows the int plane size — a wrapped small-positive m
    // would mis-slice frames of the wrong size instead of failing the
    // declared contract. The plane size stays Long until a frame is
    // actually present, so a header-only (zero-frame) stream with huge
    // but well-formed dimensions still decodes to zero frames.
    require(w <= (1 << 20) && h <= (1 << 20), "implausible dimensions")
    require(w % 2 == 0 && h % 2 == 0, "C420 needs even dimensions")
    val mL = w.toLong * h * 3 / 2
    val frames = Vector.newBuilder[Array[Byte]]
    var off = nl + 1
    while (off < bytes.length) {
      val fnl = bytes.indexOf('\n'.toByte, off)
      require(fnl > 0 &&
        new String(bytes, off, 5.min(fnl - off), "US-ASCII") == "FRAME",
        "missing FRAME marker")
      require(fnl + 1 + mL <= bytes.length, "truncated frame")
      val m = mL.toInt // exact: mL ≤ bytes.length ≤ Int.MaxValue here
      frames += java.util.Arrays.copyOfRange(bytes, fnl + 1, fnl + 1 + m)
      off = fnl + 1 + m
    }
    (w, h, frames.result().toArray)
  }
}

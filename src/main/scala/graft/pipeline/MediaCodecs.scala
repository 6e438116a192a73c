package graft.pipeline

/** Pure-JVM media codecs for the multimodal pipeline: binary PPM (P6)
  * / PGM (P5) images and RIFF/WAV PCM audio — real encoded-media
  * formats with real parsers, no native codec dependency. Formats this
  * container can't decode (jpeg/png/webp need libjpeg/libpng; mp3/aac
  * need their decoders) dispatch to the undecodable branch in
  * [[Multimodal.decodeFeatures]] / audioFeatures; their slot in the
  * pipeline is identical, only the parser differs.
  */
object MediaCodecs {

  final case class Decoded(format: String, width: Int, height: Int, meanLuma: Double)

  final case class DecodedAudio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Int, rms: Double)

  /** Encode a grayscale image as binary PGM (P5). */
  def encodePgm(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { out(i) = (pixel(x, y) & 0xff).toByte; i += 1; x += 1 }
      y += 1
    }
    out
  }

  /** Encode an RGB image as binary PPM (P6). */
  def encodePpm(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(i) = (r & 0xff).toByte; out(i + 1) = (g & 0xff).toByte
        out(i + 2) = (b & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a P5/P6 payload: parse the ASCII header (whitespace +
    * `#` comments, per the netpbm spec), then average luma over the
    * raster — BT.601 weights for RGB, direct value for gray.
    * Returns None for any other magic (the undecodable branch). */
  /** Parsed netpbm header: (channels, width, height, maxVal, raster
    * offset). None for any other magic or a malformed/truncated file. */
  private def parseNetpbmHeader(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (payload.length < 2) return None
    val magic = new String(payload, 0, 2, "US-ASCII")
    if (magic != "P5" && magic != "P6") return None
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and # comments
      var done = false
      while (!done && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else done = true
      }
      var v = 0
      while (pos < payload.length && payload(pos).toChar.isDigit) {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val width = nextInt(); val height = nextInt(); val maxVal = nextInt()
    if (width <= 0 || height <= 0 || maxVal <= 0 || maxVal > 255) return None
    pos += 1 // single whitespace after maxval, then the raster
    val channels = if (magic == "P6") 3 else 1
    if (payload.length - pos < width * height * channels) return None
    Some((channels, width, height, maxVal, pos))
  }

  /** Luma of the pixel at raster index `p` (0-based, row-major). */
  @inline private def lumaAt(payload: Array[Byte], pos: Int, channels: Int, p: Int): Double =
    if (channels == 3) {
      val i = pos + p * 3
      0.299 * (payload(i) & 0xff) + 0.587 * (payload(i + 1) & 0xff) +
        0.114 * (payload(i + 2) & 0xff)
    } else (payload(pos + p) & 0xff).toDouble

  def decode(payload: Array[Byte]): Option[Decoded] = parseNetpbmHeader(payload).map {
    case (channels, width, height, maxVal, pos) =>
      var acc = 0.0
      var p = 0
      val n = width * height
      while (p < n) { acc += lumaAt(payload, pos, channels, p); p += 1 }
      Decoded(if (channels == 3) "ppm" else "pgm", width, height, acc / n / maxVal)
  }

  /** 64-bit average hash (aHash) of a netpbm image — the standard
    * cheap perceptual fingerprint: downsample luma to an 8×8 grid
    * (mean over each cell's pixel block), set bit (gy·8+gx) iff the
    * cell is brighter than the grid mean. Identical images hash
    * identically at ANY encoding (PPM vs PGM of the same luma, any
    * maxVal scaling); small local edits flip few bits, so near-dups
    * sit at small hamming distance. None where [[decode]] is None. */
  def averageHash(payload: Array[Byte]): Option[Long] =
    parseNetpbmHeader(payload).map { case (channels, width, height, _, pos) =>
      val grid = new Array[Double](64)
      val cnt = new Array[Int](64)
      var y = 0
      while (y < height) {
        val gy = y * 8 / height
        var x = 0
        while (x < width) {
          val gx = x * 8 / width
          grid(gy * 8 + gx) += lumaAt(payload, pos, channels, y * width + x)
          cnt(gy * 8 + gx) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      var mean = 0.0
      while (i < 64) {
        if (cnt(i) > 0) grid(i) /= cnt(i)
        mean += grid(i)
        i += 1
      }
      mean /= 64
      var bits = 0L
      i = 0
      while (i < 64) {
        if (cnt(i) > 0 && grid(i) > mean) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** 64-bit DCT perceptual hash (pHash) of a netpbm image — the
    * frequency-domain fingerprint: mean-pool luma to a 32×32 grid,
    * 2-D DCT-II, keep the 8×8 LOW-FREQUENCY block, set bit
    * (v·8 + u) iff its coefficient exceeds the block's median
    * (mean of the two middle order statistics — deterministic for
    * the even count). Any monotone rescaling of luma (contrast,
    * encoding maxVal) preserves coefficient ORDER, so the hash is
    * invariant where [[averageHash]] is; structured low-frequency
    * content additionally survives local pixel noise that flips
    * aHash cells. None where the payload doesn't parse. */
  def perceptualHash(payload: Array[Byte]): Option[Long] =
    parseNetpbmHeader(payload).map { case (channels, width, height, _, pos) =>
      val G = 32
      val grid = new Array[Double](G * G)
      val cnt = new Array[Int](G * G)
      var y = 0
      while (y < height) {
        val gy = y * G / height
        var x = 0
        while (x < width) {
          val gx = x * G / width
          grid(gy * G + gx) += lumaAt(payload, pos, channels, y * width + x)
          cnt(gy * G + gx) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < G * G) { if (cnt(i) > 0) grid(i) /= cnt(i); i += 1 }
      // separable low-frequency DCT-II: rows first (8 output freqs),
      // then columns — O(K·G²) instead of the naive O(K²·G²)
      val K = 8
      val cosT = Array.tabulate(K, G)((u, x) =>
        math.cos(math.Pi * (2 * x + 1) * u / (2.0 * G)))
      val rowT = Array.ofDim[Double](G, K) // rowT(y)(u) = Σ_x grid(y,x)·cos(u,x)
      y = 0
      while (y < G) {
        var u = 0
        while (u < K) {
          var acc = 0.0
          var x = 0
          while (x < G) { acc += grid(y * G + x) * cosT(u)(x); x += 1 }
          rowT(y)(u) = acc
          u += 1
        }
        y += 1
      }
      val coef = new Array[Double](K * K)
      var v = 0
      while (v < K) {
        var u = 0
        while (u < K) {
          var acc = 0.0
          var yy = 0
          while (yy < G) { acc += rowT(yy)(u) * cosT(v)(yy); yy += 1 }
          coef(v * K + u) = acc
          u += 1
        }
        v += 1
      }
      val sorted = coef.sorted
      val median = (sorted(31) + sorted(32)) / 2.0
      var bits = 0L
      i = 0
      while (i < 64) { if (coef(i) > median) bits |= (1L << i); i += 1 }
      bits
    }

  final case class DecodedVideo(width: Int, height: Int, nFrames: Int,
      sampledFrames: Seq[Int], sampledMeanLuma: Seq[Double])

  /** Encode frames of 8-bit luma as YUV4MPEG2 (y4m, C420 with constant
    * chroma): the `YUV4MPEG2 W# H# F#:#` header line then one
    * `FRAME\n` marker + raw Y/U/V planes per frame — the standard
    * uncompressed interchange format every video toolchain reads. */
  def encodeY4m(width: Int, height: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val chromaLen = (width / 2) * (height / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header, 0, header.length)
    frames.foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.write(f(x, y) & 0xff); x += 1 }
        y += 1
      }
      var i = 0
      while (i < 2 * chromaLen) { out.write(128); i += 1 } // neutral chroma
    }
    out.toByteArray
  }

  /** Decode a y4m payload with FRAME SAMPLING — the video analogue of
    * the image/audio parsers: parse the header (W/H/F tags), count
    * frames, and fully read only every `sampleEvery`-th frame's luma
    * plane (mean luma per sampled frame); unsampled frames are skipped
    * by plane arithmetic, never touched — exactly how a 100 TB video
    * pipeline avoids decoding what it doesn't sample. C420 only (the
    * overwhelmingly common subsampling); anything else → None. */
  def decodeY4m(payload: Array[Byte], sampleEvery: Int): Option[DecodedVideo] = {
    val headEnd = payload.indexOf('\n'.toInt)
    if (headEnd < 9) return None
    val header = new String(payload, 0, headEnd, "US-ASCII")
    val parts = header.split(" ")
    if (parts(0) != "YUV4MPEG2") return None
    def tag(p: Char): Option[String] =
      parts.iterator.drop(1).find(_.headOption.contains(p)).map(_.tail)
    val width = tag('W').map(_.toInt).getOrElse(return None)
    val height = tag('H').map(_.toInt).getOrElse(return None)
    if (width <= 0 || height <= 0) return None
    if (!tag('C').forall(_.startsWith("420"))) return None // C absent = 420
    val lumaLen = width * height
    val frameLen = lumaLen + 2 * ((width / 2) * (height / 2))
    val marker = "FRAME".getBytes("US-ASCII")
    var pos = headEnd + 1
    var frame = 0
    val sampled = Seq.newBuilder[Int]
    val lumas = Seq.newBuilder[Double]
    while (pos < payload.length) {
      // FRAME marker + optional parameters up to newline
      if (pos + marker.length > payload.length ||
        !marker.indices.forall(i => payload(pos + i) == marker(i))) return None
      val nl = payload.indexOf('\n'.toInt, pos)
      if (nl < 0 || nl + frameLen >= payload.length + 1) return None
      if (frame % sampleEvery == 0) {
        var acc = 0.0
        var i = nl + 1
        while (i <= nl + lumaLen) { acc += (payload(i) & 0xff); i += 1 }
        sampled += frame
        lumas += acc / lumaLen / 255.0
      }
      pos = nl + 1 + frameLen
      frame += 1
    }
    Some(DecodedVideo(width, height, frame, sampled.result(), lumas.result()))
  }

  /** Per-SAMPLED-FRAME 64-bit aHash of a y4m payload — the
    * [[averageHash]] grid applied to each sampled frame's luma plane
    * (the fingerprint [[decodeY4m]]'s mean-luma summary can't give):
    * downsample the W×H luma to 8×8 cell means, bit = cell > grid
    * mean. Same frame-sampling contract as [[decodeY4m]] — unsampled
    * frames are skipped by plane arithmetic, never read. None where
    * the payload isn't decodable y4m. */
  def y4mFrameHashes(payload: Array[Byte], sampleEvery: Int): Option[Seq[(Int, Long)]] = {
    val headEnd = payload.indexOf('\n'.toInt)
    if (headEnd < 9) return None
    val header = new String(payload, 0, headEnd, "US-ASCII")
    val parts = header.split(" ")
    if (parts(0) != "YUV4MPEG2") return None
    def tag(p: Char): Option[String] =
      parts.iterator.drop(1).find(_.headOption.contains(p)).map(_.tail)
    val width = tag('W').map(_.toInt).getOrElse(return None)
    val height = tag('H').map(_.toInt).getOrElse(return None)
    if (width <= 0 || height <= 0) return None
    if (!tag('C').forall(_.startsWith("420"))) return None
    val lumaLen = width * height
    val frameLen = lumaLen + 2 * ((width / 2) * (height / 2))
    val marker = "FRAME".getBytes("US-ASCII")
    var pos = headEnd + 1
    var frame = 0
    val out = Seq.newBuilder[(Int, Long)]
    while (pos < payload.length) {
      if (pos + marker.length > payload.length ||
        !marker.indices.forall(i => payload(pos + i) == marker(i))) return None
      val nl = payload.indexOf('\n'.toInt, pos)
      if (nl < 0 || nl + frameLen >= payload.length + 1) return None
      if (frame % sampleEvery == 0) {
        val grid = new Array[Double](64)
        val cnt = new Array[Int](64)
        var y = 0
        while (y < height) {
          val gy = y * 8 / height
          var x = 0
          while (x < width) {
            val gx = x * 8 / width
            grid(gy * 8 + gx) += (payload(nl + 1 + y * width + x) & 0xff)
            cnt(gy * 8 + gx) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        var mean = 0.0
        while (i < 64) {
          if (cnt(i) > 0) grid(i) /= cnt(i)
          mean += grid(i)
          i += 1
        }
        mean /= 64
        var bits = 0L
        i = 0
        while (i < 64) {
          if (cnt(i) > 0 && grid(i) > mean) bits |= (1L << i)
          i += 1
        }
        out += ((frame, bits))
      }
      pos = nl + 1 + frameLen
      frame += 1
    }
    Some(out.result())
  }

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file: RIFF
    * header, `fmt ` chunk (PCM, mono, 16-bit), `data` chunk with
    * little-endian samples — byte-for-byte the classic 44-byte-header
    * WAV layout. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a RIFF/WAVE payload: walk the chunk list (fmt before
    * data, unknown chunks skipped by their declared size, per the RIFF
    * spec), then RMS over the 16-bit little-endian PCM samples
    * normalized to [0, 1]. Returns None for any other container or a
    * non-PCM/non-16-bit encoding (the undecodable branch). */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    if (payload.length < 12) return None
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    while (pos + 8 <= payload.length) {
      val id = ascii(pos, 4)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8).toInt
          if (audioFormat != 1) return None // PCM only
          fmt = Some((buf.getShort(pos + 10).toInt, buf.getInt(pos + 12),
            buf.getShort(pos + 22).toInt))
        case "data" =>
          val (channels, rate, bits) = fmt.getOrElse(return None)
          if (bits != 16 || channels < 1) return None
          val n = size / 2
          var acc = 0.0
          var i = 0
          while (i < n) {
            val s = buf.getShort(pos + 8 + i * 2).toDouble / 32768.0
            acc += s * s
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(acc / n)
          return Some(DecodedAudio(rate, channels, bits, n / channels, rms))
        case _ => () // skip unknown chunk (LIST, INFO, ...)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }
}

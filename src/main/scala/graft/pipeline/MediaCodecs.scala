package graft.pipeline

/** Pure-JVM media codecs for the multimodal pipeline: binary PPM (P6)
  * and PGM (P5) — real encoded-image formats with real parsers, no
  * native codec dependency. Formats this container can't decode
  * (jpeg/png/webp need libjpeg/libpng) dispatch to the undecodable
  * branch in [[Multimodal.decodeFeatures]]; their slot in the pipeline
  * is identical, only the parser differs.
  */
object MediaCodecs {

  final case class Decoded(format: String, width: Int, height: Int, meanLuma: Double)

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
  def decode(payload: Array[Byte]): Option[Decoded] = {
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
    val needed = width * height * channels
    if (payload.length - pos < needed) return None
    var acc = 0.0
    var i = pos
    if (channels == 3) {
      while (i < pos + needed) {
        acc += 0.299 * (payload(i) & 0xff) + 0.587 * (payload(i + 1) & 0xff) +
          0.114 * (payload(i + 2) & 0xff)
        i += 3
      }
    } else {
      while (i < pos + needed) { acc += (payload(i) & 0xff).toDouble; i += 1 }
    }
    Some(Decoded(if (channels == 3) "ppm" else "pgm", width, height,
      acc / (width * height) / maxVal))
  }
}

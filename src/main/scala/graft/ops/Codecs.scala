package graft.ops

/** REAL decoders for the uncompressed media formats that need no codec
  * library — pure byte parsing on the JVM: PPM (P6) raster images and
  * RIFF/WAVE PCM-16 audio. These upgrade [[Multimodal]]'s decode stage
  * from "documented stub" to "real decode for uncompressed formats";
  * compressed formats (JPEG/FLAC/H.264) still fall back to the
  * documented deterministic stub, because their codecs aren't in this
  * container.
  *
  * Both decoders are total: malformed, truncated, or foreign payloads
  * return None (the WireFormat dead-letter stance — a corrupt blob in a
  * 100-TB corpus must count as corrupt, never kill the executor).
  */
object Codecs {

  /** Decoded P6 image: dims + raw interleaved RGB (3 bytes/pixel). */
  final case class Ppm(width: Int, height: Int, maxVal: Int,
                       rgb: Array[Byte])

  /** Decoded PCM-16 mono/stereo audio: rate + interleaved samples. */
  final case class Wav(sampleRate: Int, channels: Int,
                       samples: Array[Short])

  private val MaxDim = 1 << 15 // 32768px per side caps w*h*3 under 4 GiB

  /** Parse a binary PPM (P6): `P6 <ws> w <ws> h <ws> maxval <single
    * ws> raw-rgb`. Comments (`#` to end-of-line) are legal whitespace
    * per the netpbm spec. Returns None unless the payload carries the
    * full pixel block and maxval fits one byte.
    */
  def decodePpm(bytes: Array[Byte]): Option[Ppm] = {
    if (bytes == null || bytes.length < 9 ||
      bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        if (v > Int.MaxValue) return -1
      }
      if (any) v.toInt else -1
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
      mx <= 0 || mx > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster —
    // anything else is a malformed header, not a shifted raster
    if (i >= bytes.length) return None
    val sep = bytes(i)
    if (sep != ' ' && sep != '\t' && sep != '\r' && sep != '\n')
      return None
    i += 1
    val need = w.toLong * h * 3
    if (bytes.length - i < need) return None
    Some(Ppm(w, h, mx,
      java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
  }

  /** Encode raw interleaved RGB as binary PPM (P6), maxval 255. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Average-pool a decoded raster by an integer factor (the real
    * pixel half of resize — `withResizedDims` is the metadata half).
    * Each output channel byte is the floor-average of its f×f input
    * block; a ragged edge (width/height not divisible by f) is
    * truncated, the standard pooling convention. Integer arithmetic
    * throughout, so any engine can restate the result exactly.
    */
  def poolPpm(p: Ppm, f: Int): Ppm = {
    require(f >= 1, "pool factor must be >= 1")
    val ow = p.width / f; val oh = p.height / f
    require(ow >= 1 && oh >= 1, s"factor $f collapses ${p.width}x${p.height}")
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        var c = 0
        while (c < 3) {
          var s = 0
          var dy = 0
          while (dy < f) {
            var dx = 0
            while (dx < f) {
              s += p.rgb(((y * f + dy) * p.width + (x * f + dx)) * 3 + c) & 0xFF
              dx += 1
            }
            dy += 1
          }
          out((y * ow + x) * 3 + c) = (s / (f * f)).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Ppm(ow, oh, p.maxVal, out)
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Parse RIFF/WAVE, PCM (format 1), 16-bit. Walks the chunk list —
    * real files carry LIST/fact chunks before `data`. Returns None for
    * any other codec (IEEE float, ADPCM, mp3-in-wav) or a truncated
    * data chunk.
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E')) return None
    // chunk offsets/sizes in Long: a crafted le32 size near Int.MaxValue
    // must hit the bounds check, not overflow past it and throw
    var i = 12L
    var rate = -1; var channels = -1; var bits = -1; var fmt = -1
    var samples: Array[Short] = null
    while (i + 8 <= bytes.length && samples == null) {
      val off = i.toInt
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = le32(bytes, off + 4).toLong & 0xFFFFFFFFL
      if (i + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = le16(bytes, off + 8)
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" =>
          if (fmt != 1 || bits != 16 || channels < 1 || rate <= 0)
            return None
          val n = (size / 2).toInt
          val out = new Array[Short](n)
          var k = 0
          while (k < n) {
            out(k) = le16(bytes, off + 8 + 2 * k).toShort
            k += 1
          }
          samples = out
        case _ => ()
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (samples == null) None else Some(Wav(rate, channels, samples))
  }

  /** Encode PCM-16 samples as a minimal RIFF/WAVE payload. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) =>
        out(i + j) = b }
    def put32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte
      out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16); put16(20, 1)
    put16(22, channels); put32(24, sampleRate)
    put32(28, sampleRate * channels * 2); put16(32, channels * 2)
    put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen)
    var k = 0
    while (k < samples.length) { put16(44 + 2 * k, samples(k)); k += 1 }
    out
  }
}

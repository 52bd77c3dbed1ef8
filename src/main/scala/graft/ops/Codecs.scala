package graft.ops

/** REAL decoders for the media formats that need no external codec
  * library — pure byte parsing on the JVM: PPM (P6) raster images,
  * RIFF/WAVE PCM-16 audio, and PNG (whose only compression dependency,
  * zlib, ships in the JDK as `java.util.zip.Inflater`). These upgrade
  * [[Multimodal]]'s decode stage from "documented stub" to "real decode";
  * the remaining compressed formats (JPEG/FLAC/H.264) still fall back to
  * the documented deterministic stub, because their codecs genuinely
  * aren't in this container.
  *
  * All decoders are total: malformed, truncated, or foreign payloads
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

  /** Decoded PNG: dims + channel count (3 = RGB, 4 = RGBA) +
    * interleaved 8-bit samples, `width*height*channels` bytes.
    */
  final case class Png(width: Int, height: Int, channels: Int,
                       pixels: Array[Byte]) {
    /** Drop the alpha plane (if any) → interleaved RGB. */
    def toRgb: Array[Byte] =
      if (channels == 3) pixels
      else {
        val out = new Array[Byte](width * height * 3)
        var p = 0
        while (p < width * height) {
          out(p * 3) = pixels(p * 4)
          out(p * 3 + 1) = pixels(p * 4 + 1)
          out(p * 3 + 2) = pixels(p * 4 + 2)
          p += 1
        }
        out
      }
  }

  private val PngSig: Array[Int] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

  /** True iff the payload starts with the 8-byte PNG signature. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (0 until 8).forall(k => (bytes(k) & 0xFF) == PngSig(k))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** Parse a PNG on JDK zlib alone: signature → chunk walk (length /
    * type / data / CRC32, verified) → IHDR sanity (8-bit, color type 2
    * RGB or 6 RGBA, no interlace) → concatenated-IDAT inflate → per-
    * scanline un-filter (None/Sub/Up/Average/Paeth). Palette (3),
    * grayscale (0/4), 16-bit, and Adam7-interlaced images return None —
    * they're legal PNG but outside the 8-bit truecolor contract this
    * engine's image stats are defined on. Any structural damage —
    * truncated IDAT, a filter byte > 4, a corrupted CRC — also returns
    * None, never throws.
    */
  def decodePng(bytes: Array[Byte]): Option[Png] = {
    if (!isPng(bytes)) return None
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    var i = 8L
    while (!seenIend) {
      if (i + 12 > bytes.length) return None // header + CRC must fit
      val off = i.toInt
      val len = be32(bytes, off)
      if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length)
        return None
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(bytes, off + 4, 4 + len.toInt)
      if (crc.getValue != be32(bytes, off + 8 + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          val d = off + 8
          val wl = be32(bytes, d); val hl = be32(bytes, d + 4)
          val bitDepth = bytes(d + 8) & 0xFF
          val colorType = bytes(d + 9) & 0xFF
          val compression = bytes(d + 10) & 0xFF
          val filterMethod = bytes(d + 11) & 0xFF
          val interlace = bytes(d + 12) & 0xFF
          if (wl <= 0 || hl <= 0 || wl > MaxDim || hl > MaxDim ||
            bitDepth != 8 || (colorType != 2 && colorType != 6) ||
            compression != 0 || filterMethod != 0 || interlace != 0)
            return None
          w = wl.toInt; h = hl.toInt
          channels = if (colorType == 2) 3 else 4
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, off + 8, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) are legal noise
      }
      i += 12 + len
    }
    if (!seenIhdr || idat.size() == 0) return None

    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // truncated stream, or a preset-dictionary stream (illegal in
        // PNG) — both would otherwise spin forever at n == 0
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // un-filter in place into the output raster
    val out = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xFF
      if (f > 4) return None // bad filter byte
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawV = raw(src + x) & 0xFF
        val left = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(dst + x - stride) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) out(dst + x - stride - bpp) & 0xFF
                 else 0
        val recon = f match {
          case 0 => rawV
          case 1 => rawV + left
          case 2 => rawV + up
          case 3 => rawV + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            rawV + (if (pa <= pb && pa <= pc) left
                    else if (pb <= pc) up else ul)
        }
        out(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some(Png(w, h, channels, out))
  }

  /** Encode an 8-bit truecolor raster (3 = RGB or 4 = RGBA interleaved
    * samples) as a real PNG: filter-0 scanlines, one deflated IDAT,
    * CRC32 on every chunk. Output round-trips through [[decodePng]] and
    * any standards-conforming reader.
    */
  def encodePng(width: Int, height: Int, channels: Int,
                pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, "channels must be 3 or 4")
    require(pixels.length == width * height * channels,
      "pixels must be w*h*channels bytes")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) { // filter byte 0 (None) + the scanline verbatim
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1,
        stride)
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      try {
        d.setInput(raw); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        while (!d.finished()) buf.write(chunk, 0, d.deflate(chunk))
        buf.toByteArray
      } finally d.end()
    }
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(out.write)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      def p32(v: Long): Unit = {
        out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
        out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
      }
      p32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      p32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def b32(i: Int, v: Int): Unit = {
      ihdr(i) = ((v >> 24) & 0xFF).toByte; ihdr(i + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(i + 2) = ((v >> 8) & 0xFF).toByte; ihdr(i + 3) = (v & 0xFF).toByte
    }
    b32(0, width); b32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 3) 2 else 6).toByte // color type
    // compression / filter / interlace stay 0
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", deflated)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Container-agnostic raster decode: PPM (P6) or PNG (alpha dropped)
    * → interleaved RGB. The single entry point the [[Multimodal]] image
    * path dispatches through.
    */
  def decodeRaster(bytes: Array[Byte]): Option[Ppm] =
    decodePpm(bytes).orElse(
      decodePng(bytes).map(p => Ppm(p.width, p.height, 255, p.toRgb)))

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

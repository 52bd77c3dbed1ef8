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

  /** Container-agnostic raster decode: PPM (P6), PNG (alpha dropped)
    * or GIF (first frame) → interleaved RGB. The single entry point the
    * [[Multimodal]] image path dispatches through.
    */
  def decodeRaster(bytes: Array[Byte]): Option[Ppm] =
    decodePpm(bytes).orElse(
      decodePng(bytes).map(p => Ppm(p.width, p.height, 255, p.toRgb)))
      .orElse(decodeGif(bytes))

  // ---------------------------------------------------------------
  // FLAC — a REAL compressed audio codec on pure integer math (the
  // format is lossless, so unlike JPEG/H.264 it supports bit-exact
  // round trips an engine-independent oracle can check). Public spec:
  // RFC 9639 / xiph.org. Encoder emits the fixed-predictor subset
  // (orders 0-4, Rice residuals, independent channels); the decoder
  // additionally handles LPC subframes and wasted bits, rejecting
  // only stereo-decorrelation modes and non-16-bit depths (documented
  // subset — the engine's audio stats contract is PCM-16).
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(v: Long, bits: Int): Unit = {
      var b = bits
      while (b > 0) {
        val take = math.min(8 - nbits, b)
        acc = (acc << take) | ((v >>> (b - take)) & ((1L << take) - 1))
        nbits += take; b -= take
        if (nbits == 8) { buf.write(acc.toInt & 0xFF); acc = 0; nbits = 0 }
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a 1
      var i = 0
      while (i < q) { write(0, 1); i += 1 }
      write(1, 1)
    }
    def align(): Unit = if (nbits > 0) write(0, 8 - nbits)
    def bytes: Array[Byte] = { align(); buf.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    var failed = false
    def readBit(): Int = {
      if (pos >= bytes.length) { failed = true; 0 }
      else {
        val v = (bytes(pos) >> (7 - bit)) & 1
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        v
      }
    }
    def read(bits: Int): Long = {
      var v = 0L; var i = 0
      while (i < bits) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(bits: Int): Int = {
      val v = read(bits)
      (v << (64 - bits) >> (64 - bits)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (!failed && readBit() == 0) {
        q += 1
        if (q > (1 << 24)) { failed = true } // corrupt stream guard
      }
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    crc
  }

  private def zigzag(v: Int): Long = if (v >= 0) v.toLong << 1
                                     else ((-v.toLong) << 1) - 1
  private def unzigzag(u: Long): Int =
    (if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)).toInt

  /** Encode PCM-16 as real FLAC: per 4096-sample block and channel,
    * the best fixed predictor (order 0-4 by residual magnitude) with
    * one Rice partition, independent channels, CRC-8/16 stamped.
    * Output decodes in any conforming FLAC reader.
    */
  def encodeFlac(sampleRate: Int, channels: Int,
                 samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(channels >= 1 && channels <= 8, "1-8 channels")
    require(samples.length % channels == 0, "ragged interleave")
    val nPer = samples.length / channels
    require(nPer > 0, "empty signal")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block): 34 bytes
    val si = new BitWriter
    val maxBs = math.min(nPer, 4096)
    si.write(1, 1); si.write(0, 7) // last-block, type 0
    si.write(34, 24)
    si.write(maxBs, 16); si.write(maxBs, 16) // min/max block size
    si.write(0, 24); si.write(0, 24) // min/max frame size unknown
    si.write(sampleRate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5) // bits-per-sample - 1
    si.write(nPer, 36)
    si.write(0, 64); si.write(0, 64) // md5 unknown (legal zeros)
    out.write(si.bytes)

    var start = 0
    var frameIdx = 0L
    while (start < nPer) {
      val bs = math.min(4096, nPer - start)
      val fw = new BitWriter
      fw.write(0x3FFE, 14) // sync
      fw.write(0, 1) // reserved
      fw.write(0, 1) // fixed blocking
      fw.write(7, 4)  // block size: 16-bit value at end of header
      fw.write(0, 4)  // sample rate: from STREAMINFO
      fw.write(channels - 1, 4) // independent channels
      fw.write(4, 3)  // sample size: 16-bit
      fw.write(0, 1)  // reserved
      // UTF-8-coded frame number (values < 2^16 need <= 3 bytes)
      if (frameIdx < 0x80) fw.write(frameIdx, 8)
      else if (frameIdx < 0x800) {
        fw.write(0xC0 | (frameIdx >> 6), 8)
        fw.write(0x80 | (frameIdx & 0x3F), 8)
      } else {
        fw.write(0xE0 | (frameIdx >> 12), 8)
        fw.write(0x80 | ((frameIdx >> 6) & 0x3F), 8)
        fw.write(0x80 | (frameIdx & 0x3F), 8)
      }
      fw.write(bs - 1, 16)
      val headerBytes = fw.bytes // byte-aligned here by construction
      val fw2 = new BitWriter
      headerBytes.foreach(b => fw2.write(b & 0xFFL, 8))
      fw2.write(crc8(headerBytes, 0, headerBytes.length), 8)
      var ch = 0
      while (ch < channels) {
        val x = new Array[Int](bs)
        var i = 0
        while (i < bs) { x(i) = samples((start + i) * channels + ch); i += 1 }
        writeSubframe(fw2, x)
        ch += 1
      }
      fw2.align()
      val frameBytes = fw2.bytes
      out.write(frameBytes)
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
      start += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** One subframe: constant if flat, else best fixed predictor with a
    * single Rice partition (partition order 0).
    */
  private def writeSubframe(w: BitWriter, x: Array[Int]): Unit = {
    val n = x.length
    if (x.forall(_ == x(0))) {
      w.write(0, 1); w.write(0, 6); w.write(0, 1) // constant, no waste
      w.write(x(0).toLong & 0xFFFF, 16)
      return
    }
    // residuals for fixed orders 0..4; pick the smallest |sum|
    val maxOrder = math.min(4, n - 1)
    var bestOrder = 0
    var bestCost = Long.MaxValue
    var bestRes: Array[Int] = null
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResidual(x, o)
      var cost = 0L
      var i = 0
      while (i < res.length) { cost += math.abs(res(i).toLong); i += 1 }
      if (cost < bestCost) { bestCost = cost; bestOrder = o; bestRes = res }
      o += 1
    }
    w.write(0, 1); w.write(8 + bestOrder, 6); w.write(0, 1) // fixed(o)
    var i = 0
    while (i < bestOrder) { w.write(x(i).toLong & 0xFFFF, 16); i += 1 }
    // Rice parameter k minimizing emitted bits (exact, small search)
    val m = bestRes.length
    var k = 0; var bestBits = Long.MaxValue
    var kk = 0
    while (kk <= 14) {
      var bits = 0L
      var j = 0
      while (j < m) { bits += (zigzag(bestRes(j)) >>> kk) + 1 + kk; j += 1 }
      if (bits < bestBits) { bestBits = bits; k = kk }
      kk += 1
    }
    w.write(0, 2) // residual method: 4-bit Rice
    w.write(0, 4) // partition order 0 — one partition
    w.write(k, 4)
    var j = 0
    while (j < m) {
      val u = zigzag(bestRes(j))
      w.writeUnary((u >>> k).toInt)
      if (k > 0) w.write(u & ((1L << k) - 1), k)
      j += 1
    }
  }

  private def fixedResidual(x: Array[Int], order: Int): Array[Int] = {
    val n = x.length
    val res = new Array[Int](n - order)
    var i = order
    while (i < n) {
      res(i - order) = order match {
        case 0 => x(i)
        case 1 => x(i) - x(i - 1)
        case 2 => x(i) - 2 * x(i - 1) + x(i - 2)
        case 3 => x(i) - 3 * x(i - 1) + 3 * x(i - 2) - x(i - 3)
        case 4 => x(i) - 4 * x(i - 1) + 6 * x(i - 2) - 4 * x(i - 3) +
          x(i - 4)
      }
      i += 1
    }
    res
  }

  /** True iff the payload starts with the FLAC stream marker. */
  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C'

  /** Decode FLAC to PCM-16: STREAMINFO + metadata walk, then frames —
    * constant / verbatim / fixed(0-4) / LPC subframes, Rice residuals
    * (both 4- and 5-bit parameter widths, escape partitions), wasted
    * bits, CRC-8 and CRC-16 verified. Returns None for non-16-bit
    * streams, stereo-decorrelation modes (outside the engine's PCM-16
    * stats contract), or any structural damage — never throws.
    */
  def decodeFlac(bytes: Array[Byte]): Option[Wav] = {
    if (!isFlac(bytes)) return None
    var pos = 4
    var sampleRate = -1; var channels = -1; var bps = -1
    var totalSamples = -1L
    var last = false
    var seenStreamInfo = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val hdr = bytes(pos) & 0xFF
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      pos += 4
      if (pos + len > bytes.length) return None
      if (btype == 0) {
        if (len != 34) return None
        val r = new BitReader(bytes, pos)
        r.read(16); r.read(16); r.read(24); r.read(24)
        sampleRate = r.read(20).toInt
        channels = r.read(3).toInt + 1
        bps = r.read(5).toInt + 1
        totalSamples = r.read(36)
        seenStreamInfo = true
      }
      pos += len
    }
    if (!seenStreamInfo || sampleRate <= 0 || bps != 16 ||
      totalSamples <= 0 || totalSamples > Int.MaxValue / channels)
      return None

    val outSamples = new Array[Short]((totalSamples * channels).toInt)
    var filled = 0L
    while (filled < totalSamples) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      if (r.read(14) != 0x3FFE) return None
      r.read(1) // reserved
      r.read(1) // blocking strategy (either is fine)
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chanAsgn = r.read(4).toInt
      val ssCode = r.read(3).toInt
      r.read(1)
      // sample size: 16-bit directly, or "from STREAMINFO" (known 16)
      if (!(ssCode == 4 || ssCode == 0)) return None
      if (chanAsgn > 7) return None // stereo decorrelation: unsupported
      if (chanAsgn + 1 != channels) return None
      // UTF-8-coded frame/sample number: skip per its length prefix
      val first = r.read(8).toInt
      var extra = 0
      if ((first & 0x80) != 0) {
        var mask = 0x40
        while ((first & mask) != 0) { extra += 1; mask >>= 1 }
        if (extra == 0 || extra > 6) return None
        var i = 0
        while (i < extra) {
          if ((r.read(8).toInt & 0xC0) != 0x80) return None
          i += 1
        }
      }
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None // 0 is reserved
      }
      srCode match { // inline sample-rate payloads must be skipped
        case 12 => r.read(8)
        case 13 | 14 => r.read(16)
        case 15 => return None
        case _ => ()
      }
      // CRC-8 covers the header bytes up to (not incl.) the CRC byte
      if (r.bit != 0) return None // header is byte-aligned by spec
      val hcrc = r.read(8).toInt
      if (crc8(bytes, frameStart, r.pos - 1) != hcrc) return None
      if (filled + blockSize > totalSamples) return None

      val chData = new Array[Array[Int]](channels)
      var ch = 0
      while (ch < channels) {
        chData(ch) = readSubframe(r, blockSize, bps) match {
          case null => return None
          case d => d
        }
        ch += 1
      }
      r.alignByte()
      if (r.failed || r.pos + 2 > bytes.length) return None
      val fcrc = ((bytes(r.pos) & 0xFF) << 8) | (bytes(r.pos + 1) & 0xFF)
      if (crc16(bytes, frameStart, r.pos) != fcrc) return None
      pos = r.pos + 2
      var i = 0
      while (i < blockSize) {
        var c = 0
        while (c < channels) {
          outSamples(((filled + i) * channels + c).toInt) =
            chData(c)(i).toShort
          c += 1
        }
        i += 1
      }
      filled += blockSize
    }
    Some(Wav(sampleRate, channels, outSamples))
  }

  /** One subframe; null on any malformed shape (Option boxing per
    * sample would dominate the decode loop).
    */
  private def readSubframe(r: BitReader, n: Int, bps: Int): Array[Int] = {
    if (r.read(1) != 0) return null
    val ty = r.read(6).toInt
    val wastedFlag = r.read(1).toInt
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val ebps = bps - wasted
    if (ebps <= 0 || ebps > 32) return null
    val x = new Array[Int](n)
    def finish(): Array[Int] = {
      if (r.failed) return null
      if (wasted > 0) { var i = 0; while (i < n) { x(i) <<= wasted; i += 1 } }
      x
    }
    if (ty == 0) { // constant
      val v = r.readSigned(ebps)
      java.util.Arrays.fill(x, v)
      finish()
    } else if (ty == 1) { // verbatim
      var i = 0
      while (i < n) { x(i) = r.readSigned(ebps); i += 1 }
      finish()
    } else if (ty >= 8 && ty <= 12) { // fixed, order = ty - 8
      val order = ty - 8
      if (order > n) return null
      var i = 0
      while (i < order) { x(i) = r.readSigned(ebps); i += 1 }
      val res = readResiduals(r, n, order)
      if (res == null) return null
      i = order
      while (i < n) {
        val p = order match {
          case 0 => 0
          case 1 => x(i - 1)
          case 2 => 2 * x(i - 1) - x(i - 2)
          case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
          case 4 => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
        }
        x(i) = p + res(i - order)
        i += 1
      }
      finish()
    } else if (ty >= 32) { // LPC, order = ty - 31
      val order = ty - 31
      if (order > n) return null
      var i = 0
      while (i < order) { x(i) = r.readSigned(ebps); i += 1 }
      val precision = r.read(4).toInt + 1
      if (precision == 16) return null // 1111 is invalid per spec
      val shift = r.readSigned(5)
      if (shift < 0) return null
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      val res = readResiduals(r, n, order)
      if (res == null) return null
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * x(i - 1 - j); j += 1 }
        x(i) = (acc >> shift).toInt + res(i - order)
        i += 1
      }
      finish()
    } else null
  }

  private def readResiduals(r: BitReader, n: Int,
                            order: Int): Array[Int] = {
    val method = r.read(2).toInt
    if (method > 1) return null
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = r.read(4).toInt
    val nParts = 1 << partOrder
    if (n % nParts != 0) return null
    val perPart = n >> partOrder
    if (perPart <= order && nParts == 1) return null
    val res = new Array[Int](n - order)
    var idx = 0
    var p = 0
    while (p < nParts) {
      val cnt = if (p == 0) perPart - order else perPart
      if (cnt < 0) return null
      val param = r.read(pBits).toInt
      if (param == escape) {
        val raw = r.read(5).toInt
        var i = 0
        while (i < cnt) { res(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary()
          val u = (q.toLong << param) |
            (if (param > 0) r.read(param) else 0L)
          res(idx) = unzigzag(u); idx += 1; i += 1
        }
      }
      if (r.failed) return null
      p += 1
    }
    res
  }

  /** Container-agnostic PCM-16 audio decode: RIFF/WAVE or FLAC — the
    * audio twin of [[decodeRaster]].
    */
  def decodeAudio(bytes: Array[Byte]): Option[Wav] =
    decodeWavPcm16(bytes).orElse(decodeFlac(bytes))

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

  // ---------------------------------------------------------------
  // GIF — a REAL compressed image codec on pure JDK (the palette +
  // variable-width LZW format is lossless for rasters with ≤256
  // distinct colors, so — like FLAC, unlike JPEG — it supports the
  // bit-exact round trips an engine-independent oracle can check).
  // Public spec: GIF87a/89a (CompuServe; W3C mirror). Encoder emits a
  // single image with a global color table and true LZW compression
  // (growing dictionary, width escalation, 4096-entry reset); decoder
  // handles 87a and 89a, extensions, local color tables, interlace,
  // and multi-frame files (first frame wins — the still-image
  // contract of the stats path).
  // ---------------------------------------------------------------

  /** True iff the payload starts with a GIF87a/89a signature. */
  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** Encode an interleaved-RGB raster as a single-frame GIF87a.
    * Palette-exact: requires ≤256 distinct colors (the format's hard
    * limit — a production pipeline would quantize first; the engine's
    * closed-form test rasters are within it by construction).
    */
  def encodeGif(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length mismatch")
    // scan-order palette
    val palette = new java.util.LinkedHashMap[Integer, Integer]()
    val indices = new Array[Int](width * height)
    var p = 0
    while (p < width * height) {
      val c = ((rgb(p * 3) & 0xFF) << 16) | ((rgb(p * 3 + 1) & 0xFF) << 8) |
        (rgb(p * 3 + 2) & 0xFF)
      var idx = palette.get(c)
      if (idx == null) {
        idx = palette.size()
        require(idx < 256, "GIF encoder: raster has > 256 distinct colors")
        palette.put(c, idx)
      }
      indices(p) = idx
      p += 1
    }
    // table size 2^gctBits ≥ palette size; LZW min code size ≥ 2
    var gctBits = 2
    while ((1 << gctBits) < palette.size()) gctBits += 1
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    "GIF87a".foreach(c => u8(c.toInt))
    u16(width); u16(height)
    u8(0x80 | ((gctBits - 1) << 4) | (gctBits - 1)); u8(0); u8(0)
    val it = palette.keySet().iterator()
    var written = 0
    while (it.hasNext) {
      val c = it.next().intValue()
      u8(c >> 16); u8(c >> 8); u8(c); written += 1
    }
    while (written < (1 << gctBits)) { u8(0); u8(0); u8(0); written += 1 }
    u8(0x2C); u16(0); u16(0); u16(width); u16(height); u8(0)
    val minCode = gctBits
    u8(minCode)
    // LZW, LSB-first bit packing
    val clear = 1 << minCode
    val eoi = clear + 1
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var codeWidth = minCode + 1
    var dict = new java.util.HashMap[Long, Integer]()
    var nextCode = eoi + 1
    // Width escalation follows the canonical (giflib) convention: the
    // post-pack check reads the PRE-add nextCode, so the width grows
    // one code later than the naive reading of the spec — the decoder
    // mirrors this with a read counter that runs one ahead of its
    // dictionary slot.
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += codeWidth
      while (nbits >= 8) { data.write((acc & 0xFF).toInt); acc >>= 8; nbits -= 8 }
      if (nextCode >= (1 << codeWidth) && codeWidth < 12) codeWidth += 1
    }
    emit(clear)
    if (indices.nonEmpty) {
      var cur = indices(0)
      var i = 1
      while (i < indices.length) {
        val k = indices(i)
        val key = (cur.toLong << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          if (nextCode >= 4095) {
            emit(clear)
            dict = new java.util.HashMap[Long, Integer]()
            nextCode = eoi + 1; codeWidth = minCode + 1
          } else {
            dict.put(key, nextCode); nextCode += 1
          }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(eoi)
    if (nbits > 0) data.write((acc & 0xFF).toInt)
    // sub-block the code stream
    val cs = data.toByteArray
    var off = 0
    while (off < cs.length) {
      val n = math.min(255, cs.length - off)
      u8(n); out.write(cs, off, n); off += n
    }
    u8(0); u8(0x3B)
    out.toByteArray
  }

  /** Decode a GIF (87a/89a; first frame of animations) to interleaved
    * RGB. Returns None on anything malformed — truncation, bad LZW
    * codes, missing color table — never throws.
    */
  def decodeGif(bytes: Array[Byte]): Option[Ppm] = {
    if (!isGif(bytes)) return None
    try {
      var pos = 6
      def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val v = (bytes(pos) & 0xFF) |
        ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
      val sw = u16(); val sh = u16()
      val packed = u8(); u8(); u8() // bg index, aspect
      var globalTable: Array[Int] = null
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 7) + 1)
        globalTable = Array.tabulate(n) { _ =>
          val r = u8(); val g = u8(); val b = u8(); (r << 16) | (g << 8) | b
        }
      }
      while (pos < bytes.length) {
        (u8(): @annotation.switch) match {
          case 0x3B => return None // trailer before any image
          case 0x21 => // extension: label + sub-blocks
            u8()
            var n = u8()
            while (n != 0) { pos += n; n = u8() }
          case 0x2C =>
            u16(); u16() // left, top (single-frame contract: composite at origin)
            val iw = u16(); val ih = u16()
            // bounded allocation: a malformed header must not drive a
            // multi-GB array (64 MPix cap ≫ any real single frame here)
            if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26))
              return None
            val ipacked = u8()
            val table =
              if ((ipacked & 0x80) != 0) {
                val n = 1 << ((ipacked & 7) + 1)
                Array.tabulate(n) { _ =>
                  val r = u8(); val g = u8(); val b = u8()
                  (r << 16) | (g << 8) | b
                }
              } else globalTable
            if (table == null) return None
            val minCode = u8()
            if (minCode < 2 || minCode > 8) return None
            // gather LZW sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              data.write(bytes, pos, n); pos += n; n = u8()
            }
            val cs = data.toByteArray
            val nPix = iw * ih
            val indices = new Array[Int](nPix)
            // LZW decode: prefix/suffix chain table
            val clear = 1 << minCode
            val eoi = clear + 1
            val prefix = new Array[Int](4096)
            val suffix = new Array[Int](4096)
            var nextCode = eoi + 1
            var width = minCode + 1
            // read counter for width escalation — runs ONE AHEAD of
            // nextCode (see the encoder comment; giflib convention)
            var counter = eoi + 1
            var bitPos = 0
            def read(): Int = {
              if (bitPos + width > cs.length * 8) return -1
              var v = 0; var got = 0
              while (got < width) {
                val byte = cs(bitPos >> 3) & 0xFF
                val avail = 8 - (bitPos & 7)
                val take = math.min(avail, width - got)
                v |= ((byte >> (bitPos & 7)) & ((1 << take) - 1)) << got
                got += take; bitPos += take
              }
              counter += 1
              if (counter > (1 << width) && width < 12) width += 1
              v
            }
            val stack = new Array[Int](4097)
            var out = 0
            var prev = -1
            var done = false
            while (!done && out < nPix) {
              val code = read()
              if (code < 0 || code == eoi) done = true
              else if (code == clear) {
                nextCode = eoi + 1; width = minCode + 1; prev = -1
                counter = eoi + 1
              } else {
                if (code > nextCode || (code == nextCode && prev < 0))
                  return None
                var sp = 0
                var c = if (code == nextCode) prev else code
                val firstOfPrev = {
                  var t = prev
                  while (t >= clear + 2) t = prefix(t)
                  t
                }
                if (code == nextCode) { stack(sp) = firstOfPrev; sp += 1 }
                while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1
                  c = prefix(c) }
                stack(sp) = c; sp += 1
                val first = c
                // pop in reverse = sequence order
                var j = sp - 1
                while (j >= 0 && out < nPix) {
                  indices(out) = stack(j); out += 1; j -= 1
                }
                if (prev >= 0 && nextCode < 4095) {
                  prefix(nextCode) = prev; suffix(nextCode) = first
                  nextCode += 1
                }
                prev = code
              }
            }
            if (out < nPix) return None
            // de-interlace if flagged
            val rowOrder: Array[Int] =
              if ((ipacked & 0x40) != 0) {
                val order = new Array[Int](ih)
                var r = 0
                for (start <- Seq(0, 4, 2, 1); step = if (start == 0) 8
                       else start * 2;
                     y <- start.until(ih, step)) { order(r) = y; r += 1 }
                // order(k) = source row k lands at display row order(k)
                val inv = new Array[Int](ih)
                for (k <- 0 until ih) inv(order(k)) = k
                inv
              } else null
            val rgb = new Array[Byte](nPix * 3)
            var q = 0
            while (q < nPix) {
              val y = q / iw
              val srcRow = if (rowOrder == null) y else rowOrder(y)
              val idx = indices(srcRow * iw + q % iw)
              if (idx >= table.length) return None
              val c = table(idx)
              rgb(q * 3) = (c >> 16).toByte
              rgb(q * 3 + 1) = (c >> 8).toByte
              rgb(q * 3 + 2) = c.toByte
              q += 1
            }
            // screen vs image dims: single-frame contract is the image
            return Some(Ppm(iw, ih, 255, rgb))
          case _ => return None
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }
}

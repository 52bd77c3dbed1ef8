package graft.ops

/** REAL decoders for the media formats that need no external codec
  * library — pure byte parsing on the JVM: PPM (P6) rasters, RIFF/WAVE
  * PCM-16 audio, PNG (zlib ships in the JDK as `java.util.zip
  * .Inflater`), GIF (true LZW), FLAC (pure integer bitstream), and
  * baseline JPEG (DCT + canonical Huffman, all plain arithmetic).
  * These upgrade [[Multimodal]]'s decode stage from "documented stub"
  * to "real decode"; only inter-frame video (H.264 et al.) still falls
  * back to the documented deterministic stub — that codec class
  * genuinely isn't implementable-from-spec within this scope.
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
  // JPEG decode buffers are Int PLANES (4 B/px/component), not byte
  // triples — a dedicated, tighter pixel budget: 64 Mpx × 3 × 4 B ≤
  // 768 MiB of planes, bounded before any allocation in decodeScan
  private val JpegMaxPixels = 1L << 26

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
      .orElse(decodeJpeg(bytes))

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
  def encodeGif(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    encodeGifFrames(width, height, Seq(rgb))

  /** Encode one or more full-size RGB frames as a multi-image GIF —
    * the VIDEO writer: every frame is a complete replacement image at
    * the origin (no inter-frame deltas), the shape [[decodeGifFrames]]
    * renders independently. One GLOBAL palette spans all frames (≤256
    * distinct colors total, scan order across frames); each frame gets
    * its own image descriptor and an independent LZW stream.
    */
  def encodeGifFrames(width: Int, height: Int,
                      framesRgb: Seq[Array[Byte]]): Array[Byte] = {
    require(framesRgb.nonEmpty, "GIF encoder: at least one frame")
    framesRgb.foreach(f =>
      require(f.length == width * height * 3, "rgb length mismatch"))
    // scan-order palette across ALL frames
    val palette = new java.util.LinkedHashMap[Integer, Integer]()
    val frameIndices = framesRgb.map { rgb =>
      val indices = new Array[Int](width * height)
      var p = 0
      while (p < width * height) {
        val c = ((rgb(p * 3) & 0xFF) << 16) |
          ((rgb(p * 3 + 1) & 0xFF) << 8) | (rgb(p * 3 + 2) & 0xFF)
        var idx = palette.get(c)
        if (idx == null) {
          idx = palette.size()
          require(idx < 256, "GIF encoder: > 256 distinct colors")
          palette.put(c, idx)
        }
        indices(p) = idx
        p += 1
      }
      indices
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
    for (indices <- frameIndices) {
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
        while (nbits >= 8) {
          data.write((acc & 0xFF).toInt); acc >>= 8; nbits -= 8
        }
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
      u8(0) // image data terminator
    }
    u8(0x3B)
    out.toByteArray
  }

  /** Decode a GIF (87a/89a; first frame of animations) to interleaved
    * RGB. Returns None on anything malformed — truncation, bad LZW
    * codes, missing color table — never throws.
    */
  def decodeGif(bytes: Array[Byte]): Option[Ppm] =
    decodeGifFrames(bytes, maxFrames = 1).map(_.head)

  /** Decode up to `maxFrames` frames of a (possibly animated) GIF —
    * the engine's VIDEO surface: a multi-image GIF is a real, fully
    * decodable frame container on pure JVM, where inter-frame codecs
    * (H.264) stay stubbed. Each frame decodes independently at its own
    * descriptor dims (no disposal compositing — the [[encodeGifFrames]]
    * writer emits full-size replacement frames, the contract the frame
    * stats are defined on). Stops cleanly at `maxFrames` without
    * parsing the remainder, so first-frame probes stay cheap on long
    * animations.
    */
  def decodeGifFrames(bytes: Array[Byte],
                      maxFrames: Int = 1024): Option[Vector[Ppm]] = {
    if (!isGif(bytes) || maxFrames <= 0) return None
    val frames = Vector.newBuilder[Ppm]
    var nFrames = 0
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
          case 0x3B => // trailer: done (None when no image preceded it)
            return if (nFrames > 0) Some(frames.result()) else None
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
            // screen vs image dims: per-frame contract is the image
            frames += Ppm(iw, ih, 255, rgb)
            nFrames += 1
            if (nFrames >= maxFrames) return Some(frames.result())
          case _ => return None
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  // ---------------------------------------------------------------
  // JPEG — baseline sequential DCT (ITU-T T.81), pure JVM: marker
  // walk, DQT/DHT/SOF0/SOS parse, canonical Huffman entropy coding
  // with 0xFF byte stuffing, dequant + 2-D IDCT + level shift, JFIF
  // YCbCr↔RGB. Encoder emits grayscale or 4:4:4 color with the Annex
  // K quantization tables (IJG quality scaling) and the Annex K
  // "typical" Huffman tables; the decoder reads whatever tables the
  // FILE carries (it never assumes the typical ones), handles restart
  // markers, and rejects progressive (SOF2), 12-bit, and subsampled
  // streams with None — legal JPEG outside the baseline 4:4:4 / gray
  // contract this engine's image stats are defined on.
  //
  // JPEG is LOSSY, so unlike PNG/GIF/FLAC a general raster cannot
  // round-trip bit-exactly. But a raster that is CONSTANT on each
  // aligned 8×8 tile encodes to DC-only blocks, and a DC whose
  // level-shifted value satisfies 8·(v−128) ≡ 0 (mod qDC) survives
  // quantization exactly — the mm11 oracle exploits this to state
  // bit-exact expectations through the full entropy pipeline, while
  // PipelineOpsSpec bounds the error on arbitrary rasters.
  // ---------------------------------------------------------------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K quantization tables, row-major
  private val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** IJG quality scaling: q=50 leaves Annex K untouched. */
  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(t => math.max(1, math.min(255, (t * scale + 50) / 100)))
  }

  // Annex K "typical" Huffman tables: bits(1..16) + symbol values
  private val DcLumaBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits =
    Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits =
    Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman code assignment from a (bits, values) DHT
    * payload: codes of each length are consecutive, lengths ascending
    * — T.81 Annex C. Returns per-symbol (code, length).
    */
  private final class HuffEncTable(bits: Array[Int], vals: Array[Byte]) {
    require(bits.length == 17 && bits.drop(1).sum == vals.length,
      "huffman bits/values mismatch")
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          val sym = vals(k) & 0xFF
          code(sym) = c; size(sym) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1; l += 1
      }
    }
  }

  /** Decoder-side canonical table: mincode/maxcode/valptr per length
    * (T.81 F.2.2.3 DECODE).
    */
  private final class HuffDecTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var c = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = c
        c += bits(l); k += bits(l)
        maxCode(l) = c - 1 // -1 when empty: c-1 < minCode
        c <<= 1; l += 1
      }
    }
  }

  private def fdct8(in: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += in(x * 8 + y) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct8(in: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
            val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
            s += cu * cv * in(u * 8 + v) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            v += 1
          }
          u += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** MSB-first bit sink with JPEG 0xFF → 0xFF 0x00 byte stuffing;
    * flush pads the final byte with 1-bits (T.81 F.1.2.3).
    */
  private final class JBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (n != 0) write(1, 1)
  }

  private def bitLen(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  /** Encode planar 8-bit samples as baseline JFIF. `planes` are full-
    * resolution component planes (1 = grayscale, 3 = YCbCr 4:4:4);
    * partial edge blocks pad by edge replication.
    */
  private def encodeJfif(width: Int, height: Int,
                         planes: Array[Array[Int]],
                         quality: Int): Array[Byte] = {
    val nc = planes.length
    require(nc == 1 || nc == 3, "1 (gray) or 3 (YCbCr) planes")
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim)
    val qLuma = scaleQuant(QLuma, quality)
    val qChroma = scaleQuant(QChroma, quality)
    val dcLuma = new HuffEncTable(DcLumaBits, DcLumaVals)
    val acLuma = new HuffEncTable(AcLumaBits, AcLumaVals)
    val dcChroma = new HuffEncTable(DcChromaBits, DcChromaVals)
    val acChroma = new HuffEncTable(AcChromaBits, AcChromaVals)
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xFF); b(m) }
    marker(0xD8) // SOI
    marker(0xE0) // APP0 / JFIF
    b16(16); b('J'); b('F'); b('I'); b('F'); b(0)
    b(1); b(1); b(0); b16(1); b16(1); b(0); b(0)
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xDB); b16(67); b(id)
      var i = 0
      while (i < 64) { b(t(ZigZag(i))); i += 1 }
    }
    dqt(0, qLuma)
    if (nc == 3) dqt(1, qChroma)
    marker(0xC0) // SOF0
    b16(8 + 3 * nc); b(8); b16(height); b16(width); b(nc)
    var ci = 0
    while (ci < nc) {
      b(ci + 1); b(0x11); b(if (ci == 0) 0 else 1); ci += 1
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xC4); b16(19 + vals.length); b((tc << 4) | th)
      var l = 1
      while (l <= 16) { b(bits(l)); l += 1 }
      vals.foreach(v => b(v & 0xFF))
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (nc == 3) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    marker(0xDA) // SOS
    b16(6 + 2 * nc); b(nc)
    ci = 0
    while (ci < nc) {
      b(ci + 1); b(if (ci == 0) 0x00 else 0x11); ci += 1
    }
    b(0); b(63); b(0)
    val w = new JBitWriter(out)
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val dcPred = new Array[Int](nc)
    def emit(tbl: HuffEncTable, sym: Int): Unit =
      w.write(tbl.code(sym), tbl.size(sym))
    def emitValue(v: Int): Unit = {
      val s = bitLen(math.abs(v))
      if (s > 0) w.write(if (v >= 0) v else v + (1 << s) - 1, s)
    }
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        ci = 0
        while (ci < nc) {
          val plane = planes(ci)
          val block = new Array[Double](64)
          var x = 0
          while (x < 8) {
            val sy = math.min(by * 8 + x, height - 1)
            var y = 0
            while (y < 8) {
              val sx = math.min(bx * 8 + y, width - 1)
              block(x * 8 + y) = plane(sy * width + sx) - 128.0
              y += 1
            }
            x += 1
          }
          val coef = fdct8(block)
          val qt = if (ci == 0) qLuma else qChroma
          val q = new Array[Int](64)
          var i = 0
          while (i < 64) {
            q(i) = math.round(coef(ZigZag(i)) / qt(ZigZag(i))).toInt
            i += 1
          }
          val dcT = if (ci == 0) dcLuma else dcChroma
          val acT = if (ci == 0) acLuma else acChroma
          val diff = q(0) - dcPred(ci)
          dcPred(ci) = q(0)
          emit(dcT, bitLen(math.abs(diff)))
          emitValue(diff)
          var k = 1
          var run = 0
          while (k < 64) {
            if (q(k) == 0) run += 1
            else {
              while (run > 15) { emit(acT, 0xF0); run -= 16 }
              val s = bitLen(math.abs(q(k)))
              emit(acT, (run << 4) | s)
              emitValue(q(k))
              run = 0
            }
            k += 1
          }
          if (run > 0) emit(acT, 0x00) // EOB
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    w.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit grayscale raster (`width*height` bytes) as a
    * baseline grayscale JFIF payload.
    */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Byte],
                     quality: Int = 75): Array[Byte] = {
    require(gray.length == width * height, "gray plane size mismatch")
    val plane = new Array[Int](gray.length)
    var i = 0
    while (i < gray.length) { plane(i) = gray(i) & 0xFF; i += 1 }
    encodeJfif(width, height, Array(plane), quality)
  }

  /** Encode interleaved RGB as baseline 4:4:4 color JFIF (JFIF
    * YCbCr transform, no chroma subsampling).
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
                 quality: Int = 75): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb size mismatch")
    val n = width * height
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var p = 0
    while (p < n) {
      val r = rgb(p * 3) & 0xFF
      val g = rgb(p * 3 + 1) & 0xFF
      val bl = rgb(p * 3 + 2) & 0xFF
      yP(p) = clamp255(math.round(0.299 * r + 0.587 * g + 0.114 * bl))
      cbP(p) = clamp255(math.round(-0.168736 * r - 0.331264 * g
        + 0.5 * bl + 128))
      crP(p) = clamp255(math.round(0.5 * r - 0.418688 * g
        - 0.081312 * bl + 128))
      p += 1
    }
    encodeJfif(width, height, Array(yP, cbP, crP), quality)
  }

  /** True iff the payload starts with the JPEG SOI marker. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 &&
      (bytes(2) & 0xFF) == 0xFF

  /** Entropy-segment bit reader: MSB-first, un-stuffs 0xFF 0x00, and
    * treats any other 0xFF-marker as end-of-data (fails the read).
    */
  private final class JBitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var failed = false
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= bytes.length) { failed = true; return 0 }
        var v = bytes(pos) & 0xFF
        pos += 1
        if (v == 0xFF) {
          if (pos >= bytes.length) { failed = true; return 0 }
          val m = bytes(pos) & 0xFF
          if (m == 0x00) pos += 1
          else { failed = true; return 0 } // a real marker: stop
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def read(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and step over an expected RSTn marker. */
    def restart(): Boolean = {
      n = 0
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xFF) != 0xFF) return false
      val m = bytes(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
  }

  private def huffDecode(r: JBitReader, t: HuffDecTable): Int = {
    var c = r.readBit()
    var l = 1
    while (l <= 16) {
      // the >= guard rejects codes below an EMPTY length's range on
      // corrupt streams (maxCode = minCode-1 there, so <= alone would
      // admit them with a negative value offset)
      if (c >= t.minCode(l) && c <= t.maxCode(l))
        return t.values(t.valPtr(l) + c - t.minCode(l)) & 0xFF
      c = (c << 1) | r.readBit()
      l += 1
    }
    r.failed = true
    0
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JPEG: grayscale or 3-component 4:4:4 (all
    * sampling factors 1). Progressive, 12-bit, arithmetic-coded,
    * hierarchical, and subsampled streams return None, as does any
    * structural damage — truncated entropy data, an over-long Huffman
    * code, a bad marker length. Output: [[Ppm]] RGB (gray replicates
    * the single plane).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[Ppm] = {
    if (!isJpeg(bytes)) return None
    try decodeJpegInner(bytes)
    catch { case _: IndexOutOfBoundsException => None }
  }

  private def decodeJpegInner(bytes: Array[Byte]): Option[Ppm] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecTable](4)
    val acTabs = new Array[HuffDecTable](4)
    var width = 0; var height = 0; var nc = 0
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    def u16(i: Int): Int = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
    var i = 2
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      val m = bytes(i + 1) & 0xFF
      if (m == 0xD9) return None // EOI before SOS
      val len = u16(i + 2)
      if (len < 2 || i + 2 + len > bytes.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xDB => // DQT: one or more tables
          var p = seg
          while (p < segEnd) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0x0F
            if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = bytes(p + 1 + k) & 0xFF; k += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xC4 => // DHT: one or more tables
          var p = seg
          while (p < segEnd) {
            val tc = (bytes(p) & 0xFF) >> 4
            val th = bytes(p) & 0x0F
            if (tc > 1 || th > 3) return None
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) {
              bits(l) = bytes(p + l) & 0xFF; total += bits(l); l += 1
            }
            if (p + 17 + total > segEnd || total > 256) return None
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17,
              p + 17 + total)
            val t = new HuffDecTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
        case 0xC0 => // SOF0 baseline
          if (bytes(seg) != 8) return None
          height = u16(seg + 1); width = u16(seg + 3)
          nc = bytes(seg + 5) & 0xFF
          if (width <= 0 || height <= 0 || width > MaxDim ||
            height > MaxDim || (nc != 1 && nc != 3)) return None
          compQ = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val hv = bytes(seg + 7 + 3 * c) & 0xFF
            if (hv != 0x11) return None // 4:4:4 / gray only
            compQ(c) = bytes(seg + 8 + 3 * c) & 0x0F
            c += 1
          }
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
            0xCB | 0xCD | 0xCE | 0xCF =>
          return None // non-baseline SOF
        case 0xDD =>
          restartInterval = u16(seg)
        case 0xDA => // SOS → entropy-coded data follows
          if (compQ == null) return None
          val ns = bytes(seg) & 0xFF
          if (ns != nc) return None
          compDc = new Array[Int](nc)
          compAc = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val id = bytes(seg + 1 + 2 * c) & 0xFF
            if (id != c + 1) return None
            compDc(c) = (bytes(seg + 2 + 2 * c) & 0xFF) >> 4
            compAc(c) = bytes(seg + 2 + 2 * c) & 0x0F
            c += 1
          }
          return decodeScan(bytes, segEnd, width, height, nc, quant,
            dcTabs, acTabs, compQ, compDc, compAc, restartInterval)
        case _ => () // APPn / COM / others: skip
      }
      i = segEnd
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
                         height: Int, nc: Int, quant: Array[Array[Int]],
                         dcTabs: Array[HuffDecTable],
                         acTabs: Array[HuffDecTable], compQ: Array[Int],
                         compDc: Array[Int], compAc: Array[Int],
                         restartInterval: Int): Option[Ppm] = {
    var c = 0
    while (c < nc) {
      if (quant(compQ(c)) == null || dcTabs(compDc(c)) == null ||
        acTabs(compAc(c)) == null) return None
      c += 1
    }
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    // Allocation guards BEFORE the Int planes materialize (MaxDim's
    // 4 GiB budget assumed byte arrays; Int planes are 4×, and a
    // crafted header claiming 32768²×3 would demand ~12 GiB and kill
    // the executor with an uncatchable OOM instead of the documented
    // dead-letter None):
    // 1. dedicated pixel budget — nc × 4 B × JpegMaxPixels ≤ 768 MiB;
    // 2. the entropy segment must be long enough to code every MCU at
    //    the spec-minimum 2 bits per block (a 1-bit DC-category-0 code
    //    + a 1-bit EOB is the shortest legal baseline block), so a
    //    tiny payload cannot claim a huge raster — while no valid
    //    JPEG, however aggressively Huffman-optimized, can be rejected.
    val nBlocks = bw.toLong * bh * nc
    if (bw.toLong * 8 * bh * 8 > JpegMaxPixels) return None
    if ((bytes.length - start).toLong < nBlocks / 4) return None
    val planes = Array.fill(nc)(new Array[Int](bw * 8 * bh * 8))
    val r = new JBitReader(bytes, start)
    val dcPred = new Array[Int](nc)
    var mcu = 0
    val nMcu = bw * bh
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val by = mcu / bw
      val bx = mcu % bw
      c = 0
      while (c < nc) {
        val qt = quant(compQ(c))
        val coef = new Array[Double](64)
        val t = huffDecode(r, dcTabs(compDc(c)))
        if (r.failed || t > 15) return None
        val diff = extend(r.read(t), t)
        dcPred(c) += diff
        coef(0) = dcPred(c).toDouble * qt(0)
        var k = 1
        while (k < 64) {
          val rs = huffDecode(r, acTabs(compAc(c)))
          if (r.failed) return None
          val run = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (run == 15) k += 16 // ZRL
            else k = 64 // EOB
          } else {
            k += run
            if (k > 63) return None
            coef(ZigZag(k)) = extend(r.read(s), s).toDouble * qt(ZigZag(k))
            k += 1
          }
        }
        if (r.failed) return None
        val px = idct8(coef)
        val plane = planes(c)
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            plane((by * 8 + x) * bw * 8 + bx * 8 + y) =
              clamp255(math.round(px(x * 8 + y) + 128.0))
            y += 1
          }
          x += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop padded planes to (width, height) and convert to RGB
    val rgb = new Array[Byte](width * height * 3)
    val stride = bw * 8
    var p = 0
    while (p < width * height) {
      val x = p / width
      val y = p % width
      val idx = x * stride + y
      if (nc == 1) {
        val v = planes(0)(idx).toByte
        rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
      } else {
        val yv = planes(0)(idx)
        val cb = planes(1)(idx) - 128
        val cr = planes(2)(idx) - 128
        rgb(p * 3) = clamp255(math.round(yv + 1.402 * cr)).toByte
        rgb(p * 3 + 1) = clamp255(math.round(
          yv - 0.344136 * cb - 0.714136 * cr)).toByte
        rgb(p * 3 + 2) = clamp255(math.round(yv + 1.772 * cb)).toByte
      }
      p += 1
    }
    Some(Ppm(width, height, 255, rgb))
  }
}

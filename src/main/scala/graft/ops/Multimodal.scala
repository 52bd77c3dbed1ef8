package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-local batched
  * processing, typed output shape. The codec ([[decodeBytes]]) is REAL
  * for every format pure JVM parsing can handle: PPM, PNG, GIF, and
  * baseline JPEG rasters ([[Codecs.decodeRaster]]), RIFF/WAVE PCM-16
  * and FLAC audio ([[Codecs.decodeAudio]]). Only inter-frame video
  * (H.264 et al.) falls back to the clearly-marked DETERMINISTIC STUB
  * — swapping it for a real video codec is a one-function change; the
  * dataflow (what a 1000-executor cluster exercises) is identical.
  *
  * Design: decode runs via `mapPartitions` on a typed Dataset — one JVM
  * codec context per partition (the expensive init a real codec needs),
  * streaming through rows without materializing the partition. Metadata
  * ops are plain column expressions.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, sample_rate: Int,
                      n_frames: Int)

  /** Decoded features: fixed-size per-media embedding + dims. */
  case class MediaFeatures(media_id: Long, kind: String,
                           out_width: Int, out_height: Int,
                           features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Manufacture a deterministic media corpus from the documents table
    * (text bytes as the opaque payload; metadata derived from doc stats).
    * Stands in for `spark.read.format("binaryFile")` at deploy time.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") % 480 + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") % 30 + 1).cast("int").as("n_frames"))

  /** The codec dispatch: REAL decode for PPM, PNG, GIF and baseline
    * JPEG images and PCM-16 WAV/FLAC audio (magic-byte sniff, see
    * [[Codecs]]); anything else — inter-frame video, essentially —
    * takes the documented deterministic stub ([[stubFeatures]]). A
    * corrupt or truncated payload of a recognized format also falls
    * back to the stub rather than throwing (the dead-letter stance).
    */
  def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] =
    Codecs.decodeRaster(bytes).map(imageFeatures(_, dim))
      .orElse(Codecs.decodeAudio(bytes).map(audioFeatures(_, dim)))
      .getOrElse(stubFeatures(bytes, dim))

  /** Real image features from decoded pixels: dims 0-2 are per-channel
    * means scaled to [0,1]; the rest is a grayscale intensity histogram
    * (the classic cheap raster descriptor), normalized by pixel count.
    */
  def imageFeatures(p: Codecs.Ppm, dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    val nPix = p.width * p.height
    var i = 0
    while (i < p.rgb.length) {
      val r = p.rgb(i) & 0xFF; val g = p.rgb(i + 1) & 0xFF
      val b = p.rgb(i + 2) & 0xFF
      if (dim > 0) acc(0) += r
      if (dim > 1) acc(1) += g
      if (dim > 2) acc(2) += b
      if (dim > 3) {
        // integer-exact ITU-601-ish luma (77R+150G+29B)/256
        val gray = (77 * r + 150 * g + 29 * b) >> 8
        acc(3 + gray * (dim - 3) / 256) += 1.0f
      }
      i += 3
    }
    var j = 0
    val denom = (255.0f * nPix)
    while (j < math.min(3, dim)) { acc(j) /= denom; j += 1 }
    while (j < dim) { acc(j) /= nPix; j += 1 }
    acc
  }

  /** Real audio features from decoded samples: dim 0 = RMS energy
    * scaled to [0,1], dim 1 = zero-crossing rate; the rest is an
    * absolute-amplitude histogram normalized by sample count.
    */
  def audioFeatures(w: Codecs.Wav, dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    val n = w.samples.length
    if (n == 0) return acc
    var sumSq = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val s = w.samples(i).toDouble
      sumSq += s * s
      if (i > 0 && ((w.samples(i) >= 0) != (w.samples(i - 1) >= 0))) zc += 1
      if (dim > 2) {
        val a = math.abs(w.samples(i).toInt)
        acc(2 + math.min(a, 32767) * (dim - 2) / 32768) += 1.0f
      }
      i += 1
    }
    if (dim > 0) acc(0) = (math.sqrt(sumSq / n) / 32768.0).toFloat
    if (dim > 1) acc(1) = zc.toFloat / n
    var j = 2
    while (j < dim) { acc(j) /= n; j += 1 }
    acc
  }

  /** DETERMINISTIC STUB for compressed formats: folds the payload into
    * `dim` byte-histogram buckets — deterministic, cheap, and
    * shape-identical to a real feature extractor.
    */
  def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        acc(((bytes(i) & 0xFF) + i) % dim) += 1.0f
        i += 1
      }
      val n = math.max(1, bytes.length).toFloat
      var j = 0
      while (j < dim) { acc(j) /= n; j += 1 }
    }
    acc
  }

  /** Exact integer pixel statistics through the REAL raster decoders
    * (PPM or PNG, sniffed by magic bytes) — the oracle-checkable face
    * of the image path (float features can't hash-match an
    * engine-independent oracle; integer channel sums can). Undecodable
    * payloads yield a (-1, -1) dims row, counted not thrown.
    */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          Codecs.decodeRaster(bytes) match {
            case Some(p) =>
              var r = 0L; var g = 0L; var b = 0L
              var i = 0
              while (i < p.rgb.length) {
                r += p.rgb(i) & 0xFF; g += p.rgb(i + 1) & 0xFF
                b += p.rgb(i + 2) & 0xFF
                i += 3
              }
              (id, p.width, p.height, r, g, b)
            case None => (id, -1, -1, -1L, -1L, -1L)
          }
        }
      }.toDF("media_id", "width", "height", "r_sum", "g_sum", "b_sum")
  }

  /** 64-bit dHash (difference hash) per image — the standard
    * perceptual-dedup signature for images at corpus scale (near-dup
    * images survive re-encoding and small edits that break byte-level
    * hashes). Pipeline per row, scan-local: decode the REAL container
    * (PPM/PNG/GIF by magic) → average-pool by `poolFactor` → integer
    * luma `(77R+150G+29B) >> 8` on the top-left 9×8 of the pooled
    * grid → bit(y·8+x) = gray(x,y) > gray(x+1,y). Integer-exact
    * end-to-end: no transcendental, no float — a DuckDB oracle can
    * restate every bit, unlike DCT-based pHash. Images whose pooled
    * grid is smaller than 9×8 (or undecodable payloads) drop, counted
    * not thrown. Output `(id, sim)` feeds
    * [[Dedup.hammingNearDups64Cached]] — the SAME banded Hamming
    * machinery text SimHash uses, so image near-dup inherits its
    * bucket caps and pigeonhole recall.
    */
  def dhashImages(media: DataFrame, poolFactor: Int = 2): DataFrame = {
    require(poolFactor >= 1, "poolFactor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          Codecs.decodeRaster(bytes)
            .filter(p => p.width >= poolFactor && p.height >= poolFactor)
            .map(p => Codecs.poolPpm(p, poolFactor))
            .filter(p => p.width >= 9 && p.height >= 8)
            .map { p =>
              def gray(x: Int, y: Int): Int = {
                val i = (y * p.width + x) * 3
                (77 * (p.rgb(i) & 0xFF) + 150 * (p.rgb(i + 1) & 0xFF) +
                  29 * (p.rgb(i + 2) & 0xFF)) >> 8
              }
              var hash = 0L
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  if (gray(x, y) > gray(x + 1, y))
                    hash |= 1L << (y * 8 + x)
                  x += 1
                }
                y += 1
              }
              (id, hash)
            }
        }
      }.toDF("id", "sim")
  }

  /** 64-bit audio fingerprint — [[dhashImages]]' twin for the audio
    * modality (near-dup audio survives re-encoding/level tweaks that
    * break byte hashes): decode the REAL container (WAV or FLAC by
    * magic) → window means over the first 65 windows of `windowSize`
    * samples → bit(i) = mean(i) > mean(i+1). Integer-exact
    * end-to-end: the mean divides TRUNCATING toward zero (JVM `/`),
    * which is what DuckDB's `//` does on negative PCM sums (verified
    * on 1.0.0: `-7 // 4 = -1`, NOT floor) and what [[resampleAudio]]
    * already does — `Math.floorDiv` here would silently disagree with
    * the oracle on any negative window sum that is not a multiple of
    * `windowSize`.
    * Payloads too short for 65 windows, multi-channel, or undecodable
    * drop, counted not thrown. Output `(id, sim)` feeds
    * [[Dedup.hammingNearDups64Cached]] — the same banded machinery as
    * text SimHash and image dHash, one near-dup engine for all three
    * modalities.
    */
  def audioFingerprint(media: DataFrame, windowSize: Int = 4): DataFrame = {
    require(windowSize >= 1, "windowSize must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          Codecs.decodeAudio(bytes)
            .filter(w => w.channels == 1 &&
              w.samples.length >= windowSize * 65)
            .map { w =>
              val m = Array.tabulate(65) { wi =>
                var s = 0L
                var j = 0
                while (j < windowSize) {
                  s += w.samples(wi * windowSize + j); j += 1
                }
                s / windowSize // truncating, = DuckDB `//`
              }
              var hash = 0L
              var i = 0
              while (i < 64) {
                if (m(i) > m(i + 1)) hash |= 1L << i
                i += 1
              }
              (id, hash)
            }
        }
      }.toDF("id", "sim")
  }

  /** REAL pixel resize: decode (PPM or PNG) → average-pool by `factor`
    * → re-encode in the SAME container the payload arrived in
    * ([[Codecs.poolPpm]]); payloads that aren't a decodable raster pass
    * through as null bytes (downstream stats report them as
    * undecodable rather than anything throwing). Pixel work is where
    * resize actually costs at 100 TB — this runs scan-local in the
    * same mapPartitions shape as decode, no shuffle.
    */
  def resizePixels(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val png = Codecs.isPng(bytes)
          val gif = Codecs.isGif(bytes)
          (id, Codecs.decodeRaster(bytes)
            // an image smaller than the pool factor would collapse to
            // zero pixels — degrade to null bytes, never throw
            .filter(p => p.width >= factor && p.height >= factor)
            .map(p => Codecs.poolPpm(p, factor))
            .map(p => if (png) Codecs.encodePng(p.width, p.height, 3, p.rgb)
                      else if (gif) Codecs.encodeGif(p.width, p.height, p.rgb)
                      else Codecs.encodePpm(p.width, p.height, p.rgb))
            .orNull)
        }
      }.toDF("media_id", "bytes")
  }

  /** Exact integer PER-FRAME pixel statistics through the real
    * multi-frame GIF decoder — the VIDEO face of the image path:
    * frame sampling (every `stride`-th frame, at most `maxFrames`
    * sampled) runs on DECODED frames, not just descriptor metadata
    * (that plan-only view is [[frameSamplePlan]]). The decoder is
    * bounded to the last needed frame, so a long animation never
    * decodes past the sample horizon; undecodable payloads yield one
    * (-1, -1) dims row, counted not thrown. Scan-local mapPartitions,
    * the [[decodeImageStats]] shape.
    */
  def decodeFrameStats(media: DataFrame, stride: Int,
                       maxFrames: Int): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "stride and maxFrames >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    val decodeCap = (maxFrames - 1) * stride + 1
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          Codecs.decodeGifFrames(bytes, decodeCap) match {
            case Some(frames) =>
              frames.zipWithIndex.collect {
                case (p, i) if i % stride == 0 && i / stride < maxFrames =>
                  var r = 0L; var g = 0L; var b = 0L
                  val n = p.width * p.height
                  var q = 0
                  while (q < n) {
                    r += p.rgb(q * 3) & 0xFF
                    g += p.rgb(q * 3 + 1) & 0xFF
                    b += p.rgb(q * 3 + 2) & 0xFF
                    q += 1
                  }
                  (id, i, p.width, p.height, r, g, b)
              }
            case None => Seq((id, -1, -1, -1, -1L, -1L, -1L))
          }
        }
      }.toDF("media_id", "frame_idx", "width", "height",
        "r_sum", "g_sum", "b_sum")
  }

  /** Per-channel HISTOGRAM EQUALIZATION — the classic contrast
    * normalization a vision-data pipeline runs before feature
    * extraction: each channel's value v maps to
    * `(cdf(v) − cdf_min) · 255 div (n − cdf_min)` (the OpenCV
    * convention with FLOOR division — pure integer, so the mm15
    * oracle replays the mapping exactly; cdf_min is the cdf of the
    * smallest present value). A constant channel (n == cdf_min) maps
    * to 0. Decode by magic sniff, equalize, re-encode as PPM —
    * scan-local mapPartitions, undecodable rows degrade to null.
    */
  def equalizePixels(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          (id, Codecs.decodeRaster(bytes).map { p =>
            val n = p.width * p.height
            val out = new Array[Byte](n * 3)
            var c = 0
            while (c < 3) {
              val hist = new Array[Int](256)
              var i = 0
              while (i < n) { hist(p.rgb(i * 3 + c) & 0xFF) += 1; i += 1 }
              val cdf = new Array[Int](256)
              var acc = 0
              var v = 0
              while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
              var cdfMin = 0
              v = 0
              var found = false
              while (v < 256 && !found) {
                if (hist(v) > 0) { cdfMin = cdf(v); found = true }
                v += 1
              }
              val map = new Array[Byte](256)
              v = 0
              while (v < 256) {
                map(v) =
                  if (n == cdfMin) 0.toByte
                  else (((cdf(v) - cdfMin).toLong * 255)
                    / (n - cdfMin)).toByte
                v += 1
              }
              i = 0
              while (i < n) {
                out(i * 3 + c) = map(p.rgb(i * 3 + c) & 0xFF)
                i += 1
              }
              c += 1
            }
            Codecs.encodePpm(p.width, p.height, out)
          }.orNull)
        }
      }.toDF("media_id", "bytes")
  }

  /** REAL audio downsampling — the audio twin of [[resizePixels]]:
    * decode (WAV or FLAC by magic), average-pool every `factor`
    * consecutive samples per channel (TRUNCATING integer division —
    * JVM `/` and DuckDB's integer `//` both round toward zero, which
    * matters on negative samples where a floor would differ by one),
    * re-encode as WAV at rate/factor. Ragged tails truncate (the
    * poolPpm contract);
    * payloads shorter than one pool window or undecodable degrade to
    * null bytes. Scan-local mapPartitions, no shuffle.
    */
  def resampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          (id, Codecs.decodeAudio(bytes)
            .filter(w => w.channels > 0 &&
              w.samples.length / w.channels >= factor)
            .map { w =>
              val perCh = w.samples.length / w.channels
              val outN = perCh / factor
              val out = new Array[Short](outN * w.channels)
              var c = 0
              while (c < w.channels) {
                var j = 0
                while (j < outN) {
                  var s = 0L
                  var t = 0
                  while (t < factor) {
                    s += w.samples((j * factor + t) * w.channels + c)
                    t += 1
                  }
                  out(j * w.channels + c) = (s / factor).toShort
                  j += 1
                }
                c += 1
              }
              Codecs.encodeWavPcm16(w.sampleRate / factor, w.channels, out)
            }.orNull)
        }
      }.toDF("media_id", "bytes")
  }

  /** Exact integer sample statistics through the REAL audio decoders
    * (RIFF/WAVE or FLAC, sniffed by magic bytes) — the audio twin of
    * [[decodeImageStats]].
    */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          Codecs.decodeAudio(bytes) match {
            case Some(w) =>
              var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
              var i = 0
              while (i < w.samples.length) {
                val s = w.samples(i).toInt
                sum += s
                if (s < mn) mn = s
                if (s > mx) mx = s
                i += 1
              }
              (id, w.sampleRate, w.channels, w.samples.length, sum, mn, mx)
            case None => (id, -1, -1, -1, -1L, 0, 0)
          }
        }
      }.toDF("media_id", "sample_rate", "channels", "n_samples",
        "sum_samples", "min_sample", "max_sample")
  }

  /** Decode + feature-extract: partition-local batch processing with a
    * per-partition "codec context" (the stub's is trivial; a real codec
    * would allocate its native handles here, once per partition).
    */
  def decodeFeatures(media: DataFrame, dim: Int = 32): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.width, r.height,
          decodeBytes(r.bytes, dim))
      }
    }
  }

  /** Resize metadata op (aspect-preserving fit into a bounding box) —
    * pure column arithmetic; the pixel work belongs to the codec stage.
    */
  def withResizedDims(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width").cast("double"),
      lit(maxH) / col("height").cast("double"), lit(1.0))
    media
      .withColumn("out_width",
        greatest(floor(col("width") * scale).cast("int"), lit(1)))
      .withColumn("out_height",
        greatest(floor(col("height") * scale).cast("int"), lit(1)))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index,
    * capped at `maxFrames` — an exploded (media_id, frame_idx) plan a
    * downstream decode stage consumes. Column-only; no data movement.
    */
  def frameSamplePlan(media: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)),
          1, maxFrames)).as("frame_idx"))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-local batched
  * processing, typed output shape. The codec itself is a clearly-marked
  * DETERMINISTIC STUB (`decodeBytes`): this container has no image/audio
  * libraries, so the stub derives a fake "decoded" feature block from
  * the raw bytes. Swapping in a real codec is a one-function change; the
  * dataflow (what a 1000-executor cluster actually exercises) is
  * identical.
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

  /** DETERMINISTIC STUB for the codec: a real implementation would hand
    * `bytes` to an image/audio decoder here. The stub folds the payload
    * into `dim` byte-histogram buckets — deterministic, cheap, and
    * shape-identical to a real feature extractor.
    */
  def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
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

package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[stubDecodeImage]]) — the Spark-side
  * contract (schema, batch iteration, partitioning, output shape) is real
  * and tested, and a real codec drops into the same seam.
  *
  * Scale notes: payloads stay off the driver; feature extraction is a
  * narrow mapPartitions (no shuffle); downstream joins key on `media_id`
  * so a repartition on ingest is the only wide stage.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("payload", BinaryType),                      // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Build a media table from the documents fixture: each doc's text bytes
    * stand in for an encoded payload (deterministic; real ingest would read
    * `binaryFile`). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** STUB image decode: deterministic fake (width/height/channel stats from
    * a rolling hash of the payload). Replace with a real codec here — the
    * signature (bytes → fixed feature struct) is the seam. */
  def stubDecodeImage(payload: Array[Byte]): (Int, Int, Double) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 16 + math.floorMod(h, 241).toInt
    val height = 16 + math.floorMod(h >> 8, 241).toInt
    val meanPx = math.floorMod(h >> 16, 256).toDouble
    (width, height, meanPx)
  }

  /** Per-partition batched feature extraction (the mapInPandas shape in
    * Scala: one iterator pass, setup amortized per partition). Emits a flat
    * feature row per media item.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val rows = media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
    rows.mapPartitions { it =>
      // per-partition setup (codec init) would go here
      it.map { case (id, kind, payload) =>
        val bytes = if (payload == null) Array.emptyByteArray else payload
        val (w, h, mean) = stubDecodeImage(bytes)
        (id, kind, bytes.length.toLong, w, h, mean)
      }
    }.toDF("media_id", "kind", "n_bytes", "width", "height", "mean_px")
  }

  /** REAL image resize over PNG-encoded payloads: decode → bilinear resize
    * → re-encode, per partition (codec state amortized). Non-decodable
    * payloads drop silently (C3 shape). This is the non-stub path of the
    * decode seam — payloads written by
    * [[graft.operators.SlicePipeline.writePngs]] flow through it as-is.
    */
  def resizeImages(media: DataFrame, outH: Int, outW: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          for {
            (px, h, w) <- graft.kernels.Png.decodeGray(payload)
            resized = graft.kernels.ImageKernels.resizeBilinear(px, h, w, outH, outW)
            bytes <- graft.kernels.Png.encodeGray(resized, outH, outW)
          } yield (id, outH, outW, bytes)
        }
      }
      .toDF("media_id", "height", "width", "payload")
  }

  /** Frame sampling for video-kind media: deterministic fixed-size chunks
    * of the decoded payload stand in for frames (stub), showing the 1→N
    * explode shape (each frame its own row for downstream per-frame
    * featurization). Chunking is explicit `sequence`+`substring` (Spark's
    * `split` has no \G-style chunk regex, and `base64` emits MIME-chunked
    * lines — both unusable for deterministic chunk counts). */
  def sampleFrames(media: DataFrame, everyN: Int = 64): DataFrame = {
    media.filter(col("kind") === "video")
      .select(col("media_id"), decode(col("payload"), "UTF-8").as("s"))
      .filter(length(col("s")) > 0)
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), ceil(length(col("s")) / lit(everyN.toDouble)).cast("int") - 1),
          i => col("s").substr(i * everyN + 1, lit(everyN))
        )).as(Seq("frame_idx", "frame_chunk")))
  }
}

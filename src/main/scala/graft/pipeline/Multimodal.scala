package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs): `fakeDecode` derives "features" from a
  * 64-bit hash of the bytes, so outputs are stable across runs/executors.
  * Everything around it — schema, batch shape, partition-level iteration,
  * frame sampling — is the real Spark plumbing a codec would slot into.
  *
  * Scale design: decode runs per-partition (mapPartitions) so a real codec
  * amortizes init per task, not per row; media bytes never shuffle — all
  * derived columns are narrow projections.
  */
object Multimodal {

  /** Decoded record produced by the per-partition decode stub. */
  final case class DecodedMedia(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap `documents` rows as opaque media blobs: the UTF-8 bytes of the
    * text play the role of image/audio content, with typed metadata. This
    * is the ingest shape a binary-asset table would have at 100 TB
    * (content column + skinny metadata, parquet-friendly).
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(split(lit("image,audio,video"), ","),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source").as("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .as("meta"))

  /** STUB decode kernel — stands in for an image/audio codec. Deterministic
    * pseudo-features from xxhash64 of the content bytes.
    */
  private def stubDecode(docId: Long, mediaType: String, bytes: Array[Byte],
      nBytes: Long): DecodedMedia = {
    // ??? <- real codec call goes here (e.g. ImageIO.read / libsndfile);
    // deterministic fake keeps the plumbing testable without codecs:
    val h = graft.functions.Kernels.splitmix64(
      java.util.Arrays.hashCode(bytes).toLong)
    DecodedMedia(
      doc_id = docId, media_type = mediaType, n_bytes = nBytes,
      width = (Math.floorMod(h, 1024L) + 1L).toInt,
      height = (Math.floorMod(h >>> 10, 1024L) + 1L).toInt,
      n_frames = if (mediaType == "image") 1
                 else (Math.floorMod(h >>> 20, 64L) + 1L).toInt,
      checksum = h)
  }

  /** Per-partition decode: the Scala analogue of a batched pandas UDF —
    * one iterator per task, codec init amortized per partition.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "content", "meta.n_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { rows =>
        // per-task codec init would happen here
        rows.map { case (id, mt, bytes, n) => stubDecode(id, mt, bytes, n) }
      }
  }

  /** Frame sampling plumbing: every `stride`-th frame index of each video,
    * as (doc_id, frame_idx) — the explode-side of a video pipeline. The
    * per-frame decode would run in a subsequent mapPartitions.
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int = 8): DataFrame =
    decoded.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Resize stub: pure-metadata transform (real resize = mapPartitions over
    * content), keeping aspect ratio math in the plan for testability.
    */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int = 256): DataFrame =
    decoded.toDF().select(
      col("doc_id"),
      col("width"), col("height"),
      least(lit(maxDim), col("width")).as("out_width"),
      greatest(lit(1),
        (col("height") * least(lit(maxDim), col("width")) / col("width"))
          .cast("int")).as("out_height"))
}

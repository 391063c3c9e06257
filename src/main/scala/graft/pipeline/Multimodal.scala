package graft.pipeline

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct.
  *
  * Decode is REAL where a pure-JVM codec exists:
  *  - image → `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF): true pixel
  *    dimensions;
  *  - audio → RIFF/WAVE header parse: channels, sample rate, frame count;
  *  - video → no pure-JVM codec in this container: deterministic
  *    byte-hash pseudo-features, clearly flagged via `decode_ok = false`.
  * Undecodable payloads (wrong codec, corrupt bytes) take the same
  * deterministic fallback with `decode_ok = false` instead of failing the
  * job — at 100 TB some fraction of a binary-asset table is always
  * corrupt, and a pipeline that dies on the first bad blob never finishes.
  *
  * Scale design: decode runs per-partition (mapPartitions) so codec init
  * amortizes per task, not per row; media bytes never shuffle — all
  * derived columns are narrow projections.
  */
object Multimodal {

  /** Decoded record produced by the per-partition decode. For audio,
    * `width` carries the channel count and `height` the sample rate.
    */
  final case class DecodedMedia(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long,
      decode_ok: Boolean)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Deterministic media-parameter functions of the document id. Analytic
    * (SQL-expressible), so the DuckDB oracle can verify the full
    * synthesize→encode→decode round trip: the decoder must actually parse
    * the PNG/WAV bytes to reproduce these numbers.
    */
  private[pipeline] def imageDims(id: Long): (Int, Int) =
    ((8 + Math.floorMod(id, 57L)).toInt,
      (8 + Math.floorMod(id / 3, 57L)).toInt)
  private[pipeline] def wavParams(id: Long): (Int, Int, Int) =
    ((1 + Math.floorMod(id, 2L)).toInt,
      (8000 + 1000 * Math.floorMod(id, 5L)).toInt,
      (100 + Math.floorMod(id, 400L)).toInt)

  /** Tiny real PNG of the given dimensions (zeroed RGB raster). */
  private[pipeline] def makePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Minimal real RIFF/WAVE file: PCM 16-bit, zeroed sample data. */
  private[pipeline] def makeWav(channels: Int, rate: Int, frames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  /** Wrap `documents` rows as media blobs with REAL payloads where a
    * pure-JVM codec exists: image rows carry an actual PNG, audio rows an
    * actual RIFF/WAVE file (parameters are deterministic functions of the
    * id), and video rows carry the raw UTF-8 text bytes (no pure-JVM video
    * codec in this container — these exercise the undecodable-payload
    * fallback). This is the ingest shape a binary-asset table would have
    * at 100 TB (content column + skinny metadata, parquet-friendly);
    * synthesis runs per-partition so codec init amortizes per task.
    */
  def asMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, text, source) =>
          // floorMod + null-safe text: a binary-asset ingest must not die
          // on odd ids or missing payloads
          val content = Math.floorMod(id, 3L) match {
            case 0 => val (w, h) = imageDims(id); makePng(w, h)
            case 1 => val (ch, rate, fr) = wavParams(id); makeWav(ch, rate, fr)
            case _ => Option(text).getOrElse("").getBytes("UTF-8")
          }
          val mt = Math.floorMod(id, 3L) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          (id, mt, content, source, content.length.toLong)
        }
      }
      .toDF("doc_id", "media_type", "content", "_source", "_n")
      .select(col("doc_id"), col("media_type"), col("content"),
        struct(col("_source").as("source"), col("_n").as("n_bytes")).as("meta"))
  }

  /** Deterministic 64-bit content checksum (two seeded murmur passes). */
  private def checksum64(bytes: Array[Byte]): Long = {
    import scala.util.hashing.MurmurHash3
    val h1 = MurmurHash3.bytesHash(bytes, 0x6d6d)
    val h2 = MurmurHash3.bytesHash(bytes, 0x6d6d ^ 0x5bd1e995)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Real image decode: ImageIO sniffs the codec from the bytes.
    * Returns (width, height) or None if the payload is not a supported
    * image format.
    */
  private[pipeline] def decodeImage(bytes: Array[Byte]): Option[(Int, Int)] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        .map(img => (img.getWidth, img.getHeight))
    } catch { case _: Exception => None }

  /** Real RIFF/WAVE header parse: (channels, sampleRate, nSampleFrames).
    * Layout per the canonical WAV spec: "RIFF"<size>"WAVE" then chunks;
    * the "fmt " chunk carries channels (offset +10 LE16), sample rate
    * (+12 LE32), block align (+20 LE16); the "data" chunk size / block
    * align = frame count.
    */
  private[pipeline] def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, blockAlign
      var dataSize = -1
      while (off + 8 <= bytes.length && (fmt.isEmpty || dataSize < 0)) {
        val id = tag(off); val sz = le32(off + 4)
        // a corrupt size field decoding negative would stall the cursor
        // (8 + sz + pad can be ≤ 0) — an executor task hanging forever on
        // one bad blob is worse than the decode_ok=false fallback
        if (sz < 0) return None
        if (id == "fmt " && off + 24 <= bytes.length)
          fmt = Some((le16(off + 10), le32(off + 12), le16(off + 20)))
        else if (id == "data") dataSize = sz
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      fmt.collect { case (ch, rate, ba) if ba > 0 && dataSize >= 0 =>
        (ch, rate, dataSize / ba)
      }
    } catch { case _: Exception => None }
  }

  /** Per-row decode with the per-media-type codecs; deterministic hash
    * fallback (flagged `decode_ok = false`) for undecodable payloads.
    */
  private[pipeline] def decodeOne(docId: Long, mediaType: String,
      bytes: Array[Byte], nBytes: Long): DecodedMedia = {
    val cs = checksum64(bytes)
    // Fallback features are pure functions of the payload size — simple,
    // deterministic across engines, and verifiable by the SQL oracle
    // (unlike a seeded-hash derivation).
    def fallback: DecodedMedia =
      DecodedMedia(docId, mediaType, nBytes,
        width = (nBytes % 1024 + 1).toInt,
        height = (nBytes * 31 % 1024 + 1).toInt,
        n_frames = if (mediaType == "image") 1 else (nBytes % 64 + 1).toInt,
        checksum = cs, decode_ok = false)
    mediaType match {
      case "image" => decodeImage(bytes)
        .map { case (w, h) =>
          DecodedMedia(docId, mediaType, nBytes, w, h, 1, cs, decode_ok = true) }
        .getOrElse(fallback)
      case "audio" => decodeWav(bytes)
        .map { case (ch, rate, frames) =>
          DecodedMedia(docId, mediaType, nBytes, ch, rate, frames, cs,
            decode_ok = true) }
        .getOrElse(fallback)
      case _ => fallback // video: no pure-JVM codec available
    }
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
        // ImageIO plugin scanning etc. happens once per task, not per row
        ImageIO.setUseCache(false)
        rows.map { case (id, mt, bytes, n) => decodeOne(id, mt, bytes, n) }
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

  /** Resize plan: target dimensions fitting `maxDim` on the LONGER side,
    * aspect preserved — the same `scale = min(1, maxDim / max(w, h))`
    * rule [[resizePixels]] applies to actual pixels, so the metadata half
    * and the pixel half of a resize always agree (a width-only cap let a
    * portrait image's height escape the bound while the pixels shrank).
    */
  def resize(decoded: Dataset[DecodedMedia], maxDim: Int = 256): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(side: org.apache.spark.sql.Column) =
      greatest(lit(1),
        least(side, (side * lit(maxDim) / longSide).cast("int")))
    decoded.toDF().select(
      col("doc_id"),
      col("width"), col("height"),
      fit(col("width")).as("out_width"),
      fit(col("height")).as("out_height"))
  }

  /** Real pixel resize for decodable images: scale to fit `maxDim`
    * (aspect-preserving) with AWT, re-encode as PNG. Non-image or
    * undecodable rows pass through with null output bytes. Runs
    * per-partition; bytes never shuffle.
    */
  def resizePixels(media: DataFrame, maxDim: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, mt, bytes) =>
          val out =
            if (mt != "image") None
            else try {
              Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
                val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
                val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                  math.max(1, (img.getHeight * scale).toInt))
                val dst = new java.awt.image.BufferedImage(w, h,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = dst.createGraphics()
                g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH),
                  0, 0, null)
                g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                ImageIO.write(dst, "png", bos)
                bos.toByteArray
              }
            } catch { case _: Exception => None }
          (id, mt, out.orNull)
        }
      }.toDF("doc_id", "media_type", "resized_png")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.MediaCodec

/** Multimodal-column pipeline (north star: "treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample").
  *
  * The corpus carries no media files, so the pipeline first RENDERS each
  * document into a format-valid binary — even doc_ids become a real 24bpp
  * BMP (proper BITMAPFILEHEADER/INFOHEADER, padded bottom-up BGR rows),
  * odd doc_ids a real RIFF/WAVE PCM16 file — then DECODES those bytes
  * with strict header parsers ([[graft.functions.MediaCodec]]) that
  * validate magic numbers, walk chunk structure, and extract actual
  * pixels/samples. Nothing is stubbed: the feature values below are
  * computed from decoded pixel/sample data (Rec.601 luma over a real
  * box-downsample; RMS amplitude over real samples).
  *
  * Spark-side shape (what a 100 TB multimodal pipeline needs):
  *  - opaque `BinaryType` payload column + typed metadata in one relation;
  *  - batch-at-a-time decode via `mapPartitions` on a typed Dataset — the
  *    JVM analog of `mapInPandas` (iterator of rows in/out; any decoder
  *    state is initialized once per partition, not per row);
  *  - decode → feature-extract → resize → frame-sample as composable
  *    per-row stages with real schemas.
  *
  * Scale notes: encode+decode are pure map-side work — no shuffle; the
  * pipeline inherits the scan's partitioning. Payload bytes never pass
  * through a shuffle or a driver collect (the final orderBy moves only
  * the 10-column metadata rows, never payloads).
  */
object MultimodalOps {

  /** Decoded-media metadata row. Image rows carry pixel dims and resized
    * dims; audio rows carry sample_rate/duration and leave dims null. */
  final case class DecodedMedia(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      n_frames: Int,
      resized_w: Option[Int],
      resized_h: Option[Int],
      n_sampled: Int,
      feature: Double)

  /** Audio frame = 256 samples (the frame-sample stage's unit). */
  private val FrameSamples = 256
  /** Image resize target: max dimension after aspect-preserving box resize. */
  private val ResizeMax = 16

  private def md5(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  /** Render a document into a real BMP: dims and pixels derive
    * deterministically from the content fingerprint. */
  private[operators] def renderBmp(text: String): Array[Byte] = {
    val h = md5(text)
    val w = 4 + (h(0) & 0x1f)   // 4..35 px
    val ht = 4 + (h(1) & 0x1f)
    MediaCodec.encodeBmp(w, ht, (x, y) => {
      val b = h((x + y * 7) % 16) & 0xff
      val r = (b + x * 11) & 0xff
      val g = (b + y * 17) & 0xff
      val bl = (b ^ (x * 5 + y * 3)) & 0xff
      (r << 16) | (g << 8) | bl
    })
  }

  /** Render a document into a real WAV: PCM16 mono 8 kHz, samples derive
    * deterministically from the content fingerprint and position. */
  private[operators] def renderWav(text: String): Array[Byte] = {
    val h = md5(text)
    val n = 200 + (text.length % 800)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((((h(i % 16) & 0xff) ^ (i & 0xff)) - 128) * 200).toShort
      i += 1
    }
    MediaCodec.encodeWav(8000, samples)
  }

  private def snap4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Decode one payload with the strict parsers and run the downstream
    * stages (resize / frame-sample / feature-extract) on real data. */
  private[operators] def decodeOne(id: Long, mediaType: String,
                                   bytes: Array[Byte]): DecodedMedia =
    mediaType match {
      case "image" =>
        val img = MediaCodec.decodeBmp(bytes)
        val resized = img.boxResize(ResizeMax)
        DecodedMedia(id, mediaType, bytes.length,
          Some(img.width), Some(img.height), None,
          n_frames = 1,
          Some(resized.width), Some(resized.height),
          n_sampled = 1,
          feature = snap4(resized.meanLuma))
      case "audio" =>
        val wav = MediaCodec.decodeWav(bytes)
        val frames = (wav.nSamples + FrameSamples - 1) / FrameSamples
        val sampled = (0 until frames by 5).size // every 5th frame
        DecodedMedia(id, mediaType, bytes.length,
          None, None, Some(wav.sampleRate),
          n_frames = frames,
          None, None,
          n_sampled = sampled,
          feature = snap4(wav.rms))
      case other =>
        throw new IllegalArgumentException(s"unknown media_type '$other'")
    }

  /** encode(document → real BMP/WAV binary) → decode(strict parse) →
    * resize/frame-sample → feature, all map-side. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        if (id % 2 == 0) (id, "image", renderBmp(text))
        else (id, "audio", renderWav(text))
      }
      .toDF("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
    payloads.mapPartitions { rows =>
      // per-partition init point: a native codec context would open HERE
      rows.map { case (id, mt, bytes) => decodeOne(id, mt, bytes) }
    }.toDF()
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _))

  // no oracle: the decode kernel is engine-side binary parsing DuckDB
  // cannot express — determinism, golden header parses, and roundtrip
  // fidelity are pinned by MultimodalSpec instead.
  val oracle: Map[String, String] = Map.empty
}

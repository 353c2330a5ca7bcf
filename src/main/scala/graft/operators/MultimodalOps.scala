package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column pipeline (north star: "treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample").
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (clearly marked below) — what is real, and what
  * this module demonstrates, is the Spark-side plumbing a 100 TB
  * multimodal pipeline needs:
  *  - opaque `BinaryType` payload column + typed metadata columns in one
  *    relation;
  *  - batch-at-a-time decode via `mapPartitions` on a typed Dataset —
  *    the JVM analog of Python's `mapInPandas` (same contract: iterator
  *    of batches in, iterator of batches out; codec state initialized
  *    once per partition, NOT per row — exactly where a real decoder
  *    would hold its native context);
  *  - decode → feature-extract → resize → frame-sample as composable
  *    per-row stages with real schemas.
  *
  * Scale notes: decode is pure map-side work — no shuffle at all; the
  * pipeline inherits the scan's partitioning. Payload bytes never pass
  * through a shuffle or a driver collect.
  */
object MultimodalOps {

  /** Decoded-media metadata row (the typed schema a real decoder yields). */
  final case class DecodedMedia(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      resized_w: Int,
      resized_h: Int,
      sampled_frames: Seq[Int],
      mean_luma: Double)

  /** ===== STUB DECODER =====
    * A real implementation would call an image/video codec here (per
    * partition: open codec context once, decode each payload). No codec
    * ships in this container, so this derives deterministic fake
    * dimensions/frames from the payload bytes — keeping schema, batch
    * shape and partition lifecycle identical to the real thing. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.floorMod(h, 192)          // fake 64..255 px
    val height = 64 + math.floorMod(h >> 8, 192)
    val frames = 1 + math.floorMod(h >> 16, 30)     // fake 1..30 frames
    (width, height, frames)
  }

  /** decode → resize(128×128 max, aspect-preserving) → sample every 5th
    * frame → mean-luma feature, as one mapPartitions pass. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { rows =>
      // per-partition init point: a real codec context would open HERE
      rows.map { case (id, bytes) =>
        val (w, h, frames) = stubDecode(bytes)
        val scale = math.min(1.0, 128.0 / math.max(w, h))
        val sampled = (0 until frames by 5).toSeq
        // fake luma: mean byte value — deterministic and cheap
        val luma = if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        DecodedMedia(id, bytes.length, w, h, frames,
          math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt),
          sampled, math.floor(luma * 10000 + 0.5) / 10000)
      }
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
              col("n_frames"), col("resized_w"), col("resized_h"),
              size(col("sampled_frames")).as("n_sampled"), col("mean_luma"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _))

  // no oracle: the decode kernel is engine-side (stub) — determinism and
  // schema are pinned by MultimodalSpec instead.
  val oracle: Map[String, String] = Map.empty
}

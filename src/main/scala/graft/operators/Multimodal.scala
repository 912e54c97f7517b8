package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque payload bytes + typed metadata. At 100 TB
  * the payload column dominates — keep it a single `binary` column so Parquet
  * stores it contiguously and Spark never deserializes it except inside the
  * decode stage. */
case class MediaRecord(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    bytes: Array[Byte],
    source: String)

/** Typed features extracted from a decoded payload. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    brightness: Double)

/**
 * Multimodal-column plumbing: treat image/audio/video as opaque `binary`
 * columns; decode / feature-extract / frame-sample run as typed
 * `mapPartitions` stages (the Scala-native analogue of arrow-batched
 * `mapInPandas`) so the decode library is invoked once per JVM partition, not
 * once per row, and the binary payload never round-trips through an
 * interpreter.
 *
 * The actual byte decode is a STUB — real image/audio codecs are not in this
 * container — but it is a *deterministic* fake, so the Spark-side plumbing
 * (schema, batching, partitioning, feature queries) is real and testable.
 */
object Multimodal {

  /** Number of rows a decode batch processes at once (mirrors the arrow batch
    * size knob of mapInPandas). */
  val DecodeBatchSize = 64

  /**
   * STUB DECODER — replace with a real codec (e.g. javax.imageio / ffmpeg
   * bindings) when available. Deterministic fake: dimensions derive from the
   * payload length, brightness is the mean unsigned byte value. This is the
   * `???` seam; everything around it is production-shaped.
   */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += r.bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = n,
      width = if (n == 0) 0 else n % 640,
      height = if (n == 0) 0 else n % 480,
      n_frames = r.kind match { case "video" => 1 + n % 30; case _ => 1 },
      brightness = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Decode + feature-extract, batched per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a real implementation would hand `batch` to a native decoder here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Frame sampling for video payloads: deterministic byte-range slices
    * standing in for decoded frames. Output one row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], everyNth: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frames = decodeStub(r).n_frames
      (0 until frames by everyNth).map { f =>
        val start = if (frames == 0) 0 else (r.bytes.length.toLong * f / frames).toInt
        val end = math.min(r.bytes.length, start + 16)
        (r.media_id, f, java.util.Arrays.copyOfRange(r.bytes, start, end))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Build a MediaRecord dataset from the documents table — deterministic
    * fake payloads (UTF-8 text bytes) with a kind derived from the id, so
    * multimodal plumbing is exercisable on the standard testdata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("source"))
      .as[MediaRecord]
  }
}

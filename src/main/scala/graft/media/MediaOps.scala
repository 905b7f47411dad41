package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, the way a 100 TB training-data pipeline carries media —
  * the bytes never leave the executor, metadata travels in columns, and
  * per-batch decode runs inside `mapPartitions` (the JVM twin of the
  * `mapInPandas` batch-iterator shape).
  *
  * The media table is DERIVED deterministically from `documents.parquet`
  * (doc_id → payload bytes), so the DuckDB oracle can reconstruct the
  * exact same table with SQL — no external data, and the binary plumbing
  * (schema, batching, byte parsing) is still real.
  *
  * DECODE IS A STUB: no image/audio codec exists in this container, so
  * `decodeImageStub` parses the deterministic header embedded in the
  * payload instead of real pixel data. The Spark-side contract — binary
  * in, typed struct out, batched iterator — is exactly what a libjpeg/
  * ffmpeg-backed implementation would keep.
  */
object MediaOps {

  /** payload layout: "HDR|<media_type>|<doc_id>|xxxx…" (doc_id%50*3+8 x's).
    * Built with expression-only ops so the scan stays in codegen.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        concat(lit("HDR|"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
          lit("|"), col("doc_id").cast("string"), lit("|"),
          expr("repeat('x', cast(doc_id % 50 as int) * 3 + 8)"))
          .cast("binary").as("payload"))

  /** m1: per-type byte accounting — pure columnar, no decode. */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        min(length(col("payload"))).cast("long").as("min_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"))
      .orderBy(col("media_type"))

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, n_pixels: Long)

  /** STUB decode — deterministic fake standing in for a pixel decoder.
    * Parses the header embedded in the payload BYTES (not the row's
    * doc_id column) so the binary path is genuinely exercised: a real
    * decoder would read the JPEG/PNG header the same way.
    */
  def decodeImageStub(payload: Array[Byte]): (Int, Int, Int) = {
    val header = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val id = header.split('|')(2).toLong
    val width = 320 + (id % 10).toInt * 32
    val height = 240 + (id % 10).toInt * 24
    (width, height, 3)
  }

  /** m2: batched image decode → typed metadata. `grouped(64)` inside
    * mapPartitions mirrors the arrow-batch shape of mapInPandas: a codec
    * amortizes per-batch setup (thread-local decoder, pinned buffers)
    * across 64 rows.
    */
  def imageMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = mediaTable(s, dir).as[MediaRow]
    media.filter(_.media_type == "image")
      .mapPartitions(_.grouped(64).flatMap(_.map { row =>
        val (w, h, c) = decodeImageStub(row.payload)
        ImageMeta(row.doc_id, w, h, c, w.toLong * h)
      }))
      .toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"), col("n_pixels"))
      .orderBy(col("doc_id"))
  }

  final case class AudioMeta(doc_id: Long, sample_rate: Long, n_samples: Long,
      duration_ms: Long)

  /** STUB audio decode — parses the header embedded in the payload bytes
    * (a real implementation reads the WAV/FLAC header the same way).
    */
  def decodeAudioStub(payload: Array[Byte]): (Long, Long) = {
    val header = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val id = header.split('|')(2).toLong
    val sampleRate = 16000L + (id % 4) * 8000L
    val nSamples = payload.length.toLong * 1024L
    (sampleRate, nSamples)
  }

  /** m5: batched audio feature extraction → sample rate / duration —
    * same binary-in, typed-struct-out batch contract as m2.
    */
  def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = mediaTable(s, dir).as[MediaRow]
    media.filter(_.media_type == "audio")
      .mapPartitions(_.grouped(64).flatMap(_.map { row =>
        val (rate, n) = decodeAudioStub(row.payload)
        AudioMeta(row.doc_id, rate, n, n * 1000L / rate)
      }))
      .toDF()
      .orderBy(col("doc_id"))
  }

  val FrameStride = 12

  /** m3: video frame sampling — every 12th frame index as a typed row
    * with a frame_ref handle. sequence+explode keeps it whole-stage
    * codegen; a real pipeline would hand frame_ref to a decode stage.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .withColumn("n_frames", (lit(24) + pmod(col("doc_id"), lit(72))).cast("long"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(FrameStride.toLong))).as("frame_idx"))
      .withColumn("frame_ref",
        concat(lit("frame://"), col("doc_id"), lit("/"), col("frame_idx")))
      .orderBy(col("doc_id"), col("frame_idx"))

  val ResizeBox = 256.0

  /** m4: resize planning — target dims fitting a 256×256 box (no
    * upscale), estimated output bytes at 3 B/pixel. Metadata-only
    * arithmetic over the decoded dims; the pixel work is the stubbed
    * stage downstream.
    */
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    val meta = imageMeta(s, dir)
    val scale = least(lit(ResizeBox) / col("width"), lit(ResizeBox) / col("height"), lit(1.0))
    meta
      .withColumn("out_w", floor(col("width") * scale).cast("long"))
      .withColumn("out_h", floor(col("height") * scale).cast("long"))
      .withColumn("out_bytes", col("out_w") * col("out_h") * 3)
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"), col("out_bytes"))
      .orderBy(col("doc_id"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing — treat media as opaque BINARY columns with
  * typed metadata, processed by batch-shaped partition-local decoders
  * (beyond the reference surface; SURVEY.md §7.1 M7).
  *
  * The container has no image/audio codecs, so the *decode step is a
  * clearly-marked deterministic stub* ([[FakeDecoder.decode]]); everything
  * Spark-side is real: the binary column, the typed Dataset schema, the
  * mapPartitions batch shape (one decoder instance per partition, streaming
  * iterator — exactly how a JNI/FFmpeg/Pillow-style decoder is mounted),
  * and the downstream relational feature aggregation.
  */
object Multimodal {

  /** Input row: media payload as bytes + metadata. */
  final case class MediaRow(doc_id: Long, source: String, bytes: Array[Byte],
                            n_chars: Long)

  /** Decoded "image": deterministic fake with the shape a real decoder
    * would return (dimensions, frame count, per-frame sample).
    */
  final case class DecodedImage(doc_id: Long, source: String, width: Int,
                                height: Int, n_frames: Int, byte_len: Long)

  object FakeDecoder {
    /** STUB — a real implementation would parse the container format and
      * decode pixel data (e.g. via a JNI codec); deterministic fake derived
      * from metadata so results are oracle-checkable.
      */
    def decode(r: MediaRow): DecodedImage =
      DecodedImage(
        doc_id = r.doc_id,
        source = r.source,
        width = (64 + r.doc_id % 64).toInt,
        height = (48 + r.doc_id % 48).toInt,
        n_frames = (r.n_chars / 100 + 1).toInt,
        byte_len = r.bytes.length.toLong)
  }

  /** documents.text re-encoded as a BINARY payload column (stand-in for
    * image/audio bytes).
    */
  private def media(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("bytes"), col("n_chars"))
      .as[MediaRow]
  }

  /** Binary-column feature extraction with pure built-ins (no decode):
    * payload length, content hash, leading-bytes sample — all stay in
    * whole-stage codegen.
    */
  private def mmBinaryFeatures(s: SparkSession, d: String): DataFrame =
    media(s, d).toDF()
      .select(col("doc_id"),
        length(col("bytes")).as("byte_len"),
        md5(col("bytes")).as("content_md5"),
        lower(hex(substring(col("bytes"), 1, 8))).as("head8_hex"))
      .orderBy(col("doc_id"))

  /** Decode (stub) → frame-sample → per-source feature rollup. The
    * mapPartitions boundary is where a real decoder batch would run.
    */
  private def mmDecodePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val decoded: Dataset[DecodedImage] =
      media(s, d).mapPartitions { it =>
        // one decoder per partition; iterator stays lazy (no materialization)
        it.map(FakeDecoder.decode)
      }
    decoded.toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("width").cast("long") * col("height")).as("sum_pixels"),
        sum(col("n_frames").cast("long")).as("sum_frames"),
        sum(col("byte_len")).as("sum_bytes"))
      .orderBy(col("source"))
  }

  private val FrameBytes = 256
  private val FrameStride = 4

  /** Frame sampling over the binary payload: treat the payload as
    * fixed-size frames, slice every FrameStride-th frame with substring
    * (seek + slice, no full decode — the batch shape of video
    * frame-sampling), digest each sampled frame. Stays entirely in
    * whole-stage codegen; the row-multiplying explode is map-side.
    * The oracle slices the source VARCHAR (DuckDB 1.0 has no BLOB
    * substring), which equals byte slicing because the fixture text is
    * verified all-ASCII — a non-ASCII fixture would fail the hash gate
    * loudly, not silently.
    */
  private def mmFrameSample(s: SparkSession, d: String): DataFrame =
    media(s, d).toDF()
      .select(col("doc_id"), col("bytes"),
        (length(col("bytes")) / FrameBytes).cast("int").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("bytes"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(FrameStride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(bytes, frame_idx * $FrameBytes + 1, $FrameBytes)"))
          .as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> mmBinaryFeatures _,
    "mm_decode_pipeline" -> mmDecodePipeline _,
    "mm_frame_sample" -> mmFrameSample _
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_features" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS byte_len,
             md5(text) AS content_md5,
             lower(substr(hex(encode(text)), 1, 16)) AS head8_hex
      FROM documents ORDER BY doc_id""",
    "mm_frame_sample" -> """
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5
      FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(length(text) // 256 AS INT), 4)) AS frame_idx
        FROM documents
        WHERE length(text) // 256 > 0)
      ORDER BY doc_id, frame_idx""",
    "mm_decode_pipeline" -> """
      SELECT source, COUNT(*) AS n_images,
             CAST(SUM((64 + doc_id % 64) * (48 + doc_id % 48)) AS BIGINT) AS sum_pixels,
             CAST(SUM(n_chars // 100 + 1) AS BIGINT) AS sum_frames,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes
      FROM documents GROUP BY source ORDER BY source"""
  ).map { case (k, v) => k -> v.stripMargin.trim }
}

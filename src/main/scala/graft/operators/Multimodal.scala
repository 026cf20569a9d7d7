package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing [EXT] (SURVEY.md §2.6): media payloads as
  * opaque `binary` columns with typed metadata, processed per-partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`stubDecode`) — but everything
  * Spark-side is real and tested: the (payload, metadata) schema, the
  * batch-iterator processing shape (`mapPartitions`, the Scala analogue
  * of `mapInPandas` — one iterator per partition, constant memory), the
  * partitioning, and the feature-struct output schema that a real
  * libjpeg/ffmpeg decoder would fill in.
  *
  * Scale notes: payload bytes never shuffle — features are computed in
  * the scan stage and the binary column is dropped immediately after.
  * A real pipeline reads payloads from object storage by reference;
  * here the payload is synthesized from the documents table so the
  * plumbing is exercised end to end. */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Feature record a real decoder would produce per media payload. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * A production build replaces only this function with e.g. a JNI
    * libjpeg call — the signature (bytes in, features out) and the
    * surrounding iterator plumbing are exactly what that needs. */
  def stubDecode(docId: Long, mediaType: String, payload: Array[Byte]): MediaFeatures = {
    var crc = 0L
    var i = 0
    while (i < payload.length) {
      crc = (crc * 131 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(
      doc_id = docId,
      media_type = mediaType,
      n_bytes = payload.length,
      checksum = crc,
      width = (crc % 1920).toInt,
      height = (crc % 1080).toInt,
      n_frames = if (mediaType == "video") (crc % 300).toInt else 1)
  }

  /** Attach a synthetic binary payload + media-type metadata to the
    * documents table (in a real pipeline this is the raw media bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int")).as("media_type"))

  /** Batch feature extraction: one iterator per partition (constant
    * memory, codec state reused across rows — the mapInPandas shape). */
  def extractFeatures(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    graft.core.Par.fanout(
      withBytes.select(col("doc_id"), col("media_type"), col("payload")))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of the (stub) decoder happens here
        it.map { case (id, mt, bytes) => stubDecode(id, mt, bytes) }
      }
      .toDF()
  }

  val queries: Map[String, Q] = Map(
    // Binary-column metadata path — pure Column ops, fully oracle-checked
    // (byte length + first byte of the payload).
    "multimodal_binary_meta" -> ((s, d) => {
      val docs = graft.sources.Tables.documents(s, d)
      withPayload(docs).select(
        col("doc_id"), col("media_type"),
        length(col("payload")).as("n_bytes"),
        substring(col("payload"), 1, 1).cast("string").as("first_char"))
    }),

    // Full decode pipeline with the stubbed codec (rows-only check:
    // the checksum math has no SQL oracle, determinism is asserted in
    // MultimodalSpec).
    "multimodal_decode_features" -> ((s, d) =>
      extractFeatures(withPayload(graft.sources.Tables.documents(s, d)))),

    // Frame sampling for video payloads: every 10th frame index as an
    // in-row array (`sequence` — no explode, no shuffle), plus the
    // scalar summary the oracle checks. A real pipeline feeds the
    // sampled indices to the decoder stub above.
    "multimodal_frame_sample" -> ((s, d) => {
      val vids = graft.sources.Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === lit(2)) // media_type: video
        .select(col("doc_id"),
          greatest(floor(col("n_chars") / lit(10)), lit(1)).cast("long")
            .as("n_frames"))
      vids.select(col("doc_id"), col("n_frames"),
        sequence(lit(0L), col("n_frames") - 1, lit(10L)).as("frames"))
        .select(col("doc_id"), col("n_frames"),
          size(col("frames")).as("n_sampled"),
          element_at(col("frames"), -1).as("last_sampled"))
    })
  )

  val oracles: Map[String, String] = Map(
    "multimodal_frame_sample" ->
      """WITH v AS (
           SELECT doc_id,
             GREATEST(CAST(FLOOR(n_chars / 10) AS BIGINT), 1) AS n_frames
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames,
           CAST(FLOOR((n_frames - 1) / 10) + 1 AS INTEGER) AS n_sampled,
           CAST(n_frames - 1 - ((n_frames - 1) % 10) AS BIGINT) AS last_sampled
         FROM v""",
    "multimodal_binary_meta" ->
      """SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
         SUBSTR(text, 1, 1) AS first_char
         FROM documents"""
  )
}

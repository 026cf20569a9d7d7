package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing [EXT] (SURVEY.md §2.6): media payloads as
  * opaque `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step is REAL header parsing (pure JDK, no codec deps):
  * BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) for images, canonical
  * 44-byte PCM WAV for audio, and a minimal self-describing video
  * container ("GFTV": magic + frame count + an embedded BMP poster
  * frame — this environment ships no public video codec, so the video
  * container is this library's own, documented format). The fixtures'
  * payloads are synthesized with valid headers in [[withPayload]], so
  * every decoded feature is integer header math the DuckDB oracle
  * recomputes from the documents table — the decode query is fully
  * oracle-checked, not rows-only.
  *
  * The decoder infers the media type from container magic bytes — the
  * metadata column is carried alongside but never trusted, which is the
  * real-pipeline contract (bytes are the truth, metadata is a hint).
  *
  * Scale notes: payload bytes never shuffle — features are computed in
  * the scan stage (`mapPartitions`, one iterator per partition, constant
  * memory — the Scala analogue of `mapInPandas`) and the binary column
  * is dropped immediately after. A real pipeline reads payloads from
  * object storage by reference; here the payload is synthesized from the
  * documents table so the plumbing is exercised end to end. */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Feature record the decoder produces per media payload. */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      n_frames: Int)

  // ---------- container writers (fixture synthesis) ----------

  /** Valid 54-byte BMP header (24bpp, BI_RGB) + stand-in pixel bytes.
    * Only the header is semantically load-bearing for the decoder; the
    * body stands in for pixel data without inflating the fixtures to
    * width*height*3 bytes. */
  def bmpBytes(w: Int, h: Int, pixelStandIn: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + pixelStandIn.length)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(out.length)            // file size
    bb.putInt(0)                     // reserved
    bb.putInt(54)                    // pixel data offset
    bb.putInt(40)                    // BITMAPINFOHEADER size
    bb.putInt(w).putInt(h)
    bb.putShort(1).putShort(24)      // planes, bpp
    bb.putInt(0)                     // compression = BI_RGB
    bb.putInt(pixelStandIn.length)   // image size (stand-in length)
    bb.putInt(2835).putInt(2835)     // 72 dpi
    bb.putInt(0).putInt(0)           // palette counts
    bb.put(pixelStandIn)
    out
  }

  /** Canonical 44-byte PCM WAV header (16-bit mono) + data, truncated
    * to the 2-byte block align. */
  def wavBytes(sampleRate: Int, pcm: Array[Byte]): Array[Byte] = {
    val dataLen = pcm.length - (pcm.length % 2)
    val out = new Array[Byte](44 + dataLen)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(16)                    // fmt chunk size
    bb.putShort(1).putShort(1)       // PCM, mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)        // byte rate
    bb.putShort(2).putShort(16)      // block align, bits/sample
    bb.put("data".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    bb.put(pcm, 0, dataLen)
    out
  }

  /** Minimal video container: "GFTV" magic, int32 LE frame count, then
    * an embedded BMP poster frame. */
  def gftvBytes(nFrames: Int, poster: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + poster.length)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GFTV".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(nFrames)
    bb.put(poster)
    out
  }

  // ---------- real decoder (pure JDK header parsing) ----------

  /** Parse container magic + headers into features. The media type is
    * DERIVED from the bytes, not taken from metadata. Video duration
    * assumes the container's fixed 25 fps (40 ms/frame). */
  def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) =
      new String(payload, off, n, StandardCharsets.US_ASCII)
    var crc = 0L
    var i = 0
    while (i < payload.length) {
      crc = (crc * 131 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    if (payload.length >= 54 && ascii(0, 2) == "BM")
      MediaFeatures(docId, "image", payload.length, crc,
        width = bb.getInt(18), height = bb.getInt(22),
        sample_rate = 0, duration_ms = 0L, n_frames = 1)
    else if (payload.length >= 44 && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE") {
      val rate = bb.getInt(24)
      val blockAlign = bb.getShort(32).toInt
      val dataLen = bb.getInt(40)
      MediaFeatures(docId, "audio", payload.length, crc,
        width = 0, height = 0, sample_rate = rate,
        duration_ms = dataLen.toLong * 1000 / (rate.toLong * blockAlign),
        n_frames = 1)
    } else if (payload.length >= 62 && ascii(0, 4) == "GFTV") {
      val nFrames = bb.getInt(4)
      MediaFeatures(docId, "video", payload.length, crc,
        width = bb.getInt(8 + 18), height = bb.getInt(8 + 22),
        sample_rate = 0, duration_ms = nFrames * 40L, n_frames = nFrames)
    } else throw new IllegalArgumentException(
      s"unknown media container for doc $docId (${payload.length} bytes)")
  }

  /** Attach a synthetic binary payload (valid container headers, see
    * above) + media-type metadata to the documents table. Typed
    * mapPartitions: fixture-synthesis boundary, not a query hot path —
    * a real pipeline lands these bytes from object storage. */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars").cast("int"))
      .as[(Long, String, Int)]
      .mapPartitions(_.map { case (id, text, nc) =>
        val body = text.getBytes(StandardCharsets.UTF_8)
        val (w, h) = (nc % 1920 + 1, nc % 1080 + 1)
        (id % 3) match {
          case 0 => (id, bmpBytes(w, h, body), "image")
          case 1 => (id, wavBytes(16000, body), "audio")
          case _ => (id,
            gftvBytes(math.max(nc / 10, 1), bmpBytes(w, h, body)), "video")
        }
      })
      .toDF("doc_id", "payload", "media_type")
  }

  /** Batch feature extraction: one iterator per partition (constant
    * memory, decoder state reusable across rows — the mapInPandas
    * shape). Media type comes from the decoder, not the metadata. */
  def extractFeatures(withBytes: DataFrame): DataFrame = {
    val spark = withBytes.sparkSession
    import spark.implicits._
    graft.core.Par.fanout(
      withBytes.select(col("doc_id"), col("payload")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decode(id, bytes) })
      .toDF()
  }

  val queries: Map[String, Q] = Map(
    // Binary-column metadata path — pure Column ops, fully oracle-checked
    // (byte length + container magic's first byte).
    "multimodal_binary_meta" -> ((s, d) => {
      val docs = graft.sources.Tables.documents(s, d)
      withPayload(docs).select(
        col("doc_id"), col("media_type"),
        length(col("payload")).as("n_bytes"),
        substring(col("payload"), 1, 1).cast("string").as("first_char"))
    }),

    // Full decode pipeline — REAL header parsing, fully oracle-checked:
    // every output column is integer header math DuckDB recomputes from
    // the documents table. The payload checksum stays internal (no SQL
    // equivalent); MultimodalSpec asserts its determinism.
    "multimodal_decode_features" -> ((s, d) =>
      extractFeatures(withPayload(graft.sources.Tables.documents(s, d)))
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("sample_rate"),
          col("duration_ms"), col("n_frames"))),

    // Resize for image payloads: real decode → halve both dimensions →
    // nearest-neighbor downsample of the pixel buffer (every 2nd
    // stand-in byte) → rebuild a VALID BMP container → re-decode it
    // with the same real parser. The output columns come from the
    // re-decoded resized payload, so the oracle's header arithmetic
    // proves the full rebuild round-trip, not just the intent. Payload
    // bytes never shuffle; the per-partition iterator is the
    // mapInPandas shape.
    "multimodal_resize" -> ((s, d) => {
      import s.implicits._
      val imgs = withPayload(graft.sources.Tables.documents(s, d))
        .filter(col("media_type") === "image")
        .select(col("doc_id"), col("payload"))
      graft.core.Par.fanout(imgs).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val f = decode(id, bytes)
          val (newW, newH) =
            (math.max(f.width / 2, 1), math.max(f.height / 2, 1))
          val body = java.util.Arrays.copyOfRange(bytes, 54, bytes.length)
          val resized = Array.tabulate((body.length + 1) / 2)(i => body(i * 2))
          val rf = decode(id, bmpBytes(newW, newH, resized))
          (id, f.width, f.height, rf.width, rf.height, rf.n_bytes)
        })
        .toDF("doc_id", "src_width", "src_height", "width", "height",
          "n_bytes")
    }),

    // Frame sampling for video payloads: every 10th frame index as an
    // in-row array (`sequence` — no explode, no shuffle), plus the
    // scalar summary the oracle checks. A real pipeline feeds the
    // sampled indices to the decoder above.
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
    }),

    // Cross-modal contrastive pair construction over the PAIRED subset:
    // embeddings cover vec_id == doc_id for the first n_vecs documents
    // (at sf0.1: 2000 of 5000 docs), so the triple builder explicitly
    // keeps only documents that have an embedding — the filter states
    // the modality-coverage contract instead of letting the join drop
    // rows silently; a real pipeline routes the remainder to a
    // text-only branch. Each kept doc gets a deterministic LCG-drawn
    // negative (Corpus.A/C/M — the shared recomputable draw; collision
    // with the positive steps to the next vector). Both embedding
    // joins key on vec_id — at scale the embedding table shuffles once
    // and the negative join reuses the same partitioning; n_vecs is a
    // 1-row broadcast scalar.
    "multimodal_contrastive_pairs" -> ((s, d) => {
      val emb = graft.sources.Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"))
      val nVecs = emb.agg(count(lit(1)).as("n_vecs"))
      val draw = graft.operators.Corpus.lcgDraw(col("doc_id")) %
        col("n_vecs")
      val docs = graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .crossJoin(broadcast(nVecs))
        .filter(col("doc_id") < col("n_vecs"))
        .withColumn("neg_id",
          when(draw === col("doc_id"), (draw + 1) % col("n_vecs"))
            .otherwise(draw))
      docs.join(emb.withColumnsRenamed(
          Map("vec_id" -> "pos_id", "label" -> "pos_label")),
          col("doc_id") === col("pos_id"))
        .join(emb.withColumnsRenamed(
          Map("vec_id" -> "nid", "label" -> "neg_label")),
          col("neg_id") === col("nid"))
        .select(col("doc_id"), col("lang"), col("pos_label"),
          col("neg_id"), col("neg_label"))
    })
  )

  val oracles: Map[String, String] = Map(
    "multimodal_resize" ->
      """WITH d AS (
           SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS tb, n_chars
           FROM documents WHERE doc_id % 3 = 0)
         SELECT doc_id,
           CAST(n_chars % 1920 + 1 AS INTEGER) AS src_width,
           CAST(n_chars % 1080 + 1 AS INTEGER) AS src_height,
           CAST(GREATEST((n_chars % 1920 + 1) // 2, 1) AS INTEGER)
             AS width,
           CAST(GREATEST((n_chars % 1080 + 1) // 2, 1) AS INTEGER)
             AS height,
           CAST(54 + (tb + 1) // 2 AS INTEGER) AS n_bytes
         FROM d""",
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
         CAST(CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 54 + OCTET_LENGTH(ENCODE(text))
           WHEN 1 THEN 44 + OCTET_LENGTH(ENCODE(text))
                       - OCTET_LENGTH(ENCODE(text)) % 2
           ELSE 62 + OCTET_LENGTH(ENCODE(text)) END AS INTEGER) AS n_bytes,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'B'
              WHEN 1 THEN 'R' ELSE 'G' END AS first_char
         FROM documents""",
    // Recompute every decoded header field from the documents table —
    // the same integer math the container writers baked into the bytes.
    "multimodal_decode_features" ->
      """WITH d AS (
           SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS m,
             OCTET_LENGTH(ENCODE(text)) AS tb, n_chars
           FROM documents)
         SELECT doc_id,
           CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(CASE m WHEN 0 THEN 54 + tb
                WHEN 1 THEN 44 + tb - tb % 2
                ELSE 62 + tb END AS INTEGER) AS n_bytes,
           CAST(CASE m WHEN 1 THEN 0
                ELSE n_chars % 1920 + 1 END AS INTEGER) AS width,
           CAST(CASE m WHEN 1 THEN 0
                ELSE n_chars % 1080 + 1 END AS INTEGER) AS height,
           CAST(CASE m WHEN 1 THEN 16000 ELSE 0 END AS INTEGER)
             AS sample_rate,
           CAST(CASE m
                WHEN 1 THEN ((tb - tb % 2) * 1000) // 32000
                WHEN 2 THEN GREATEST(n_chars // 10, 1) * 40
                ELSE 0 END AS BIGINT) AS duration_ms,
           CAST(CASE m WHEN 2 THEN GREATEST(n_chars // 10, 1)
                ELSE 1 END AS INTEGER) AS n_frames
         FROM d""",
    "multimodal_contrastive_pairs" ->
      """WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
         d AS (
           SELECT doc_id, lang,
             (((doc_id % 2147483648) * 1103515245 + 12345)
               % 2147483648) % n_vecs AS draw, n_vecs
           FROM documents CROSS JOIN n
           WHERE doc_id < n_vecs),
         withneg AS (
           SELECT doc_id, lang,
             CASE WHEN draw = doc_id THEN (draw + 1) % n_vecs
                  ELSE draw END AS neg_id
           FROM d)
         SELECT w.doc_id, w.lang, p.label AS pos_label,
           w.neg_id, g.label AS neg_label
         FROM withneg w
         JOIN embeddings p ON w.doc_id = p.vec_id
         JOIN embeddings g ON w.neg_id = g.vec_id"""
  )
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: schema, determinism, and the real header
  * parsers (BMP / WAV / GFTV) round-tripping through the writers. */
class MultimodalSpec extends SparkSpec {

  test("payload schema: binary column + typed metadata") {
    val wp = Multimodal.withPayload(Tables.documents(spark, sf0001))
    val sch = wp.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("media_type").dataType.typeName == "string")
  }

  test("header writers round-trip through the decoder") {
    val bmp = Multimodal.bmpBytes(640, 480, Array[Byte](1, 2, 3))
    val img = Multimodal.decode(7L, bmp)
    assert(img.media_type == "image" && img.width == 640 &&
      img.height == 480 && img.n_bytes == 57 && img.n_frames == 1)

    val wav = Multimodal.wavBytes(16000, Array.fill[Byte](64001)(0))
    val aud = Multimodal.decode(8L, wav)
    // 64000 data bytes / (16000 Hz * 2 B/sample) = 2.000 s
    assert(aud.media_type == "audio" && aud.sample_rate == 16000 &&
      aud.duration_ms == 2000L && aud.n_bytes == 44 + 64000)

    val vid = Multimodal.decode(9L,
      Multimodal.gftvBytes(250, Multimodal.bmpBytes(320, 200, Array.empty)))
    assert(vid.media_type == "video" && vid.n_frames == 250 &&
      vid.width == 320 && vid.height == 200 && vid.duration_ms == 10000L)

    intercept[IllegalArgumentException] {
      Multimodal.decode(10L, Array.fill[Byte](100)(42))
    }
  }

  test("feature extraction is deterministic and schema-complete") {
    val wp = Multimodal.withPayload(Tables.documents(spark, sf0001).limit(30))
    val a = Multimodal.extractFeatures(wp).orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(wp).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "checksum", "width", "height",
        "sample_rate", "duration_ms", "n_frames"))
    // n_bytes must equal the payload byte length
    val check = Multimodal.extractFeatures(wp)
      .join(wp.select(col("doc_id"), length(col("payload")).as("plen")), "doc_id")
      .filter(col("n_bytes") =!= col("plen")).count()
    assert(check == 0)
    // decoder-inferred type agrees with the carried metadata column
    val mism = Multimodal.extractFeatures(wp).as("f")
      .join(wp.select(col("doc_id"), col("media_type").as("meta_type")), "doc_id")
      .filter(col("media_type") =!= col("meta_type")).count()
    assert(mism == 0)
    // only video gets multi-frame counts
    assert(Multimodal.extractFeatures(wp)
      .filter(col("media_type") =!= "video" && col("n_frames") =!= 1)
      .count() == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: schema, determinism, payload→feature mapping
  * (the codec itself is a documented stub). */
class MultimodalSpec extends SparkSpec {

  test("payload schema: binary column + typed metadata") {
    val wp = Multimodal.withPayload(Tables.documents(spark, sf0001))
    val sch = wp.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("media_type").dataType.typeName == "string")
  }

  test("feature extraction is deterministic and schema-complete") {
    val wp = Multimodal.withPayload(Tables.documents(spark, sf0001).limit(30))
    val a = Multimodal.extractFeatures(wp).orderBy("doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(wp).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "checksum", "width", "height",
        "n_frames"))
    // n_bytes must equal the payload byte length
    val check = Multimodal.extractFeatures(wp)
      .join(wp.select(col("doc_id"), length(col("payload")).as("plen")), "doc_id")
      .filter(col("n_bytes") =!= col("plen")).count()
    assert(check == 0)
    // only video gets multi-frame counts
    assert(Multimodal.extractFeatures(wp)
      .filter(col("media_type") =!= "video" && col("n_frames") =!= 1)
      .count() == 0)
  }
}

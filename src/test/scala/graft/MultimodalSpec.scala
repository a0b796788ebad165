package graft

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media table: binary payload column + typed metadata") {
    val m = MediaPipeline.syntheticMedia(spark, Sf)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("modality") == "string")
    assert(m.count() > 0)
  }

  test("feature extraction is partition-local, deterministic, and payload-free downstream") {
    val feats = MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf))
    val r1 = feats.orderBy("media_id").collect()
    val r2 = MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf))
      .orderBy("media_id").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(!feats.schema.fieldNames.contains("payload"))
    r1.take(20).foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.byte_entropy > 0.0 && f.byte_entropy <= 8.0)
      assert(f.width >= 64 && f.height >= 64)
      assert(if (f.modality == "image") f.duration_ms == 0 else f.duration_ms > 0)
      assert(f.payload_sha.length == 64)
    }
  }

  test("modality report aggregates the three modalities") {
    val rep = MediaPipeline.modalityReport(
      MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(spark, Sf)))
    val rows = rep.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("image", "audio", "video"))
    assert(rows.values.sum == MediaPipeline.syntheticMedia(spark, Sf).count())
  }

  test("payload sha matches Spark's sha2 over the same bytes (plumbing consistency)") {
    val m = MediaPipeline.syntheticMedia(spark, Sf).limit(10)
    val viaSql = m.toDF().select(col("media_id"), sha2(col("payload"), 256).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaExtract = MediaPipeline.extractFeatures(m).collect()
      .map(f => f.media_id -> f.payload_sha).toMap
    assert(viaSql == viaExtract)
  }
}

package graft.queries

import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/** Multimodal-column queries. m1 verifies the binary-column plumbing
  * (payload bytes, content hash, modality typing) against the SQL
  * oracle; m2 runs the full typed `mapPartitions` feature-extraction
  * pass (stubbed decode — see [[graft.multimodal.MediaPipeline]]),
  * checked by the rows-only gate + specs since the stub decode is not
  * SQL-expressible.
  */
object Multimodal extends QueryGroup {

  private val q1 = QueryDef(
    "m1_media_manifest",
    (s, dir) => {
      val media = MediaPipeline.syntheticMedia(s, dir).toDF()
      media.select(
          col("media_id"), col("modality"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha"))
        .orderBy("media_id")
        .limit(200)
    },
    Some("""
      SELECT doc_id AS media_id,
             (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS payload_sha
      FROM documents
      ORDER BY media_id
      LIMIT 200"""))

  private val q2 = QueryDef(
    "m2_media_features",
    (s, dir) =>
      MediaPipeline.modalityReport(
        MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(s, dir))),
    None)

  val all: Seq[QueryDef] = Seq(q1, q2)
}

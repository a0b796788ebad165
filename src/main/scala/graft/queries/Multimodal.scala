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

  /** Full typed `mapPartitions` feature-extraction pass. The decode stub
    * derives dimensions from the payload sha-256 and the entropy fold
    * iterates the byte histogram in ascending byte order, so every
    * feature is reproducible in DuckDB SQL — the whole JVM pipeline
    * (encoders, partition-local extractor, batching) is hash-checked
    * end-to-end, not just rows-counted. */
  private val q2 = QueryDef(
    "m2_media_features",
    (s, dir) => {
      val feats = MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(s, dir))
      feats.toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), col("duration_ms"),
          round(col("byte_entropy"), 6).as("entropy"),
          col("payload_sha"))
        .orderBy("media_id")
        .limit(300)
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id,
               (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
               encode(text) AS payload,
               sha256(text) AS sha,
               octet_length(encode(text)) AS n_bytes
        FROM documents),
      h AS (SELECT *, ('0x' || substr(sha, 1, 12))::BIGINT AS h0 FROM m),
      bytes AS (
        SELECT media_id, n_bytes,
               ('0x' || substr(hex(payload), 2 * i + 1, 2))::INT AS byte
        FROM h, unnest(range(0, n_bytes)) AS t(i)),
      counts AS (SELECT media_id, n_bytes, byte, COUNT(*) AS c FROM bytes GROUP BY 1, 2, 3),
      ent AS (
        SELECT media_id,
               SUM(-((CAST(c AS DOUBLE) / n_bytes)
                     * (ln(CAST(c AS DOUBLE) / n_bytes) / ln(2))) ORDER BY byte) AS entropy
        FROM counts GROUP BY 1)
      SELECT h.media_id, h.modality, h.n_bytes,
             64 + h0 % 1024 AS width,
             64 + (h0 // 1024) % 1024 AS height,
             CASE WHEN h.modality = 'image' THEN 0
                  ELSE 1000 + (h0 // 1048576) % 60000 END AS duration_ms,
             ROUND(COALESCE(ent.entropy, 0.0), 6) AS entropy,
             h.sha AS payload_sha
      FROM h LEFT JOIN ent ON h.media_id = ent.media_id
      ORDER BY h.media_id
      LIMIT 300"""))

  val all: Seq[QueryDef] = Seq(q1, q2)
}

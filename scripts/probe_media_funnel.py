#!/usr/bin/env python3
"""Pre-registration probe for m9_media_funnel (the probe discipline):
per-stage attrition of the media curation funnel — quality (min
payload bytes) -> guarded perceptual near-dup with canonical keep ->
benchmark decontamination — at each scale, for candidate MinBytes
values. Registered constants must leave EVERY stage non-vacuous at
every scale. Also records why the degenerate-bits quality leg is NOT
registered: setbits==0 (flat media) occurs zero times at every scale
(min setbits 15-18), so an aHash-flatness rule would be dead fixture
code."""
import sys
import duckdb

MEDIA_BANDS = """
WITH RECURSIVE m AS (
  SELECT doc_id AS media_id, encode(text) AS payload,
         octet_length(encode(text)) AS n
  FROM documents),
bytes AS (
  SELECT media_id, n,
         ('0x' || substr(hex(payload), 2 * i + 1, 2))::INT AS byte,
         CAST(i * 64 // n AS INT) AS blk
  FROM m, unnest(range(0, n)) AS t(i)
  WHERE n > 0),
tot AS (SELECT media_id, SUM(byte) AS ts FROM bytes GROUP BY 1),
blksums AS (
  SELECT media_id, blk, SUM(byte) AS bs, COUNT(*) AS bl
  FROM bytes GROUP BY 1, 2),
blocks AS (
  SELECT m.media_id, m.n, CAST(j AS INT) AS blk
  FROM m, unnest(range(0, 64)) AS r(j)),
bits AS (
  SELECT b.media_id, b.blk,
         CASE WHEN COALESCE(s.bs, 0) * b.n
                   > COALESCE(t.ts, 0) * COALESCE(s.bl, 0)
              THEN 1 ELSE 0 END AS bit
  FROM blocks b
  LEFT JOIN blksums s USING (media_id, blk)
  LEFT JOIN tot t USING (media_id)),
bands AS MATERIALIZED (
  SELECT media_id, CAST(blk // 16 AS INT) AS band,
         CAST(SUM(bit << (blk % 16)) AS INT) AS bv
  FROM bits GROUP BY 1, 2),
bw AS MATERIALIZED (SELECT media_id,
         MAX(CASE WHEN band = 0 THEN bv END) AS b0,
         MAX(CASE WHEN band = 1 THEN bv END) AS b1,
         MAX(CASE WHEN band = 2 THEN bv END) AS b2,
         MAX(CASE WHEN band = 3 THEN bv END) AS b3
       FROM bands GROUP BY 1)
"""


def main(sfdir, minbytes_grid=(40, 50, 60)):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    for mb in minbytes_grid:
        r = con.execute(MEDIA_BANDS + f""",
          qok AS (SELECT media_id FROM m
                  WHERE media_id % 7 != 0 AND n >= {mb}),
          keys AS (SELECT media_id AS id,
                          CAST(band AS BIGINT) * 65536 + bv AS key
                   FROM bands WHERE media_id IN (SELECT media_id FROM qok)),
          counts AS (SELECT key, COUNT(DISTINCT id) AS cnt
                     FROM keys GROUP BY key),
          hot AS (SELECT key FROM counts WHERE cnt >= 4),
          sat AS (SELECT DISTINCT id FROM keys JOIN hot USING (key)),
          cold AS (SELECT id, key FROM keys
                   WHERE key NOT IN (SELECT key FROM hot)),
          cand AS (SELECT DISTINCT a.id AS a, b.id AS b
                   FROM cold a JOIN cold b
                     ON a.key = b.key AND a.id < b.id),
          ver AS (
            SELECT a, b FROM cand
            JOIN bw x ON x.media_id = cand.a
            JOIN bw y ON y.media_id = cand.b
            WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
              <= 12),
          edges AS (SELECT a, b FROM ver UNION ALL SELECT b, a FROM ver),
          reach AS (
            SELECT a AS node, a AS r FROM edges
            UNION
            SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a),
          comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
          nds AS (SELECT id AS media_id FROM sat
                  UNION SELECT node FROM comp WHERE node != component),
          s1 AS (SELECT media_id FROM qok
                 WHERE media_id NOT IN (SELECT media_id FROM nds)),
          ev AS (
            SELECT b0, b1, b2, b3 FROM bw WHERE media_id % 7 = 0
            UNION ALL
            SELECT b0, b1, b2, b3 FROM bw
            WHERE media_id % 7 != 0 AND media_id % 31 = 5),
          contam AS (
            SELECT DISTINCT t.media_id FROM bw t JOIN ev e
              ON (t.b0 = e.b0 OR t.b1 = e.b1 OR t.b2 = e.b2 OR t.b3 = e.b3)
            WHERE t.media_id IN (SELECT media_id FROM s1)
              AND bit_count(xor(t.b0, e.b0)) + bit_count(xor(t.b1, e.b1))
                + bit_count(xor(t.b2, e.b2)) + bit_count(xor(t.b3, e.b3))
              <= 8)
          SELECT (SELECT COUNT(*) FROM m WHERE media_id % 7 != 0),
                 (SELECT COUNT(*) FROM qok),
                 (SELECT COUNT(*) FROM nds),
                 (SELECT COUNT(*) FROM s1),
                 (SELECT COUNT(*) FROM contam)""").fetchone()
        print(f"{sfdir} minbytes={mb}: raw={r[0]} q_pass={r[1]} "
              f"neardup_drop={r[2]} s1_pass={r[3]} contam_drop={r[4]} "
              f"clean={r[3] - r[4]}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        main(d)

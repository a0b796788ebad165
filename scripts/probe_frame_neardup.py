#!/usr/bin/env python3
"""Pre-registration probe for m5_frame_neardup (the probe_phash.py /
pl11 fixture discipline): frame hashes are the m3 aHash family over the
m4 frame plan's temporal byte-slices of each container. Computes the
frame-band-key occupancy distribution and, per candidate (hotThreshold,
hammingMax, overlap-tau) fixture triple, the saturated / verified /
container-flagged counts at each scale — so the registered constants
are the smallest non-vacuous ones, not guesses."""
import sys
import duckdb

FRAME_BANDS = """
WITH m AS (
  SELECT doc_id AS media_id, encode(text) AS payload,
         octet_length(encode(text)) AS L,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
         sha256(text) AS sha
  FROM documents),
h AS (SELECT *, ('0x' || substr(sha, 1, 12))::BIGINT AS h0 FROM m),
d AS (
  SELECT media_id, payload, L, modality,
         CASE WHEN modality = 'image' THEN 0
              ELSE 1000 + (h0 // 1048576) % 60000 END AS dur
  FROM h),
plan AS (
  SELECT *, CAST(GREATEST(1, LEAST(
           CASE WHEN modality = 'image' OR dur <= 0 THEN 1
                ELSE LEAST(8, 1 + dur // 10000) END, L)) AS INT) AS nf
  FROM d),
bytes AS (
  SELECT media_id, nf, L, CAST(i * nf // L AS INT) AS f, i,
         ('0x' || substr(hex(payload), 2 * i + 1, 2))::INT AS byte
  FROM plan, unnest(range(0, L)) AS t(i)),
fr AS (
  SELECT media_id, f, ANY_VALUE(nf) AS nf, COUNT(*) AS fm,
         MIN(i) AS fstart, SUM(byte) AS fts
  FROM bytes GROUP BY 1, 2),
blksums AS (
  SELECT b.media_id, b.f,
         CAST((b.i - fr.fstart) * 64 // fr.fm AS INT) AS blk,
         SUM(b.byte) AS bs, COUNT(*) AS bl
  FROM bytes b JOIN fr USING (media_id, f)
  GROUP BY 1, 2, 3),
blocks AS (
  SELECT fr.media_id, fr.f, fr.fm, fr.fts, CAST(j AS INT) AS blk
  FROM fr, unnest(range(0, 64)) AS r(j)),
bits AS (
  SELECT b.media_id, b.f, b.blk,
         CASE WHEN COALESCE(s.bs, 0) * b.fm > b.fts * COALESCE(s.bl, 0)
              THEN 1 ELSE 0 END AS bit
  FROM blocks b LEFT JOIN blksums s USING (media_id, f, blk)),
bands AS MATERIALIZED (
  SELECT media_id, f, CAST(blk // 16 AS INT) AS band,
         CAST(SUM(bit << (blk % 16)) AS INT) AS bv
  FROM bits GROUP BY 1, 2, 3),
nframes AS (SELECT media_id, COUNT(DISTINCT f) AS n_frames FROM bands GROUP BY 1),
keys AS MATERIALIZED (
  SELECT media_id * 8 + f AS id, CAST(band AS BIGINT) * 65536 + bv AS key
  FROM bands),
fw AS MATERIALIZED (
  SELECT media_id * 8 + f AS id, media_id, f,
         MAX(CASE WHEN band = 0 THEN bv END) AS b0,
         MAX(CASE WHEN band = 1 THEN bv END) AS b1,
         MAX(CASE WHEN band = 2 THEN bv END) AS b2,
         MAX(CASE WHEN band = 3 THEN bv END) AS b3
  FROM bands GROUP BY 1, 2, 3)
"""


def main(sfdir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    occ = con.execute(FRAME_BANDS + """
      SELECT cnt, COUNT(*) FROM (
        SELECT key, COUNT(DISTINCT id) AS cnt FROM keys GROUP BY 1)
      GROUP BY 1 ORDER BY 1 DESC LIMIT 8""").fetchall()
    nf = con.execute(FRAME_BANDS +
        "SELECT COUNT(*), SUM(n_frames) FROM nframes").fetchone()
    print(f"{sfdir}: media={nf[0]} frames={nf[1]} "
          f"top frame-band-key occupancies (cnt, n_keys): {occ}")
    for hot in (4, 8, 16):
        for ham in (4, 8, 10, 12):
            r = con.execute(FRAME_BANDS + f""",
              counts AS (SELECT key, COUNT(DISTINCT id) AS cnt FROM keys GROUP BY key),
              hot AS (SELECT key FROM counts WHERE cnt >= {hot}),
              sat AS (SELECT DISTINCT id FROM keys JOIN hot USING (key)),
              satm AS (SELECT DISTINCT id // 8 AS media_id FROM sat),
              cold AS (SELECT id, key FROM keys WHERE key NOT IN (SELECT key FROM hot)),
              cand AS (
                SELECT DISTINCT a.id AS a, b.id AS b
                FROM cold a JOIN cold b ON a.key = b.key AND a.id < b.id
                WHERE a.id // 8 <> b.id // 8),
              ver AS (
                SELECT a, b, a // 8 AS ma, b // 8 AS mb FROM cand
                JOIN fw x ON x.id = cand.a
                JOIN fw y ON y.id = cand.b
                WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
                  <= {ham}),
              ov AS (
                SELECT ma, mb, COUNT(DISTINCT a) AS m_a, COUNT(DISTINCT b) AS m_b
                FROM ver GROUP BY 1, 2),
              ovn AS (
                SELECT ov.*, na.n_frames AS n_a, nb.n_frames AS n_b
                FROM ov JOIN nframes na ON na.media_id = ov.ma
                        JOIN nframes nb ON nb.media_id = ov.mb)
              SELECT (SELECT COUNT(*) FROM sat), (SELECT COUNT(*) FROM satm),
                     (SELECT COUNT(*) FROM ver), (SELECT COUNT(*) FROM ovn),
                     (SELECT COUNT(*) FROM ovn WHERE 3*m_a >= n_a AND 3*m_b >= n_b),
                     (SELECT COUNT(*) FROM ovn WHERE 2*m_a >= n_a AND 2*m_b >= n_b),
                     (SELECT COUNT(*) FROM ovn WHERE 3*m_a >= 2*n_a AND 3*m_b >= 2*n_b)
              """).fetchone()
            print(f"  hot={hot:2d} ham={ham:2d}: sat_frames={r[0]:5d} "
                  f"sat_media={r[1]:5d} ver_pairs={r[2]:6d} cont_pairs={r[3]:5d} "
                  f"tau1/3={r[4]:4d} tau1/2={r[5]:4d} tau2/3={r[6]:4d}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        main(d)

#!/usr/bin/env python3
"""Pre-registration probe for m3_phash_neardup (the pl11/d11 fixture
discipline): computes the aHash band-key occupancy distribution and the
verified-pair / saturated-doc counts per candidate (hotThreshold,
hammingMax) fixture pair, at each scale, so the registered constants are
the smallest non-vacuous ones — not guesses."""
import sys
import duckdb

AHASH = """
WITH m AS (
  SELECT doc_id AS media_id, encode(text) AS payload,
         octet_length(encode(text)) AS n
  FROM documents),
bytes AS (
  SELECT media_id, n,
         ('0x' || substr(hex(payload), 2*i+1, 2))::INT AS byte,
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
         CASE WHEN COALESCE(s.bs, 0) * b.n > COALESCE(t.ts, 0) * COALESCE(s.bl, 0)
              THEN 1 ELSE 0 END AS bit
  FROM blocks b
  LEFT JOIN blksums s USING (media_id, blk)
  LEFT JOIN tot t USING (media_id)),
bands AS (
  SELECT media_id, CAST(blk // 16 AS INT) AS band,
         CAST(SUM(bit << (blk % 16)) AS INT) AS bv
  FROM bits GROUP BY 1, 2)
"""

def main(sfdir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    occ = con.execute(AHASH + """
      SELECT cnt, COUNT(*) FROM (
        SELECT band * 65536 + bv AS key, COUNT(DISTINCT media_id) AS cnt
        FROM bands GROUP BY 1) GROUP BY 1 ORDER BY 1 DESC LIMIT 8""").fetchall()
    print(f"{sfdir}: top band-key occupancies (cnt, n_keys): {occ}")
    for hot in (4, 8, 16, 32):
        for ham in (4, 6, 10, 11, 12):
            r = con.execute(AHASH + f""",
              keys AS (SELECT media_id AS id, band * 65536 + bv AS key FROM bands),
              counts AS (SELECT key, COUNT(DISTINCT id) AS cnt FROM keys GROUP BY key),
              hot AS (SELECT key FROM counts WHERE cnt >= {hot}),
              sat AS (SELECT DISTINCT id FROM keys JOIN hot USING (key)),
              cold AS (SELECT id, key FROM keys WHERE key NOT IN (SELECT key FROM hot)),
              cand AS (
                SELECT DISTINCT a.id AS a, b.id AS b
                FROM cold a JOIN cold b ON a.key = b.key AND a.id < b.id),
              bw AS (SELECT media_id,
                       MAX(CASE WHEN band = 0 THEN bv END) AS b0,
                       MAX(CASE WHEN band = 1 THEN bv END) AS b1,
                       MAX(CASE WHEN band = 2 THEN bv END) AS b2,
                       MAX(CASE WHEN band = 3 THEN bv END) AS b3
                     FROM bands GROUP BY 1),
              ver AS (
                SELECT a, b FROM cand
                JOIN bw x ON x.media_id = cand.a
                JOIN bw y ON y.media_id = cand.b
                WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                    + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= {ham})
              SELECT (SELECT COUNT(*) FROM sat),
                     (SELECT COUNT(*) FROM cand),
                     (SELECT COUNT(*) FROM ver)""").fetchall()[0]
            print(f"  hot={hot} ham={ham}: saturated={r[0]} cand_pairs={r[1]} verified={r[2]}")

if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        main(sf)

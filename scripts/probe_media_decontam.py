#!/usr/bin/env python3
"""Pre-registration probe for m6_media_decontam (the probe_phash.py
fixture discipline): for each candidate Hamming bar, counts training
media (media_id % 7 != 0) whose 64-bit aHash sits within the bar of ANY
benchmark media, per scale and per modality. Probed in two forms:

  NATURAL : benchmark = the media_id % 7 == 0 slice only (the pl14
            eval-slice convention). Result: VACUOUS at the small
            scales — 0 flagged at sf0.001/sf0.01 for every bar <= 10,
            and raising the bar past 12 floods sf0.1. The synthetic
            corpus simply has no cross-slice perceptual collisions at
            500 docs.
  INJECTED: benchmark additionally contains exact-payload LEAKS — the
            media_id % 31 == 5 training slice re-appears as benchmark
            items (identical payload, the classic contamination case a
            decontamination screen exists to catch; the pl22/m1
            injection precedent). Non-vacuous at every scale and every
            bar >= 0; the registered bar 8 (mid-grid, = m5's
            FrameHamMax) adds the natural near-collisions at sf0.1
            without flooding.
"""
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
  FROM bits GROUP BY 1, 2),
bw AS (SELECT media_id,
         MAX(CASE WHEN band = 0 THEN bv END) AS b0,
         MAX(CASE WHEN band = 1 THEN bv END) AS b1,
         MAX(CASE WHEN band = 2 THEN bv END) AS b2,
         MAX(CASE WHEN band = 3 THEN bv END) AS b3
       FROM bands GROUP BY 1),
tr AS (SELECT * FROM bw WHERE media_id % 7 != 0)
"""

NATURAL = "ev AS (SELECT * FROM bw WHERE media_id % 7 = 0)"
INJECTED = """ev AS (
  SELECT * FROM bw WHERE media_id % 7 = 0
  UNION ALL
  SELECT * FROM bw WHERE media_id % 7 != 0 AND media_id % 31 = 5)"""


def main(sfdir, ev_sql, label):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    n = con.execute(AHASH + f", {ev_sql} " + """
      SELECT (SELECT COUNT(*) FROM tr), (SELECT COUNT(*) FROM ev)"""
                    ).fetchone()
    print(f"{sfdir} [{label}]: n_train={n[0]} n_eval={n[1]}")
    for ham in (0, 2, 4, 6, 8, 10, 12):
        rows = con.execute(AHASH + f""",
          {ev_sql},
          flagged AS (
            SELECT DISTINCT t.media_id
            FROM tr t JOIN ev e
              ON (t.b0 = e.b0 OR t.b1 = e.b1 OR t.b2 = e.b2 OR t.b3 = e.b3)
            WHERE bit_count(xor(t.b0, e.b0)) + bit_count(xor(t.b1, e.b1))
                + bit_count(xor(t.b2, e.b2)) + bit_count(xor(t.b3, e.b3))
              <= {ham})
          SELECT (['image','audio','video'])[CAST(media_id % 3 AS INT) + 1]
                   AS modality, COUNT(*)
          FROM flagged GROUP BY 1 ORDER BY 1""").fetchall()
        total = sum(r[1] for r in rows)
        print(f"  ham={ham}: flagged={total} by_modality={rows}")


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001",
                               "/root/testdata/sf0.01",
                               "/root/testdata/sf0.1"]:
        main(sf, NATURAL, "natural")
        main(sf, INJECTED, "injected")

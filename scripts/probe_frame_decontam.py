#!/usr/bin/env python3
"""Pre-registration probe for m7_frame_decontam (the probe_phash.py /
probe_media_decontam.py discipline): training-side FRAME hashes (the
m5 family — m4 byte-slice frames under the m3 aHash) probed against a
benchmark hash set = the %7-slice IMAGES (whose single frame spans the
whole payload, so frame hash == m3 whole-media hash) plus injected
leaked stills (frame 0 of the %31==5 training slice re-appearing as
benchmark items — the m6 injection convention). Reports flagged
containers / flagged frames per Hamming bar at each scale so the
registered bar is non-vacuous and non-flooding, not a guess."""
import sys
import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from probe_frame_neardup import FRAME_BANDS  # noqa: E402

BENCH = """,
tr AS (SELECT * FROM fw WHERE media_id % 7 != 0),
ev AS (
  SELECT b0, b1, b2, b3 FROM fw
  WHERE media_id % 7 = 0 AND media_id % 3 = 0
  UNION ALL
  SELECT b0, b1, b2, b3 FROM fw
  WHERE media_id % 7 != 0 AND media_id % 31 = 5 AND f = 0)
"""


def main(sfdir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    base = con.execute(FRAME_BANDS + BENCH + """
      SELECT (SELECT COUNT(DISTINCT media_id) FROM tr),
             (SELECT COUNT(*) FROM tr),
             (SELECT COUNT(*) FROM ev)""").fetchone()
    print(f"{sfdir}: train media={base[0]} train frames={base[1]} "
          f"bench hashes={base[2]}")
    for ham in (0, 4, 5, 6, 7, 8, 12):
        r = con.execute(FRAME_BANDS + BENCH + f""",
          fl AS (
            SELECT DISTINCT t.id, t.media_id FROM tr t JOIN ev e
              ON (t.b0 = e.b0 OR t.b1 = e.b1 OR t.b2 = e.b2 OR t.b3 = e.b3)
            WHERE bit_count(xor(t.b0, e.b0)) + bit_count(xor(t.b1, e.b1))
                + bit_count(xor(t.b2, e.b2)) + bit_count(xor(t.b3, e.b3))
              <= {ham}),
          inj AS (SELECT DISTINCT media_id FROM tr WHERE media_id % 31 = 5)
          SELECT (SELECT COUNT(DISTINCT media_id) FROM fl),
                 (SELECT COUNT(*) FROM fl),
                 (SELECT COUNT(*) FROM inj),
                 (SELECT COUNT(*) FROM inj
                  WHERE media_id IN (SELECT media_id FROM fl))""").fetchone()
        print(f"  ham={ham:2d}: flagged_media={r[0]:5d} flagged_frames={r[1]:6d} "
              f"injected={r[2]:4d} injected_caught={r[3]:4d}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        main(d)

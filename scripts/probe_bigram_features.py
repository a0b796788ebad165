#!/usr/bin/env python3
"""pl20 feature-uplift probe (r17 verdict item 6, the PLANS.md:2440
DuckDB-mirror tuning-harness discipline): fastText's word-BIGRAM
buckets — hash(tok_i + ' ' + tok_{i+1}) into D2 extra slots — are the
classic accuracy lever over a unigram bag. The model is engine-identical
by construction, so the mirror IS the tuning harness: this patches the
COMMITTED pl20 oracle SQL (dumped by graft.Verify) to append bigram
buckets and widen the weight table, and reports held-out agreement per
grid cell. Registration bar (the verdict's): >= 2 points of held-out
agreement at TWO scales, else record the negative result and keep
273-dim.

Usage: probe_bigram_features.py <oracle_sql.json> <sfdir> [<sfdir>...]
"""
import json
import sys

import duckdb

UNIGRAM_BUCKETS = """list_concat(
           list_distinct(list_transform(t.toks,
             tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT % 256)),
           [CAST(256 AS BIGINT),
            257 + least(15, len(t.toks) // 16)])"""


def patched(sql, d2):
    """Append D2 bigram buckets (ids 273..273+D2-1) and widen w0."""
    assert UNIGRAM_BUCKETS in sql, "committed oracle drifted from the probe"
    bigram = f"""list_concat({UNIGRAM_BUCKETS},
           list_distinct(list_transform(range(1, greatest(1, len(t.toks))),
             i -> 273 + ('0x' || substr(md5(t.toks[CAST(i AS INT)] || ' '
                  || t.toks[CAST(i AS INT) + 1]), 1, 15))::BIGINT % {d2})))"""
    out = sql.replace(UNIGRAM_BUCKETS, bigram)
    assert "FROM range(273))" in out
    return out.replace("FROM range(273))", f"FROM range({273 + d2}))")


def accuracy(con, sql):
    rows = con.execute(sql).fetchall()
    # columns: lang, n_eval, n_pred_keep, n_agree, accuracy, mean_p
    n = sum(r[1] for r in rows)
    agree = sum(r[3] for r in rows)
    keep = sum(r[2] for r in rows)
    return n, agree / n, keep


def main():
    oracle = json.load(open(sys.argv[1]))["pl20_quality_classifier"]
    for sfdir in sys.argv[2:]:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sfdir}/documents.parquet'")
        n, base, keep = accuracy(con, oracle)
        print(f"{sfdir}: baseline 273-dim held-out agreement "
              f"{base:.4f} (n={n}, pred_keep={keep})")
        for d2 in (128, 256, 512):
            nn, acc, keep2 = accuracy(con, patched(oracle, d2))
            print(f"  +{d2} bigram buckets (dim {273 + d2}): "
                  f"{acc:.4f} ({acc - base:+.4f}, pred_keep={keep2})")


if __name__ == "__main__":
    main()

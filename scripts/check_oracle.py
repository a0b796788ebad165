#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet tables,
and compares: column names (sorted), row counts, and exact values (after
sorting columns by name; rows compared in emitted order AND in sorted order
so we catch both kinds of mismatch).
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Read the Spark side via pyarrow, NOT DuckDB: the driver does,
            # and DuckDB's client path coerces e.g. DECIMAL to float64 on
            # BOTH sides, masking render divergences (bit us in round 4).
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got = pd.concat(
                [pq.read_table(p).to_pandas() for p in parts],
                ignore_index=True)
            want = con.execute(sql).fetchdf()
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
                continue
            got, want = got[gcols], want[wcols]
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            grows = [tuple(canon(v) for v in r) for r in got.itertuples(index=False)]
            wrows = [tuple(canon(v) for v in r) for r in want.itertuples(index=False)]
            if grows == wrows:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            elif sorted(grows) == sorted(wrows):
                print(f"WARN {name}: values match only after row sort")
                n_pass += 1
            else:
                bad = [i for i, (g, w) in enumerate(zip(grows, wrows)) if g != w][:3]
                print(f"FAIL {name}: value mismatch at rows {bad}")
                for i in bad:
                    print(f"  spark : {grows[i]}")
                    print(f"  duckdb: {wrows[i]}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

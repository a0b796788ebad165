#!/usr/bin/env python3
"""Pre-registration DuckDB probe for pl23 (classifier-gated selection).

Two candidate gate compositions were probed at all three fixture
scales before registration:

  AND-form   : quality survivor = Gopher-pass AND not classifier-tail
               (incremental drop = tail docs that pass Gopher)
  REPLACE-form: quality survivor = not classifier-tail — the deployed
               CCNet shape (the trained model IS the gate; the rules
               remain the training teacher only). Drop = the tail
               tertile; `rescued` = Gopher-fails the gate keeps.

The AND-form is VACUOUS on this corpus: the per-language tail tertile
sits entirely inside the Gopher fails at every scale (the classifier
separates its teacher's classes cleanly and the tail third is smaller
than the fail rate), so it drops zero extra documents. The REPLACE
form is structurally non-vacuous (~1/3 per language) and carries a
non-trivial deployment delta (rescued > 0). pl23 registers the
REPLACE form.

Usage: probe_gate_selection.py <verify_out_dir>   (needs oracle_sql.json
with pl23_gated_funnel + pl16_curation_funnel; runs each oracle in
DuckDB at sf0.001/0.01/0.1 and derives both forms' counts).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
oracle = json.load(open(f"{out}/oracle_sql.json"))

for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/{sf}/{t}.parquet'")
    g = con.execute(oracle["pl23_gated_funnel"]).fetchdf()
    r = con.execute(oracle["pl16_curation_funnel"]).fetchdf()
    gate_drop = int((g.n_raw - g.n_quality).sum())   # REPLACE-form drop
    rescued = int(g.n_rescued.sum())
    gopher_fail = int((r.n_raw - r.n_quality).sum())
    # tail ∩ Gopher-pass — the AND-form's incremental drop:
    # tail∩train = gate_drop; tail∩fail = gopher_fail - rescued
    and_drop = gate_drop - (gopher_fail - rescued)
    print(f"{sf}: REPLACE gate_drop={gate_drop} rescued={rescued} "
          f"[{'NON-VACUOUS' if gate_drop > 0 and rescued > 0 else 'VACUOUS'}]"
          f" | gopher_fail={gopher_fail} | AND-form incremental drop="
          f"{and_drop} [{'NON-VACUOUS' if and_drop > 0 else 'VACUOUS'}]")

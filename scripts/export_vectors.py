#!/usr/bin/env python3
"""Offline real-model vector export for the retrieval-quality lane.

The engine's PrecomputedBackend (eval/EmbeddingSla.scala) loads
document and query vectors as parquet DATA — no model runtime in the
engine. This script produces that parquet from any public
sentence-transformers model, so the quality numbers become directly
comparable to BASELINE.md's real-embedder rows (0.739 nomic-embed /
0.689 ONNX MiniLM; bench/RESULTS.md:12-16, docs/benchmarks/index.md:31).

It needs a network-enabled machine with `pip install sentence-transformers
pyarrow` — which this build container does NOT have (zero egress, no
model runtime); that is why the committed fixture is the deterministic
trigram-hash stand-in (MakeVectorFixture, honestly labeled
not-model-parity). Run this offline, commit the output parquet, and the
lane picks it up with zero engine changes.

Usage:
  # 1. in the repo (this container is fine — no network needed):
  sbt "runMain graft.eval.DumpFixtureTexts fixtures/longmem_texts.json"

  # 2. on any machine with network + the libs:
  python3 scripts/export_vectors.py fixtures/longmem_texts.json \
      fixtures/longmem_vectors_minilm.parquet \
      --model sentence-transformers/all-MiniLM-L6-v2

  # 3. point the lane at the new parquet (BenchEmbeddings auto-detects
  #    fixtures/longmem_vectors*.parquet; or pass the path to
  #    EmbeddingSla.PrecomputedBackend / RetrievalQualitySpec).

Output schema (what PrecomputedBackend reads):
  id STRING, doc_vec ARRAY<DOUBLE>, query_vec ARRAY<DOUBLE>
"""
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("texts_json")
    ap.add_argument("out_parquet")
    ap.add_argument("--model",
                    default="sentence-transformers/all-MiniLM-L6-v2")
    args = ap.parse_args()

    # imported here so --help works without the heavy deps installed
    import pyarrow as pa
    import pyarrow.parquet as pq
    from sentence_transformers import SentenceTransformer

    with open(args.texts_json) as f:
        recs = json.load(f)
    model = SentenceTransformer(args.model)
    doc_vecs = model.encode([r["content"] for r in recs],
                            normalize_embeddings=True)
    query_vecs = model.encode([r["query"] for r in recs],
                              normalize_embeddings=True)
    table = pa.table({
        "id": [r["id"] for r in recs],
        "doc_vec": [v.astype("float64").tolist() for v in doc_vecs],
        "query_vec": [v.astype("float64").tolist() for v in query_vecs],
    })
    pq.write_table(table, args.out_parquet)
    print(f"wrote {len(recs)} vector rows ({doc_vecs.shape[1]} dims, "
          f"{args.model}) to {args.out_parquet}")


if __name__ == "__main__":
    main()

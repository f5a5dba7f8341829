#!/usr/bin/env python
"""Deterministic fixture up-scaler: sfX → sf(X·N) by keyed replication.

The driver ships read-only fixtures up to sf0.1; the scale claims in
BASELINE.md (near-linear per-query scaling, the targeted_diff crossover)
need a 10× datapoint.  This tool replicates a source scale factor N times
with disjoint key spaces, preserving every schema bit-for-bit (pyarrow
read→transform→cast-to-original-schema→write, so e.g. nanosecond timestamp
columns stay nanosecond):

- fact/entity tables (customer, supplier, part, orders, lineitem, events,
  documents, embeddings): replica i shifts every key/FK column by
  i·(max_key+1) of its defining table, so FK joins land inside the replica
  and group-size distributions are preserved exactly;
- dimension tables (region, nation) are copied unchanged (TPC-H dims do
  not scale);
- ``documents.text`` for replica i>0 is perturbed by inserting a replica
  marker token every 5 words (and n_chars is recomputed): without this,
  replicas are EXACT text duplicates and every doc gains N−1 artificial
  near-dup partners, distorting minhash/LSH pair counts ~N× beyond the
  real 10× growth; the insertion drops cross-replica Jaccard far below
  the 0.8 near-dup threshold while keeping per-doc statistics realistic;
- ``embeddings.embedding`` for replica i>0 gets seeded Gaussian noise
  (σ=0.05, re-normalized) for the same reason in cosine space.

Replica 0 is the identity, so the source sf is a subset of the output.

Usage:  python tools/gen_sf.py [--src /root/testdata/sf0.1] \
            [--out /root/repo/.localdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ["region", "nation"]
#: table → (key columns to shift, each "table.column" naming the key space)
SHIFTS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"},
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}


def _key_spans(src: str) -> dict[str, int]:
    spans = {}
    for table, cols in SHIFTS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        for col, space in cols.items():
            if space.split(".")[0] == table:
                spans[space] = int(pc.max(t[col]).as_py()) + 1
    return spans


def _perturb_text(texts: list, replica: int) -> list:
    out = []
    for j, txt in enumerate(texts):
        if txt is None:
            out.append(None)
            continue
        words = txt.split(" ")
        marker = f"r{replica}x{j % 97}"
        rebuilt = []
        for w_i, w in enumerate(words):
            rebuilt.append(w)
            if w_i % 5 == 4:
                rebuilt.append(marker)
        out.append(" ".join(rebuilt))
    return out


def _perturb_embeddings(col: pa.ChunkedArray, replica: int) -> pa.Array:
    mats = col.combine_chunks()
    flat = np.array(mats.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    offsets = mats.offsets.to_numpy(zero_copy_only=False)
    rng = np.random.RandomState(10_000 + replica)
    noisy = flat + rng.normal(0.0, 0.05, size=flat.shape)
    # renormalize per vector so cosine geometry stays on the unit sphere
    out = np.empty_like(noisy)
    for i in range(len(offsets) - 1):
        lo, hi = offsets[i], offsets[i + 1]
        v = noisy[lo:hi]
        n = np.linalg.norm(v)
        out[lo:hi] = v / n if n > 0 else v
    return pa.ListArray.from_arrays(mats.offsets, pa.array(out, type=pa.float32()))


def scale_table(src: str, out_dir: str, table: str, factor: int, spans: dict[str, int]) -> int:
    path = os.path.join(src, f"{table}.parquet")
    t = pq.read_table(path)
    schema = t.schema
    if table in DIMS:
        pq.write_table(t, os.path.join(out_dir, f"{table}.parquet"))
        return t.num_rows
    replicas = []
    for i in range(factor):
        cols = {}
        for name in t.column_names:
            col = t[name]
            if i > 0 and name in SHIFTS[table]:
                shift = i * spans[SHIFTS[table][name]]
                col = pc.add(col, pa.scalar(shift, type=schema.field(name).type))
            elif i > 0 and table == "documents" and name == "text":
                col = pa.chunked_array([pa.array(_perturb_text(t[name].to_pylist(), i))])
            elif i > 0 and table == "embeddings" and name == "embedding":
                col = pa.chunked_array([_perturb_embeddings(t[name], i)])
            cols[name] = col
        rep = pa.table(cols)
        if i > 0 and table == "documents":
            rep = rep.set_column(
                rep.column_names.index("n_chars"),
                "n_chars",
                pc.cast(pc.utf8_length(rep["text"]), schema.field("n_chars").type),
            )
        replicas.append(rep.cast(schema))
    merged = pa.concat_tables(replicas)
    pq.write_table(merged, os.path.join(out_dir, f"{table}.parquet"))
    return merged.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.localdata/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spans = _key_spans(args.src)
    for table in DIMS + list(SHIFTS):
        n = scale_table(args.src, args.out, table, args.factor, spans)
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()

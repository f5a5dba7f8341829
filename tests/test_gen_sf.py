"""Fixture up-scaler (tools/gen_sf.py): schema preservation, key
disjointness, FK consistency, and the near-dup-clique countermeasures the
sf1 scale validation depends on (BASELINE.md §"sf1 scale validation")."""

import math
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from gen_sf import DIMS, SHIFTS, _key_spans, scale_table  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf2x"))
    spans = _key_spans(SRC)
    rows = {}
    for table in DIMS + list(SHIFTS):
        rows[table] = scale_table(SRC, out, table, 2, spans)
    return out, rows


def test_row_counts_and_schemas(scaled):
    out, rows = scaled
    for table in DIMS + list(SHIFTS):
        src_t = pq.read_table(f"{SRC}/{table}.parquet")
        out_t = pq.read_table(f"{out}/{table}.parquet")
        assert out_t.schema.equals(src_t.schema), table
        want = src_t.num_rows * (1 if table in DIMS else 2)
        assert out_t.num_rows == want == rows[table], table


def test_replica_key_spaces_disjoint_and_identity_preserved(scaled):
    out, _ = scaled
    src_o = pq.read_table(f"{SRC}/orders.parquet", columns=["o_orderkey"])
    out_o = pq.read_table(f"{out}/orders.parquet", columns=["o_orderkey"])
    src_keys = set(src_o["o_orderkey"].to_pylist())
    out_keys = out_o["o_orderkey"].to_pylist()
    assert len(out_keys) == len(set(out_keys))  # no key collisions
    assert src_keys <= set(out_keys)  # replica 0 is the identity
    shift = max(src_keys) + 1
    assert {k - shift for k in set(out_keys) - src_keys} == src_keys


def test_fk_joins_land_inside_the_replica(scaled):
    import duckdb

    out, _ = scaled
    # every lineitem row must still join an order; per-order group sizes
    # must be preserved exactly (distribution fidelity)
    orphans, = duckdb.sql(
        f"SELECT count(*) FROM '{out}/lineitem.parquet' l "
        f"WHERE NOT EXISTS (SELECT 1 FROM '{out}/orders.parquet' o "
        f"WHERE o.o_orderkey = l.l_orderkey)"
    ).fetchone()
    assert orphans == 0
    src_hist = duckdb.sql(
        f"SELECT n, count(*) FROM (SELECT count(*) AS n FROM "
        f"'{SRC}/lineitem.parquet' GROUP BY l_orderkey) GROUP BY n ORDER BY n"
    ).fetchall()
    out_hist = duckdb.sql(
        f"SELECT n, count(*) FROM (SELECT count(*) AS n FROM "
        f"'{out}/lineitem.parquet' GROUP BY l_orderkey) GROUP BY n ORDER BY n"
    ).fetchall()
    assert out_hist == [(n, c * 2) for n, c in src_hist]


def test_document_replicas_are_not_near_dups(scaled):
    out, _ = scaled
    src_d = pq.read_table(f"{SRC}/documents.parquet", columns=["doc_id", "text"])
    out_d = pq.read_table(f"{out}/documents.parquet", columns=["doc_id", "text"])
    base = dict(zip(src_d["doc_id"].to_pylist(), src_d["text"].to_pylist()))
    rep = dict(zip(out_d["doc_id"].to_pylist(), out_d["text"].to_pylist()))
    shift = max(base) + 1
    checked = 0
    for did, txt in list(base.items())[:50]:
        other = rep[did + shift]
        if txt is None or len(txt.split()) < 15:
            continue
        w0, w1 = txt.split(), other.split()
        s0 = set(zip(w0, w0[1:], w0[2:]))
        s1 = set(zip(w1, w1[1:], w1[2:]))
        j = len(s0 & s1) / len(s0 | s1)
        assert j < 0.8, f"doc {did}: cross-replica jaccard {j:.2f} would LSH-pair"
        checked += 1
    assert checked > 10
    # and n_chars stays consistent with the perturbed text
    nc = pq.read_table(f"{out}/documents.parquet", columns=["doc_id", "text", "n_chars"])
    for did, txt, n in zip(*(nc[c].to_pylist() for c in ("doc_id", "text", "n_chars"))):
        if did >= shift and txt is not None:
            assert n == len(txt)
            break


def test_embedding_replicas_stay_unit_norm_and_distinct(scaled):
    out, _ = scaled
    src_e = pq.read_table(f"{SRC}/embeddings.parquet", columns=["vec_id", "embedding"])
    out_e = pq.read_table(f"{out}/embeddings.parquet", columns=["vec_id", "embedding"])
    base = dict(zip(src_e["vec_id"].to_pylist(), src_e["embedding"].to_pylist()))
    rep = dict(zip(out_e["vec_id"].to_pylist(), out_e["embedding"].to_pylist()))
    shift = max(base) + 1
    v0, v1 = base[0], rep[shift]
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-3  # renormalized
    cos = sum(a * b for a, b in zip(v0, v1))
    assert cos < 0.999  # perturbed, not an exact duplicate

"""Generate a measurement-scale replica of the testdata documents/embeddings
tables (round 6 optimization work).

The driver's round-end bench may run at a larger scale factor than the
local /root/testdata/sf0.1 (BENCH_r05 ran sf=1.0: ~50k documents, ~20k
embeddings). The heavy dedup/ANN queries scale superlinearly (banded
self-joins), so optimizations must be measured at that size, not only at
sf0.1. This script writes a distribution-matched replica (NOT the driver's
data — seeds differ; used only for relative before/after timing, never for
correctness or recorded bench numbers):

- documents: 30-word uniform vocab, 10-100 tokens, '.'-free word salad,
  lang mix ~41% en / rest es/fr/zh/de, ~5%% of docs are near-dup copies of
  an earlier doc with ' dup' appended, a handful of exact dups.
- embeddings: uniform random unit vectors, 64-dim float32, labels 0-9.

Usage: python scripts/gen_bigdata.py <out_dir> <n_docs> <n_vecs>
"""
from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast row the "
    "agg key query a scan batch"
).split()
LANGS = ["en"] * 41 + ["es"] * 15 + ["fr"] * 15 + ["zh"] * 15 + ["de"] * 14


def gen_documents(out: str, n: int, seed: int = 7) -> None:
    rng = random.Random(seed)
    texts: list[str] = []
    doc_ids = list(range(n))
    langs = []
    sources = []
    for i in range(n):
        if i > 100 and rng.random() < 0.05:
            # near-dup of a random earlier doc
            j = rng.randrange(max(1, i - 2000), i)
            texts.append(texts[j] + " dup")
            langs.append(langs[j])
        elif i > 100 and rng.random() < 0.0017:
            j = rng.randrange(max(1, i - 2000), i)
            texts.append(texts[j])
            langs.append(langs[j])
        else:
            k = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(k)))
            langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, n: int, seed: int = 11, dim: int = 64) -> None:
    g = np.random.default_rng(seed)
    v = g.standard_normal((n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) * 7919) % 10, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def replicate_tpc(out: str, src: str = "/root/testdata/sf0.1",
                  factor: int = 10) -> None:
    """Scale-replicate the TPC-ish/events tables by concatenating
    ``factor`` key-shifted copies of the sf0.1 originals (distributions
    preserved, join keys kept consistent across tables). Measurement-only."""
    import pyarrow.compute as pc

    key_cols = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
    }
    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       os.path.join(out, f"{t}.parquet"))
    for t, keys in key_cols.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        offs = {k: pc.max(base.column(k)).as_py() + 1 for k in keys}
        copies = [base]
        for i in range(1, factor):
            tbl = base
            for k in keys:
                idx = tbl.schema.get_field_index(k)
                shifted = pc.add(tbl.column(k), offs[k] * i)
                tbl = tbl.set_column(idx, k, shifted.cast(tbl.schema.field(k).type))
            copies.append(tbl)
        pq.write_table(pa.concat_tables(copies), os.path.join(out, f"{t}.parquet"))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/bigdata/sf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    os.makedirs(out, exist_ok=True)
    gen_documents(out, n_docs)
    gen_embeddings(out, n_vecs)
    replicate_tpc(out)
    print(f"wrote {out}: documents={n_docs}, embeddings={n_vecs}, tpc x10")

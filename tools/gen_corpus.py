"""Deterministic synthetic corpus generator for the scaling study.

/root/testdata is read-only and stops at sf0.1, so the scaling
exponents beyond it (SCALE.md) need corpora we can grow ourselves.
This reproduces the driver testdata's *statistical shape* — measured
off /root/testdata/sf0.01 with DuckDB (see SCALE.md):

- documents: doc_id 0..n-1; text = 10-99 words drawn uniformly from
  the same 30-word query-engine vocabulary (plus the rare 'dup'
  marker); lang weighted ~{en .40, de/es/fr/zh .15}; source src0-19;
  n_chars = len(text).  ~5% of docs are planted near-copies of an
  earlier doc (a few words edited, the regime the Jaccard/MinHash
  family detects at threshold 0.5).
- embeddings: vec_id 0..n-1; 64-dim unit vectors (normal/normalized —
  the real table's within-label cosine is ~0.002, i.e. labels carry
  no geometric signal); label uniform 0-9.

Counts follow the driver's ratio: n = round(50_000 * sf) rows in each
table.  Everything is seeded — same (sf, seed) => identical parquet.

Usage: python tools/gen_corpus.py <sf> <out_dir> [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column",
    "filter", "small", "slow", "merge", "order", "vector", "line",
    "data", "table", "agg", "value", "key", "stream", "window",
    "spark", "a", "group", "part", "big", "sort", "query", "fast",
    "the",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
DIM = 64
N_LABELS = 10
ROWS_PER_SF = 50_000
NEAR_DUP_FRAC = 0.05


def gen_documents(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    sources = rng.integers(0, 20, size=n)
    for i in range(n):
        if i > 0 and rng.random() < NEAR_DUP_FRAC:
            # near-copy of a random earlier doc: swap a few words,
            # sometimes append the 'dup' marker
            src = texts[int(rng.integers(0, i))].split(" ")
            w = list(src)
            for _ in range(int(rng.integers(1, 3))):
                w[int(rng.integers(0, len(w)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            if rng.random() < 0.25:
                w.append("dup")
            texts.append(" ".join(w))
        else:
            ln = int(rng.integers(10, 100))
            idx = rng.integers(0, len(VOCAB), size=ln)
            texts.append(" ".join(VOCAB[j] for j in idx))
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([LANGS[i] for i in langs], type=pa.string()),
            "source": pa.array(
                [f"src{i}" for i in sources], type=pa.string()
            ),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )


def gen_embeddings(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    mat = rng.standard_normal((n, DIM))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    # plant ~5% vector near-dups (a copy of an earlier vector + small
    # noise, same label): the detectable population the semantic
    # near-dup family clusters, mirroring the text-side planting
    for i in range(1, n):
        if rng.random() < NEAR_DUP_FRAC:
            j = int(rng.integers(0, i))
            v = mat[j] + 0.05 * rng.standard_normal(DIM)
            mat[i] = v / np.linalg.norm(v)
            labels[i] = labels[j]
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat],
                type=pa.list_(pa.float64()),
            ),
            "label": pa.array(labels, type=pa.int64()),
        }
    )


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    n = round(ROWS_PER_SF * sf)
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        gen_documents(n, seed), os.path.join(out, "documents.parquet")
    )
    pq.write_table(
        gen_embeddings(n, seed), os.path.join(out, "embeddings.parquet")
    )
    print(f"wrote {out}: {n} documents + {n} embeddings (sf={sf})")


if __name__ == "__main__":
    main()

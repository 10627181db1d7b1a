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


def gen_embeddings_clustered(
    n: int, seed: int = 42, n_blobs: int = 64, sigma: float = 0.15
) -> pa.Table:
    """Planted-Gaussian-blob embeddings (r12): the CLUSTERED corpus
    the centroid shard router needs for its at-scale recall evidence —
    the near-uniform default corpus cannot exercise semantic sharding
    by construction (per-cell centroids all ≈ the global mean, so any
    pruning is a uniform P/S recall floor).  Blob centers are random
    unit vectors (near-orthogonal at dim 64); points are
    center + sigma * noise, re-normalized — within-blob cosine ~0.5,
    cross-blob ~0.0, so a query's true neighbors concentrate in its
    own blob exactly as real embedding corpora cluster.  ``label`` =
    blob id (ground-truth structure for diagnostics)."""
    rng = np.random.default_rng(seed + 2)
    cents = rng.standard_normal((n_blobs, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    blob = rng.integers(0, n_blobs, size=n)
    mat = cents[blob] + sigma * rng.standard_normal((n, DIM))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat],
                type=pa.list_(pa.float64()),
            ),
            "label": pa.array(blob, type=pa.int64()),
        }
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf = float(args[0])
    out = args[1]
    seed = int(args[2]) if len(args) > 2 else 42
    clustered = any(f.startswith("--clustered") for f in flags)
    n_blobs = next(
        (int(f.split("=", 1)[1]) for f in flags
         if f.startswith("--blobs=")), 64,
    )
    n = round(ROWS_PER_SF * sf)
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        gen_documents(n, seed), os.path.join(out, "documents.parquet")
    )
    emb = (
        gen_embeddings_clustered(n, seed, n_blobs=n_blobs)
        if clustered
        else gen_embeddings(n, seed)
    )
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    kind = f"clustered({n_blobs} blobs)" if clustered else "uniform"
    print(f"wrote {out}: {n} documents + {n} {kind} embeddings (sf={sf})")


if __name__ == "__main__":
    main()

"""Deterministic, network-free embedding functions for tests and defaults.

The reference's tests stub the embedding function with a constant
normalized vector (reference collection_test.go:17-20). We keep that
constant stub plus a hash-seeded deterministic embedding that gives
distinct texts distinct vectors — useful for ranking tests without any
model or network.
"""

from __future__ import annotations

import hashlib
import math


# normalize([-0.1, 0.1, 0.2]) — the constant used by ~15 reference tests
# (collection_test.go:17-20, db_test.go:79-82, persistence_test.go:24-27).
CONST_STUB_VECTOR = [-0.40824828, 0.40824828, 0.81649655]


def const_embedding(text: str) -> list[float]:
    return list(CONST_STUB_VECTOR)


def hash_embedding(text: str, dim: int = 64) -> list[float]:
    """Deterministic pseudo-embedding: sha256-seeded values, L2-normalized.

    Stable across processes/executors (no PYTHONHASHSEED dependence).
    """
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(f"{text}\x00{counter}".encode()).digest()
        for i in range(0, len(h) - 3, 4):
            if len(out) >= dim:
                break
            n = int.from_bytes(h[i : i + 4], "big")
            out.append((n / 2**31) - 1.0)  # [-1, 1)
        counter += 1
    nrm = math.sqrt(sum(x * x for x in out))
    return [x / nrm for x in out]


def make_hash_embedding_func(dim: int = 64):
    def func(text: str) -> list[float]:
        return hash_embedding(text, dim)

    return func

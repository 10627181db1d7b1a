"""HNSW graph index (operators/hnsw.py — reference roadmap
README.md:176).  The load-bearing claims: layer-0 connectivity by
construction, exactness at ef >= n (the oracle identity), build
determinism, and the served-tier dispatch through the router.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators import knn as K
from chromem_go_spark.operators.hnsw import HNSWIndex


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    # unpersist on teardown: a lingering cached plan for this parquet
    # path would substitute an InMemoryRelation into OTHER modules'
    # reads of the same file and break their scan-pushdown plan gates
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def idx(emb):
    return HNSWIndex.build(emb, M=8, ef_construction=64)


def _qv(emb, vid):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == vid).head()["embedding"]
    ]


def _flat(emb, qv, k=10):
    return [
        (r["vec_id"], round(r["similarity"], 6))
        for r in K.knn_single(
            emb, qv, k, vec_col="embedding", id_col="vec_id"
        ).collect()
    ]


def test_layer0_connected(idx):
    assert idx.check_connected()


@pytest.mark.parametrize("vid", [0, 3, 7, 11])
def test_exact_at_ef_n(emb, idx, vid):
    """ef >= n visits the whole (connected) layer 0 — identical to
    brute force, including order."""
    qv = _qv(emb, vid)
    got = [(i, round(s, 6)) for i, s in idx.search(qv, 10, ef=idx.n_points())]
    assert got == _flat(emb, qv)


def test_moderate_ef_recall(emb, idx):
    """The approximate walk at ef=64 keeps high recall@10 on this
    corpus (graph quality sanity floor, not a tuned benchmark)."""
    hits = total = 0
    for vid in range(8):
        qv = _qv(emb, vid)
        exact = {i for i, _ in _flat(emb, qv)}
        got = {i for i, _ in idx.search(qv, 10, ef=64)}
        hits += len(exact & got)
        total += len(exact)
    assert hits / total >= 0.9


def test_build_deterministic(emb):
    a = HNSWIndex.build(emb, M=8, ef_construction=64)
    b = HNSWIndex.build(emb, M=8, ef_construction=64)
    assert a.entry == b.entry
    assert a.layers == b.layers


def test_max_points_refuses(emb):
    with pytest.raises(ValueError, match="bounded serving tier"):
        HNSWIndex.build(emb, max_points=10)


def test_search_batch_shape(spark, emb, idx):
    out = idx.search_batch(spark, ["a", "b"], [_qv(emb, 0), _qv(emb, 1)], 5)
    rows = out.collect()
    assert len(rows) == 10
    assert out.columns == ["query_id", "vec_id", "similarity"]
    assert {r["query_id"] for r in rows} == {"a", "b"}


def test_router_serves_hnsw(emb, idx):
    from chromem_go_spark.operators import router as R

    assert R.tier_of(idx) == "hnsw"
    got = [
        (r["vec_id"], round(r["similarity"], 6))
        for r in R.routed_search(
            emb, _qv(emb, 0), 10, index=idx, target_recall=0.999
        )
        .orderBy(F.desc("similarity"), "vec_id")
        .collect()
    ]
    assert got == [(i, round(s, 6)) for i, s in _flat(emb, _qv(emb, 0))]


def test_single_point_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    one = HNSWIndex.build(df, M=4)
    assert one.search([1.0, 0.0], 3) == [(1, 1.0)]
    assert one.check_connected()

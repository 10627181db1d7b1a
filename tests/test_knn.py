import numpy as np
import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators import knn
from chromem_go_spark.functions import vector as V


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def brute_topk(ids, mat, qv, k):
    qv = np.asarray(qv, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    sims = mat @ qv
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


def test_knn_single_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    qv = mat[0]
    expect = brute_topk(ids, mat, qv, 10)
    got = knn.knn_single(emb, list(qv), 10, vec_col="embedding", id_col="vec_id").select(
        "vec_id", "similarity"
    ).collect()
    assert [(r["vec_id"], pytest.approx(r["similarity"], abs=1e-9)) for r in got] == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in expect
    ]
    assert got[0]["vec_id"] == 0  # self-similarity tops


def test_knn_expr_and_block_agree(spark, emb, emb_np):
    ids, mat = emb_np
    qids = [str(i) for i in range(4)]
    qvecs = mat[:4]
    queries = spark.createDataFrame(
        [(qids[j], [float(x) for x in qvecs[j]]) for j in range(4)],
        "query_id string, query_vec array<double>",
    )
    a = knn.knn_expr(emb, queries, 5, vec_col="embedding", id_col="vec_id")
    b = knn.knn_block(emb, qids, qvecs, 5, vec_col="embedding", id_col="vec_id")
    ra = sorted((r["query_id"], r["vec_id"]) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"]) for r in b.collect())
    assert ra == rb
    for qid in qids:
        expect = sorted(i for i, _ in brute_topk(ids, mat, mat[int(qid)], 5))
        got = [i for q, i in rb if q == qid]
        assert got == expect


def test_knn_validation_errors(emb):
    with pytest.raises(ValueError, match="queryEmbedding is empty"):
        knn.knn_single(emb, [], 5)
    with pytest.raises(ValueError, match="nResults must be > 0"):
        knn.knn_single(emb, [1.0, 2.0], 0)


def test_negative_subtract_ranking():
    q = [1.0, 0.0]
    neg = [0.0, 1.0]
    out = knn.negative_subtract_query(q, neg)
    assert out == pytest.approx([0.70710678, -0.70710678], abs=1e-6)


def test_negative_filter(emb, emb_np):
    ids, mat = emb_np
    qv, neg = mat[0], mat[1]
    got = knn.knn_negative_filter(
        emb, list(qv), list(neg), 10, vec_col="embedding", id_col="vec_id"
    ).collect()
    # every surviving doc has sim(neg) <= 0.5
    neg_sims = mat @ (neg / np.linalg.norm(neg))
    keep = {int(i) for i, s in zip(ids, neg_sims) if s <= 0.5}
    assert all(r["vec_id"] in keep for r in got)
    assert len(got) == 10

"""IVF index tests: exactness at full probe, recall under partial probe,
save/load round-trip with partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators import ann as A
from chromem_go_spark.operators import knn as K


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def index(emb):
    return A.IVFIndex.build(emb, n_clusters=8, vec_col="embedding", id_col="vec_id")


def _qvec(emb, vid):
    return [float(x) for x in emb.filter(F.col("vec_id") == vid).head()["embedding"]]


def test_full_probe_is_exact(emb, index):
    q = _qvec(emb, 3)
    exact = [r["vec_id"] for r in K.knn_single(emb, q, 10, vec_col="embedding", id_col="vec_id").collect()]
    ivf = [r["vec_id"] for r in index.search(q, 10, nprobe=8).collect()]
    assert ivf == exact


def test_partial_probe_recall(emb, index):
    """Partial probing: recall@10 must rise monotonically with nprobe and
    clear a floor at nprobe=4/8. (The synthetic vectors are near-uniform
    on the sphere — IVF's worst case — so the floor is deliberately
    modest; clustered real embeddings probe far better.)"""

    def recall(nprobe: int) -> float:
        hits = total = 0
        for vid in range(10):
            q = _qvec(emb, vid)
            exact = {r["vec_id"] for r in K.knn_single(emb, q, 10, vec_col="embedding", id_col="vec_id").collect()}
            approx = {r["vec_id"] for r in index.search(q, 10, nprobe=nprobe).collect()}
            hits += len(exact & approx)
            total += len(exact)
        return hits / total

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 >= 0.6, f"recall@10 with nprobe=4/8 too low: {r4:.2f}"


def test_save_load_partition_pruning(spark, emb, index, tmp_path):
    path = str(tmp_path / "ivf")
    index.save(path)
    loaded = A.IVFIndex.load(spark, path, vec_col="embedding", id_col="vec_id")
    q = _qvec(emb, 5)
    orig = [(r["vec_id"], round(r["similarity"], 5)) for r in index.search(q, 5, nprobe=8).collect()]
    got = [(r["vec_id"], round(r["similarity"], 5)) for r in loaded.search(q, 5, nprobe=8).collect()]
    assert got == orig
    # probing must prune partitions at the scan: the cluster_id filter
    # appears as a partition filter, not a post-scan filter
    from chromem_go_spark.plans.explain import formatted_plan

    plan = formatted_plan(loaded.search(q, 5, nprobe=2))
    assert "PartitionFilters" in plan and "cluster_id" in plan.split("PartitionFilters", 1)[1][:200]

"""Approximate nearest-neighbor search: IVF (inverted-file) index.

The reference is FLAT-only (exhaustive scan; HNSW/IVFFlat are roadmap
items, reference README.md:176-178). At 100 TB, brute force over every
query is the bottleneck, so this adds the classic IVF design mapped onto
Spark's storage model:

- **build**: k-means centroids (deterministic seed) fitted on a bounded
  driver-side sample, then every vector assigned to its nearest centroid
  JVM-side. The index is the same table **written partitioned by
  ``cluster_id``** — so probing clusters at query time is *partition
  pruning at the Parquet scan*, not a filter over all data.
- **search**: rank centroids against the query on the driver (tiny), pick
  ``nprobe``, scan only those partitions, brute-force within.

With ``nprobe == n_clusters`` the search is exact (identical results to
FLAT), which is how the DuckDB oracle validates it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from . import knn as knn_ops


def _kmeans(sample: np.ndarray, n_clusters: int, seed: int = 42, n_iter: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors (spherical-ish:
    centroids re-normalized each step so assignment is by cosine)."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    idx = rng.choice(n, size=min(n_clusters, n), replace=False)
    cents = sample[idx].copy()
    for _ in range(n_iter):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(cents.shape[0]):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cents[c] = m / nrm
    return cents


def _assign_clusters(df: DataFrame, cents: np.ndarray, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment as one GEMM-argmax per Arrow batch
    (``mapInPandas``). Rendering the centroid matrix as Catalyst literal
    arrays (n_clusters x dim literal nodes) generates code that blows out
    the JVM code cache and degrades the whole session; the kernel keeps
    the plan a single node and the math one ``mat @ cents.T``."""
    import pandas as pd

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, cluster_id int"
    cmat = cents.T.copy()  # (dim, n_clusters)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["cluster_id"] = np.argmax(mat @ cmat, axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, out_schema)


class IVFIndex:
    def __init__(self, centroids: np.ndarray, assigned: DataFrame, vec_col: str, id_col: str):
        self.centroids = centroids
        self.assigned = assigned  # has cluster_id column
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_clusters: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
        sample_size: int = 50_000,
    ) -> "IVFIndex":
        # Deterministic hash-sample spread across ALL partitions: a bare
        # limit() would take rows from the first partitions only, biasing
        # the k-means sample at scale (clustered storage => clustered
        # sample). xxhash64(id) % 997 < p keeps ~sample_size rows
        # uniformly wherever they live.
        n_rows = df.count()
        if n_rows > sample_size:
            p = max(1, int(997 * sample_size / n_rows))
            cand = df.filter(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(997)) < p)
        else:
            cand = df
        sample_rows = cand.select(vec_col).limit(sample_size).collect()
        sample = np.asarray([r[0] for r in sample_rows], dtype=np.float64)
        norms = np.linalg.norm(sample, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = _kmeans(sample / norms, n_clusters, seed)
        assigned = _assign_clusters(df, cents, vec_col)
        return cls(cents, assigned, vec_col, id_col)

    def save(self, path: str) -> None:
        """Persist partitioned by cluster_id: probing == partition pruning."""
        self.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
        import json, os

        with open(os.path.join(path, "_centroids.json"), "w") as f:
            json.dump(self.centroids.tolist(), f)

    @classmethod
    def load(cls, spark: SparkSession, path: str, vec_col: str = "embedding", id_col: str = "vec_id") -> "IVFIndex":
        import json, os

        with open(os.path.join(path, "_centroids.json")) as f:
            cents = np.asarray(json.load(f), dtype=np.float64)
        return cls(cents, spark.read.parquet(path), vec_col, id_col)

    def probe_clusters(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm
        sims = self.centroids @ q
        return [int(c) for c in np.argsort(-sims)[: int(nprobe)]]

    def search(self, query_vec: Sequence[float], k: int, nprobe: int = 4) -> DataFrame:
        """Filter to probed clusters (partition-prunable) then exact top-k
        within them."""
        probes = self.probe_clusters(query_vec, nprobe)
        cand = self.assigned.filter(F.col("cluster_id").isin(probes))
        return knn_ops.knn_single(
            cand, list(query_vec), k, vec_col=self.vec_col, id_col=self.id_col
        ).drop("cluster_id")

    def search_batch(
        self,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        nprobe: int = 4,
    ) -> DataFrame:
        """Batch IVF search: every query is routed to its ``nprobe``
        nearest clusters on the driver (centroids are MB-scale), the
        (query, cluster) probe table is broadcast-joined against the
        cluster-partitioned corpus, and scoring+top-k runs per query.

        The corpus is scanned ONCE for all queries; only rows whose
        cluster is probed by at least one query are touched (semi-join
        pruning), and each (doc, query) pair scored is restricted to
        probed clusters — versus the full docs x queries cross product
        of brute force."""
        import pandas as pd

        spark = self.assigned.sparkSession
        rows = []
        for qid, qv in zip(query_ids, query_vecs):
            q = np.asarray(qv, dtype=np.float64)
            nrm = np.linalg.norm(q)
            if nrm > 0:
                q = q / nrm
            for c in self.probe_clusters(q, nprobe):
                rows.append((str(qid), int(c), [float(x) for x in q]))
        probe_df = spark.createDataFrame(
            rows, "query_id string, cluster_id int, query_vec array<double>"
        )
        from ..functions import vector as V

        scored = (
            self.assigned.join(F.broadcast(probe_df), "cluster_id")
            .withColumn(
                "similarity",
                V.dot(F.col(self.vec_col).cast("array<double>"), F.col("query_vec")),
            )
            .select("query_id", self.id_col, "similarity")
        )
        return knn_ops.topk_per_query(scored, k, "query_id", self.id_col)

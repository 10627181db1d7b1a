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

from ..batchstate import drop_batch_partition, fold_batch_partitions, read_live
from ..functions import vector as V
from . import knn as knn_ops


# Max rows fed to each PQ subquantizer's k-means fit (r15): 100x the
# default 256-code budget.  Every tested SF samples far fewer rows, so
# results there are bit-identical; at scale the codebook fit stops
# growing with sample_size.
_PQ_FIT_CAP = 25_600


class EmptyCorpusError(ValueError):
    """Raised when a quantizer trainer is asked to fit an EMPTY corpus
    frame.  A dedicated type (r11, ADVICE) so the router's demote-to-FLAT
    path catches exactly this condition instead of substring-matching the
    message — a zero-row hash sample over a NON-empty frame (degenerate id
    distribution) must NOT masquerade as an empty corpus.  Subclasses
    ``ValueError`` so existing callers (and the golden-error tests) keep
    their contract."""


def _kmeanspp_init(sample: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii, SODA'07 — public
    method): each next center is drawn proportional to squared distance
    from the chosen set. Balanced initial centers -> balanced IVF cells,
    which matters because probe cost follows the largest cells."""
    n = sample.shape[0]
    k = min(k, n)
    centers = [sample[rng.integers(n)]]
    d2 = ((sample - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centers.append(sample[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((sample - centers[-1]) ** 2).sum(axis=1))
    return np.stack(centers)


def _hash_sample(
    df: DataFrame, vec_col: str, id_col: str, sample_size: int
) -> np.ndarray:
    """Deterministic driver-side sample spread across ALL partitions: a
    bare limit() would take rows from the first partitions only, biasing
    trainers on clustered storage. xxhash64(id) % 997 < p keeps
    ~sample_size rows uniformly wherever they live. ONE count + ONE
    collect — shared by the coarse quantizer and the PQ codebooks."""
    n_rows = df.count()
    if n_rows == 0:
        # training a quantizer on nothing is meaningless, and numpy's
        # downstream failure (AxisError in the k-means GEMM) hides the
        # actual problem — fail with the cause, as a TYPE the router can
        # catch (r11: substring-matching this message was brittle)
        raise EmptyCorpusError(
            "cannot train a quantizer over an empty corpus frame"
        )
    cand = df
    if n_rows > sample_size:
        p = max(1, int(997 * sample_size / n_rows))
        cand = df.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(997)) < p
        )
    rows = cand.select(vec_col).limit(sample_size).collect()
    if not rows:
        # degenerate id distribution: the modular hash filter selected
        # nothing on a NON-empty frame.  This is a sampling anomaly, not
        # an empty corpus — fall back to the unfiltered (first-partitions)
        # sample rather than mis-signal emptiness (r11, ADVICE)
        rows = df.select(vec_col).limit(sample_size).collect()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _kmeans(sample: np.ndarray, n_clusters: int, seed: int = 42, n_iter: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors (spherical-ish:
    centroids re-normalized each step so assignment is by cosine);
    k-means++ seeded."""
    rng = np.random.default_rng(seed)
    cents = _kmeanspp_init(sample, n_clusters, rng)
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


def _assign_clusters(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str,
    ids: np.ndarray | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as one GEMM-argmax per Arrow batch
    (``mapInPandas``). Rendering the centroid matrix as Catalyst literal
    arrays (n_clusters x dim literal nodes) generates code that blows out
    the JVM code cache and degrades the whole session; the kernel keeps
    the plan a single node and the math one ``mat @ cents.T``.

    ``ids`` (r12) optionally maps the argmax INDEX to an arbitrary id
    per row (``cluster_id = ids[argmax]``) — the sharded sink's
    sparse active-cell routing, done here in NumPy for the same
    reason: an ``element_at(array(<lits>), ...)`` mapping would
    re-grow a Catalyst literal with the active-cell count as splits
    accumulate."""
    import pandas as pd

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, cluster_id int"
    cmat = cents.T.copy()  # (dim, n_clusters)
    idmap = None if ids is None else np.asarray(ids, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            arg = np.argmax(mat @ cmat, axis=1)
            pdf["cluster_id"] = (
                idmap[arg] if idmap is not None else arg.astype(np.int32)
            )
            yield pdf

    return df.mapInPandas(gen, out_schema)


def _kmeans_l2(sample: np.ndarray, k: int, seed: int = 42, n_iter: int = 15) -> np.ndarray:
    """Deterministic Lloyd's k-means under Euclidean distance — the PQ
    codebook trainer (subspace quantizers minimize L2 error)."""
    rng = np.random.default_rng(seed)
    cents = _kmeanspp_init(sample, k, rng).copy()
    for _ in range(n_iter):
        d2 = (
            (sample**2).sum(axis=1, keepdims=True)
            - 2.0 * sample @ cents.T
            + (cents**2).sum(axis=1)
        )
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _pq_encode(
    assigned: DataFrame, codebooks: np.ndarray, vec_col: str, id_col: str
) -> DataFrame:
    """Encode cluster-assigned vectors to m uint8 PQ codes per row —
    one argmin per subspace per Arrow batch (shared by index build and
    incremental append, which must quantize identically)."""
    mm, _, s = codebooks.shape
    cb = codebooks

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = mat.shape[0]
            codes = np.empty((n, mm), dtype=np.uint8)
            for j in range(mm):
                sub = mat[:, j * s : (j + 1) * s]
                d2 = -2.0 * sub @ cb[j].T + (cb[j] ** 2).sum(axis=1)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster_id": pdf["cluster_id"],
                    "codes": [c.tobytes() for c in codes],
                }
            )

    id_type = assigned.schema[id_col].dataType.simpleString()
    return assigned.mapInPandas(
        encode, f"{id_col} {id_type}, cluster_id int, codes binary"
    )


class IVFPQIndex:
    """IVF + Product Quantization (Jegou, Douze, Schmid: "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    method). The 100 TB memory story:

    - each vector is stored as ``m`` uint8 codes (one per subspace)
      in a BINARY column instead of dim float32s — 256-dim vectors
      compress 1024 bytes -> 16 bytes (m=16), so the scan that feeds
      candidate generation reads ~64x less data;
    - search is ADC (asymmetric distance computation): per query, an
      (m x n_codes) lookup table of subspace dot products is built
      once on the driver; candidate scores are table-lookups + sums
      over the codes — one NumPy gather per Arrow batch, no vector
      math on the corpus;
    - the top ``rerank`` candidates per query are then re-ranked
      EXACTLY by joining the original vectors back by id — so
      precision loss is bounded by candidate recall, not code
      resolution, and with generous rerank the result equals FLAT
      (which is how the DuckDB oracle validates it).

    Coarse routing reuses the IVF layout: codes live alongside
    cluster_id, so probing remains partition pruning.
    """

    def __init__(
        self,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        coded: DataFrame,
        vectors: DataFrame,
        vec_col: str,
        id_col: str,
    ):
        self.centroids = centroids  # (n_clusters, dim) coarse
        self.codebooks = codebooks  # (m, n_codes, sub_dim)
        self.coded = coded  # id, cluster_id, codes binary
        self.vectors = vectors  # id -> original vector (re-rank source)
        self.vec_col = vec_col
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_clusters: int = 16,
        m: int = 16,
        n_codes: int = 256,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
        sample_size: int = 50_000,
    ) -> "IVFPQIndex":
        # ONE hash-spread sample feeds the coarse quantizer AND the
        # subspace codebooks (previously each did its own count+collect
        # — two redundant full-table jobs per index build)
        sample = _hash_sample(df, vec_col, id_col, sample_size)
        base = IVFIndex.build(
            df, n_clusters, vec_col, id_col, seed, sample_size, _sample=sample
        )
        dim = sample.shape[1]
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        s = dim // m
        # r15: the codebook fit is bounded by a deterministic even
        # stride over the (already hash-spread) sample — 100x the
        # default code count is ample for 256-cell subspace k-means,
        # and the fit cost stops scaling with sample_size.  Below the
        # cap (every test SF; sf0.1 samples 2,000 rows) the matrix is
        # untouched, so codebooks — and the value-checked ivf_pq_search
        # results — are bit-identical.
        fit = sample
        if fit.shape[0] > _PQ_FIT_CAP:
            idx = np.linspace(0, fit.shape[0] - 1, _PQ_FIT_CAP).astype(np.int64)
            fit = fit[idx]
        codebooks = np.stack(
            [
                _kmeans_l2(fit[:, j * s : (j + 1) * s], n_codes, seed + j)
                for j in range(m)
            ]
        )  # (m, k_j<=n_codes, s) — all k_j equal since same sample size

        coded = _pq_encode(base.assigned, codebooks, vec_col, id_col)
        vectors = df.select(id_col, vec_col)
        return cls(base.centroids, codebooks, coded, vectors, vec_col, id_col)

    _BASE_BATCH = -1  # reserved __batch id: initial build / compacted history

    def save(self, path: str) -> None:
        """Persist: codes partitioned by (__batch, cluster_id) (probe =
        partition pruning over a 16-byte-per-row table; the __batch
        level makes the saved index appendable — :meth:`append_batch`),
        original vectors alongside for the re-rank join,
        centroids+codebooks as JSON."""
        import json
        import os

        (
            self.coded.withColumn("__batch", F.lit(self._BASE_BATCH))
            .write.mode("overwrite")
            .partitionBy("__batch", "cluster_id")
            .parquet(os.path.join(path, "codes"))
        )
        (
            self.vectors.withColumn("__batch", F.lit(self._BASE_BATCH))
            .write.mode("overwrite")
            .partitionBy("__batch")
            .parquet(os.path.join(path, "vectors"))
        )
        with open(os.path.join(path, "_pq_meta.json"), "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "codebooks": self.codebooks.tolist(),
                    "vec_col": self.vec_col,
                    "id_col": self.id_col,
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFPQIndex":
        import json
        import os

        with open(os.path.join(path, "_pq_meta.json")) as f:
            meta = json.load(f)

        tombs = load_tombstones(spark, path, meta["id_col"])

        def rd(sub: str) -> DataFrame:
            # manifest-aware: filters uncommitted/obsolete fold dirs,
            # then anti-joins tombstoned ids (logical deletes)
            df = read_live(spark, os.path.join(path, sub))
            if "__batch" in df.columns:
                df = df.drop("__batch")
            return apply_tombstones(df, tombs, meta["id_col"])

        return cls(
            np.asarray(meta["centroids"], dtype=np.float64),
            np.asarray(meta["codebooks"], dtype=np.float64),
            rd("codes"),
            rd("vectors"),
            meta["vec_col"],
            meta["id_col"],
        )

    @classmethod
    def append_batch(
        cls, batch_df: DataFrame, path: str, batch_id: int
    ) -> None:
        """Incremental PQ maintenance: quantize one micro-batch of new
        vectors with the SAVED index's frozen centroids/codebooks and
        add it as partition ``__batch=<batch_id>`` of both the codes
        and vectors tables — O(batch), replay-idempotent (the batch's
        own partitions are dropped before the write).  Frozen-codebook
        drift has the same recall caveat and rebuild cadence as
        ``IVFIndex.append_batch``."""
        import json
        import os

        spark = batch_df.sparkSession
        with open(os.path.join(path, "_pq_meta.json")) as f:
            meta = json.load(f)
        cents = np.asarray(meta["centroids"], dtype=np.float64)
        cbs = np.asarray(meta["codebooks"], dtype=np.float64)
        vec_col, id_col = meta["vec_col"], meta["id_col"]
        assigned = _assign_clusters(
            batch_df.select(id_col, vec_col), cents, vec_col
        )
        coded = _pq_encode(assigned, cbs, vec_col, id_col)
        codes_path = os.path.join(path, "codes")
        vecs_path = os.path.join(path, "vectors")
        drop_batch_partition(spark, codes_path, batch_id)
        drop_batch_partition(spark, vecs_path, batch_id)
        (
            coded.withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("__batch", "cluster_id")
            .parquet(codes_path)
        )
        (
            batch_df.select(id_col, vec_col)
            .withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("__batch")
            .parquet(vecs_path)
        )

    @classmethod
    def delete_ids(cls, spark: SparkSession, path: str, ids: Sequence) -> None:
        """Logical delete by id (tombstone at the INDEX root, shared by
        the codes and vectors tables): O(ids); ``load`` anti-joins,
        ``compact`` applies physically to both tables."""
        import json
        import os

        with open(os.path.join(path, "_pq_meta.json")) as f:
            id_col = json.load(f)["id_col"]
        append_tombstones(spark, path, ids, id_col)

    @classmethod
    def compact(
        cls, spark: SparkSession, path: str, commit_mode: str = "rename"
    ) -> None:
        """Fold appended micro-batch partitions into the base (codes and
        vectors both) and physically apply tombstoned deletes; run
        between ingest sessions.  ``commit_mode="manifest"`` for object
        stores (see batchstate.py).  Tombstones are cleared only after
        BOTH tables folded (a crash between re-applies them — no-op)."""
        import json
        import os

        with open(os.path.join(path, "_pq_meta.json")) as f:
            id_col = json.load(f)["id_col"]
        tombs = load_tombstones(spark, path, id_col)
        xf = None if tombs is None else (
            lambda df: apply_tombstones(df, tombs, id_col)
        )
        folded_codes = fold_batch_partitions(
            spark,
            os.path.join(path, "codes"),
            ["__batch", "cluster_id"],
            cls._BASE_BATCH,
            commit_mode=commit_mode,
            transform=xf,
            force=tombs is not None,
        )
        folded_vecs = fold_batch_partitions(
            spark,
            os.path.join(path, "vectors"),
            ["__batch"],
            cls._BASE_BATCH,
            commit_mode=commit_mode,
            transform=xf,
            force=tombs is not None,
        )
        if tombs is not None and folded_codes and folded_vecs:
            clear_tombstones(spark, path)

    def probe_clusters(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm
        sims = self.centroids @ q
        return [int(c) for c in np.argsort(-sims)[: int(nprobe)]]

    def search_batch(
        self,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        nprobe: int = 4,
        rerank: int = 128,
    ) -> DataFrame:
        """ADC candidate generation over the code column, then exact
        re-rank of the top ``rerank`` per query.

        Shuffle profile: the candidate shuffle carries at most
        (partitions x queries x rerank) tiny rows; the re-rank join
        touches only (queries x rerank) vectors by id. The corpus-wide
        scan reads (id, cluster_id, 16-byte codes) — never the vectors.
        """
        qmat = np.asarray(query_vecs, dtype=np.float64)
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms
        nq, dim = qmat.shape
        mcount, ncodes, s = self.codebooks.shape
        # per-query LUT: luts[q, j, c] = <q_sub_j, codebook_j[c]>
        luts = np.einsum(
            "qjs,jcs->qjc", qmat.reshape(nq, mcount, s), self.codebooks
        )  # (nq, m, n_codes)
        qid_strs = [str(q) for q in query_ids]
        probes = set()
        for row in qmat:
            probes.update(self.probe_clusters(row, nprobe))
        probes = sorted(probes)
        rr = int(rerank)
        id_col = self.id_col
        id_type = self.coded.schema[id_col].dataType.simpleString()
        out_schema = f"query_id string, {id_col} {id_type}, approx double"

        def adc(batches):
            import pyarrow as pa

            for rb in batches:
                n = rb.num_rows
                if n == 0:
                    continue
                ids = rb.column(0).to_numpy(zero_copy_only=False)
                col = rb.column(1)
                # Zero-copy view of the code matrix: a no-null Arrow
                # binary array stores all values contiguously in one
                # data buffer; when every entry is exactly mcount bytes
                # the (n, m) matrix is just a reshape of that buffer —
                # no per-row Python objects, no copy.
                off_dt = (
                    np.int64 if pa.types.is_large_binary(col.type) else np.int32
                )
                bufs = col.buffers()
                offs = np.frombuffer(bufs[1], dtype=off_dt)[
                    col.offset : col.offset + n + 1
                ]
                if col.null_count == 0 and np.all(np.diff(offs) == mcount):
                    data = np.frombuffer(bufs[2], dtype=np.uint8)
                    codes = data[offs[0] : offs[-1]].reshape(n, mcount)
                else:  # ragged rows — correctness fallback
                    vals = col.to_pylist()
                    if any(v is None for v in vals):
                        raise ValueError(
                            "NULL code row in PQ codes table (corrupt index)"
                        )
                    blob = b"".join(vals)
                    codes = np.frombuffer(blob, dtype=np.uint8).reshape(
                        n, mcount
                    )
                # scores[q, i] = sum_j luts[q, j, codes[i, j]]
                scores = np.zeros((nq, n))
                for j in range(mcount):
                    scores += luts[:, j, codes[:, j]]
                take = min(rr, n)
                if take < n:
                    part = np.argpartition(-scores, take - 1, axis=1)[:, :take]
                else:
                    part = np.tile(np.arange(n), (nq, 1))
                out_q = np.repeat(np.arange(nq), part.shape[1])
                rows = part.ravel()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([qid_strs[i] for i in out_q], type=pa.string()),
                        pa.array(ids[rows]),
                        pa.array(scores[out_q, rows], type=pa.float64()),
                    ],
                    names=["query_id", id_col, "approx"],
                )

        cand = (
            self.coded.filter(F.col("cluster_id").isin(probes))
            .select(id_col, "codes")
            .mapInArrow(adc, schema=out_schema)
        )
        shortlist = knn_ops.topk_per_query(
            cand, rr, "query_id", id_col, "approx"
        )
        # exact re-rank: join original vectors by id (rerank rows per query)
        qdf_rows = [
            (qid_strs[i], [float(x) for x in qmat[i]]) for i in range(nq)
        ]
        qdf = self.coded.sparkSession.createDataFrame(
            qdf_rows, "query_id string, query_vec array<double>"
        )
        exact = (
            shortlist.join(self.vectors, id_col)
            .join(F.broadcast(qdf), "query_id")
            .withColumn(
                "similarity",
                V.dot(F.col(self.vec_col).cast("array<double>"), F.col("query_vec")),
            )
            .select("query_id", id_col, "similarity")
        )
        return knn_ops.topk_per_query(exact, int(k), "query_id", id_col)


class IVFSQIndex:
    """IVF + 8-bit scalar quantization — the middle compression tier
    between FLAT (4 bytes/dim) and PQ (sub-byte/dim): one uint8 per
    dimension (4x smaller scans), per-dimension (min, step) learned
    from the training sample (public method — the SQ8 storage every
    production vector store ships).

    Approximate scoring is exact-in-the-quantized-domain:
    ``dot(q, dequant(code)) = dot(q, mins) + (codes @ (q*steps))`` —
    one uint8 GEMM per Arrow batch, no per-row work.  The top
    ``rerank`` candidates re-rank EXACTLY by id join, so with generous
    rerank the result equals FLAT (the oracle's check, same contract
    as IVF-PQ).  Coarse routing reuses the IVF layout: codes live
    alongside cluster_id, probing is partition pruning."""

    def __init__(
        self,
        centroids: np.ndarray,
        mins: np.ndarray,
        steps: np.ndarray,
        coded: DataFrame,
        vectors: DataFrame,
        vec_col: str,
        id_col: str,
    ):
        self.centroids = centroids
        self.mins = mins    # (dim,)
        self.steps = steps  # (dim,) — 0-range dims pinned to step 1
        self.coded = coded  # id, cluster_id, codes binary(dim)
        self.vectors = vectors
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
    ) -> "IVFSQIndex":
        sample = _hash_sample(df, vec_col, id_col, sample_size)
        base = IVFIndex.build(
            df, n_clusters, vec_col, id_col, seed, sample_size, _sample=sample
        )
        mins = sample.min(axis=0)
        rng = sample.max(axis=0) - mins
        steps = np.where(rng > 0, rng / 255.0, 1.0)

        import pandas as pd

        id_type = df.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, cluster_id int, codes binary"
        m, s = mins.copy(), steps.copy()

        def encode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                codes = np.clip(
                    np.rint((mat - m) / s), 0, 255
                ).astype(np.uint8)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "cluster_id": pdf["cluster_id"],
                        "codes": [c.tobytes() for c in codes],
                    }
                )

        coded = base.assigned.select(id_col, "cluster_id", vec_col).mapInPandas(
            encode, out_schema
        )
        return cls(
            base.centroids, mins, steps, coded,
            df.select(id_col, vec_col), vec_col, id_col,
        )

    _BASE_BATCH = -1  # reserved __batch id: initial build / compacted history

    def save(self, path: str) -> None:
        """Persist with the same layout contract as the PQ tier: codes
        partitioned by (__batch, cluster_id) — probe == partition
        pruning over a 1-byte-per-dim table — vectors alongside for the
        re-rank join, quantizer (centroids + mins/steps) as JSON."""
        import json
        import os

        (
            self.coded.withColumn("__batch", F.lit(self._BASE_BATCH))
            .write.mode("overwrite")
            .partitionBy("__batch", "cluster_id")
            .parquet(os.path.join(path, "codes"))
        )
        (
            self.vectors.withColumn("__batch", F.lit(self._BASE_BATCH))
            .write.mode("overwrite")
            .partitionBy("__batch")
            .parquet(os.path.join(path, "vectors"))
        )
        with open(os.path.join(path, "_sq_meta.json"), "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "mins": self.mins.tolist(),
                    "steps": self.steps.tolist(),
                    "vec_col": self.vec_col,
                    "id_col": self.id_col,
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFSQIndex":
        import json
        import os

        with open(os.path.join(path, "_sq_meta.json")) as f:
            meta = json.load(f)
        tombs = load_tombstones(spark, path, meta["id_col"])

        def rd(sub: str) -> DataFrame:
            df = read_live(spark, os.path.join(path, sub))
            if "__batch" in df.columns:
                df = df.drop("__batch")
            return apply_tombstones(df, tombs, meta["id_col"])

        return cls(
            np.asarray(meta["centroids"], dtype=np.float64),
            np.asarray(meta["mins"], dtype=np.float64),
            np.asarray(meta["steps"], dtype=np.float64),
            rd("codes"),
            rd("vectors"),
            meta["vec_col"],
            meta["id_col"],
        )

    @classmethod
    def delete_ids(cls, spark: SparkSession, path: str, ids: Sequence) -> None:
        """Logical delete by id — the shared tombstone protocol
        (tombstones at the index root; ``load`` anti-joins them)."""
        import json
        import os

        with open(os.path.join(path, "_sq_meta.json")) as f:
            id_col = json.load(f)["id_col"]
        append_tombstones(spark, path, ids, id_col)

    @classmethod
    def append_batch(cls, batch_df: DataFrame, path: str, batch_id: int) -> None:
        """Incremental SQ maintenance: assign + encode one micro-batch
        with the SAVED index's frozen centroids and (mins, steps), add
        it as partition ``__batch=<batch_id>`` of codes and vectors —
        O(batch), replay-idempotent (the batch's own partitions are
        dropped first).  Same frozen-quantizer drift caveat and rebuild
        cadence as the IVF/PQ append paths."""
        import json
        import os

        import pandas as pd

        spark = batch_df.sparkSession
        with open(os.path.join(path, "_sq_meta.json")) as f:
            meta = json.load(f)
        cents = np.asarray(meta["centroids"], dtype=np.float64)
        mins = np.asarray(meta["mins"], dtype=np.float64)
        steps = np.asarray(meta["steps"], dtype=np.float64)
        vec_col, id_col = meta["vec_col"], meta["id_col"]
        assigned = _assign_clusters(
            batch_df.select(id_col, vec_col), cents, vec_col
        )
        id_type = batch_df.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, cluster_id int, codes binary"

        def encode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                codes = np.clip(np.rint((mat - mins) / steps), 0, 255).astype(
                    np.uint8
                )
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "cluster_id": pdf["cluster_id"],
                        "codes": [c.tobytes() for c in codes],
                    }
                )

        coded = assigned.select(id_col, "cluster_id", vec_col).mapInPandas(
            encode, out_schema
        )
        codes_path = os.path.join(path, "codes")
        vecs_path = os.path.join(path, "vectors")
        drop_batch_partition(spark, codes_path, batch_id)
        drop_batch_partition(spark, vecs_path, batch_id)
        (
            coded.withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("__batch", "cluster_id")
            .parquet(codes_path)
        )
        (
            batch_df.select(id_col, vec_col)
            .withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("__batch")
            .parquet(vecs_path)
        )

    @classmethod
    def compact(
        cls, spark: SparkSession, path: str, commit_mode: str = "rename"
    ) -> None:
        """Fold appended micro-batches into the base (codes + vectors)
        and apply tombstones physically — identical protocol to the
        IVF/PQ compacts; tombstones clear only after BOTH folds."""
        import json
        import os

        with open(os.path.join(path, "_sq_meta.json")) as f:
            id_col = json.load(f)["id_col"]
        tombs = load_tombstones(spark, path, id_col)
        xf = None if tombs is None else (
            lambda df: apply_tombstones(df, tombs, id_col)
        )
        folded_codes = fold_batch_partitions(
            spark,
            os.path.join(path, "codes"),
            ["__batch", "cluster_id"],
            cls._BASE_BATCH,
            commit_mode=commit_mode,
            transform=xf,
            force=tombs is not None,
        )
        folded_vecs = fold_batch_partitions(
            spark,
            os.path.join(path, "vectors"),
            ["__batch"],
            cls._BASE_BATCH,
            commit_mode=commit_mode,
            transform=xf,
            force=tombs is not None,
        )
        if tombs is not None and folded_codes and folded_vecs:
            clear_tombstones(spark, path)

    def probe_clusters(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm
        sims = self.centroids @ q
        return [int(c) for c in np.argsort(-sims)[: int(nprobe)]]

    def search_batch(
        self,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        nprobe: int = 4,
        rerank: int = 128,
    ) -> DataFrame:
        """SQ8 candidate generation (one uint8 GEMM per Arrow batch over
        the partition-pruned code scan) + exact re-rank by id join."""
        import pyarrow as pa

        qmat = np.asarray(query_vecs, dtype=np.float64)
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms
        nq, dim = qmat.shape
        qs = qmat * self.steps        # (nq, dim)
        consts = qmat @ self.mins     # (nq,)
        qid_strs = [str(q) for q in query_ids]
        probes = sorted(
            {c for row in qmat for c in self.probe_clusters(row, nprobe)}
        )
        rr = int(rerank)
        id_col = self.id_col
        id_type = self.coded.schema[id_col].dataType.simpleString()
        out_schema = f"query_id string, {id_col} {id_type}, approx double"

        def sq_scan(batches):
            for rb in batches:
                n = rb.num_rows
                if n == 0:
                    continue
                ids = rb.column(0).to_numpy(zero_copy_only=False)
                col = rb.column(1)
                off_dt = (
                    np.int64 if pa.types.is_large_binary(col.type) else np.int32
                )
                bufs = col.buffers()
                offs = np.frombuffer(bufs[1], dtype=off_dt)[
                    col.offset : col.offset + n + 1
                ]
                if col.null_count == 0 and np.all(np.diff(offs) == dim):
                    data = np.frombuffer(bufs[2], dtype=np.uint8)
                    codes = data[offs[0] : offs[-1]].reshape(n, dim)
                else:  # ragged rows — correctness fallback
                    vals = col.to_pylist()
                    if any(v is None for v in vals):
                        raise ValueError(
                            "NULL code row in SQ codes table (corrupt index)"
                        )
                    blob = b"".join(vals)
                    codes = np.frombuffer(blob, dtype=np.uint8).reshape(n, dim)
                scores = codes @ qs.T + consts  # (n, nq)
                take = min(rr, n)
                if take < n:
                    part = np.argpartition(-scores, take - 1, axis=0)[:take].T
                else:
                    part = np.tile(np.arange(n), (nq, 1))
                out_q = np.repeat(np.arange(nq), part.shape[1])
                rows = part.ravel()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([qid_strs[i] for i in out_q], type=pa.string()),
                        pa.array(ids[rows]),
                        pa.array(scores[rows, out_q], type=pa.float64()),
                    ],
                    names=["query_id", id_col, "approx"],
                )

        cand = (
            self.coded.filter(F.col("cluster_id").isin(probes))
            .select(id_col, "codes")
            .mapInArrow(sq_scan, schema=out_schema)
        )
        shortlist = knn_ops.topk_per_query(cand, rr, "query_id", id_col, "approx")
        qdf = self.coded.sparkSession.createDataFrame(
            [(qid_strs[i], [float(x) for x in qmat[i]]) for i in range(nq)],
            "query_id string, query_vec array<double>",
        )
        exact = (
            shortlist.join(self.vectors, id_col)
            .join(F.broadcast(qdf), "query_id")
            .withColumn(
                "similarity",
                V.dot(F.col(self.vec_col).cast("array<double>"), F.col("query_vec")),
            )
            .select("query_id", id_col, "similarity")
        )
        return knn_ops.topk_per_query(exact, int(k), "query_id", id_col)


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
        _sample: np.ndarray | None = None,
    ) -> "IVFIndex":
        # hash-spread sample (see _hash_sample); ``_sample`` lets
        # IVFPQIndex.build share one sample between the coarse quantizer
        # and the codebook trainers
        sample = (
            _sample
            if _sample is not None
            else _hash_sample(df, vec_col, id_col, sample_size)
        )
        norms = np.linalg.norm(sample, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = _kmeans(sample / norms, n_clusters, seed)
        assigned = _assign_clusters(df, cents, vec_col)
        return cls(cents, assigned, vec_col, id_col)

    _BASE_BATCH = -1  # reserved __batch id for the initial build / compacted history

    def save(self, path: str) -> None:
        """Persist partitioned by (__batch, cluster_id): probing ==
        partition pruning on cluster_id; the ``__batch`` level makes the
        saved index APPENDABLE — streaming ingest adds micro-batch
        partitions next to the ``__batch=-1`` base (see
        :meth:`append_batch`)."""
        (
            self.assigned.withColumn("__batch", F.lit(self._BASE_BATCH))
            .write.mode("overwrite")
            .partitionBy("__batch", "cluster_id")
            .parquet(path)
        )
        import json, os

        with open(os.path.join(path, "_centroids.json"), "w") as f:
            json.dump(self.centroids.tolist(), f)

    @classmethod
    def load(cls, spark: SparkSession, path: str, vec_col: str = "embedding", id_col: str = "vec_id") -> "IVFIndex":
        import json, os

        with open(os.path.join(path, "_centroids.json")) as f:
            cents = np.asarray(json.load(f), dtype=np.float64)
        df = read_live(spark, path)  # manifest-aware fold-dir filtering
        if "__batch" in df.columns:
            df = df.drop("__batch")
        # logical deletes: anti-join tombstoned ids (physically applied
        # by the next compact)
        df = apply_tombstones(df, load_tombstones(spark, path, id_col), id_col)
        return cls(cents, df, vec_col, id_col)

    @classmethod
    def append_batch(
        cls,
        batch_df: DataFrame,
        path: str,
        batch_id: int,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        """Incremental index maintenance: assign one micro-batch of new
        vectors to the SAVED index's (frozen) centroids and add it as
        partition ``__batch=<batch_id>`` — O(batch) work, the corpus is
        never rescanned, and probing still prunes on cluster_id.

        IDEMPOTENT per batch_id: the batch's own partition dir is
        dropped before writing, so an at-least-once replay (foreachBatch)
        replaces itself instead of duplicating vectors.  Appends are
        append-only by id (same contract as a segment file); re-ingested
        ids are the caller's dedup responsibility.

        Centroids are FROZEN at build time: appends keep recall for
        in-distribution data, but a drifting embedding distribution
        degrades it — monitor with tools/recall_report.py and rebuild
        (or :meth:`compact` + rebuild) on a cadence.  This mirrors how
        serving systems run IVF: static coarse quantizer, growing
        posting lists, periodic retrain.
        """
        import json, os

        spark = batch_df.sparkSession
        with open(os.path.join(path, "_centroids.json")) as f:
            cents = np.asarray(json.load(f), dtype=np.float64)
        assigned = _assign_clusters(
            batch_df.select(id_col, vec_col), cents, vec_col
        )
        drop_batch_partition(spark, path, batch_id)  # replay: replace
        (
            assigned.withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("__batch", "cluster_id")
            .parquet(path)
        )

    @classmethod
    def delete_ids(
        cls, spark: SparkSession, path: str, ids: Sequence, id_col: str = "vec_id"
    ) -> None:
        """Logical delete by id (tombstone): O(ids), index untouched;
        ``load`` anti-joins immediately, ``compact`` applies physically."""
        append_tombstones(spark, path, ids, id_col)

    @classmethod
    def compact(
        cls,
        spark: SparkSession,
        path: str,
        commit_mode: str = "rename",
        id_col: str = "vec_id",
    ) -> None:
        """Fold every appended ``__batch=N`` partition into the
        ``__batch=-1`` base, bounding partition count (file-listing cost
        grows with micro-batch count otherwise), and PHYSICALLY apply
        any tombstoned deletes (crash-safe: the filter runs inside the
        fold's stage-then-promote, and tombstones are cleared only after
        the fold commits — a crash re-applies them, which is a no-op).
        Run between ingest sessions — not concurrently with an active
        append.  ``commit_mode="manifest"`` for object stores (see
        batchstate.py)."""
        tombs = load_tombstones(spark, path, id_col)
        folded = fold_batch_partitions(
            spark,
            path,
            ["__batch", "cluster_id"],
            cls._BASE_BATCH,
            commit_mode=commit_mode,
            transform=(
                None if tombs is None else (lambda df: apply_tombstones(df, tombs, id_col))
            ),
            # with tombstones pending, fold even if no history dirs wait
            # (the base alone must rewrite to apply them physically)
            force=tombs is not None,
        )
        if tombs is not None and folded:
            # cleared ONLY after the fold committed — a crash before
            # this re-applies the tombstones next time (idempotent)
            clear_tombstones(spark, path)

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

    def search_filtered(
        self,
        query_vec: Sequence[float],
        k: int,
        nprobe: int = 4,
        where=None,
        allowed_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Filtered vector search over the IVF index: a metadata
        predicate (``where``, a Column over the index's carried
        columns — :meth:`build` keeps every input column) and/or an
        ``allowed_ids`` frame (left-semi joined) applied BELOW the
        scoring projection, INSIDE the probed partitions.

        The filter composes with partition pruning at the scan —
        Catalyst pushes the predicate into the cluster-pruned parquet
        read, so selective filters reduce scanned rows, not just
        scored rows (the reference's pre-filter-below-scoring
        semantics, collection.go:521, lifted to the ANN path).  Note
        the standard ANN caveat: k results are the top-k of the
        FILTERED probed clusters; at low nprobe a harsh filter can
        empty a probe — raise nprobe with filter selectivity."""
        probes = self.probe_clusters(query_vec, nprobe)
        cand = self.assigned.filter(F.col("cluster_id").isin(probes))
        if where is not None:
            cand = cand.filter(where)
        if allowed_ids is not None:
            cand = cand.join(
                F.broadcast(allowed_ids.select(self.id_col)), self.id_col, "left_semi"
            )
        return knn_ops.knn_single(
            cand, list(query_vec), k, vec_col=self.vec_col, id_col=self.id_col
        ).drop("cluster_id")

    def search_batch(
        self,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        nprobe: int = 4,
        where=None,
    ) -> DataFrame:
        """Batch IVF search: every query is routed to its ``nprobe``
        nearest clusters on the driver (centroids are MB-scale), the
        (query, cluster) probe table is broadcast-joined against the
        cluster-partitioned corpus, and scoring+top-k runs per query.

        The corpus is scanned ONCE for all queries; only rows whose
        cluster is probed by at least one query are touched (semi-join
        pruning), and each (doc, query) pair scored is restricted to
        probed clusters — versus the full docs x queries cross product
        of brute force.

        ``where`` is an optional metadata predicate Column over the
        index's carried columns, applied BELOW the scoring join (the
        batch analog of :meth:`search_filtered`: Catalyst composes it
        with the cluster pruning at the scan).  The standard filtered-
        ANN caveat applies per query: raise nprobe with selectivity.

        Broadcast shape (r10, same normalization as
        :meth:`search_batch_dsl`): bare (query_id, cluster_id) probe
        pairs — O(q·nprobe) rows, no dim-sized payload — plus a
        per-query vector table (O(q) rows, each vector exactly once);
        both broadcast hash joins pipeline in one codegen stage, so
        the denormalized q × nprobe × dim form never exists."""
        spark = self.assigned.sparkSession
        pair_rows = []
        meta_rows = []
        for qid, qv in zip(query_ids, query_vecs):
            q = np.asarray(qv, dtype=np.float64)
            nrm = np.linalg.norm(q)
            if nrm > 0:
                q = q / nrm
            meta_rows.append((str(qid), [float(x) for x in q]))
            for c in self.probe_clusters(q, nprobe):
                pair_rows.append((str(qid), int(c)))
        pairs_df = spark.createDataFrame(
            pair_rows, "query_id string, cluster_id int"
        )
        qmeta_df = spark.createDataFrame(
            meta_rows, "query_id string, query_vec array<double>"
        )
        from ..functions import vector as V

        base = self.assigned if where is None else self.assigned.filter(where)
        scored = (
            base.join(F.broadcast(pairs_df), "cluster_id")
            .join(F.broadcast(qmeta_df), "query_id")
            .withColumn(
                "similarity",
                V.dot(F.col(self.vec_col).cast("array<double>"), F.col("query_vec")),
            )
            .select("query_id", self.id_col, "similarity")
        )
        return knn_ops.topk_per_query(scored, k, "query_id", self.id_col)

    def _probe_tables(self, qids, qvecs, per_query, nprobe: int):
        """Driver-side construction of the two normalized broadcast
        tables for :meth:`search_batch_dsl`: ``pair_rows`` is exactly
        the (query_id, cluster_id) probe pairs — O(q·nprobe) 2-tuples,
        NO dim-sized payload — and ``meta_rows`` carries each query's
        normalized vector + parsed DSL exactly ONCE (O(q) rows).
        Factored out so the broadcast-size contract is directly
        testable (tests/test_ann.py)."""
        pair_rows: list[tuple] = []
        meta_rows: list[tuple] = []
        for qid, qv, f in zip(qids, qvecs, per_query):
            q = np.asarray(qv, dtype=np.float64)
            nrm = np.linalg.norm(q)
            if nrm > 0:
                q = q / nrm
            w, cont, notc = f
            meta_rows.append(
                (
                    qid, [float(x) for x in q],
                    dict(w or {}), list(cont or []), list(notc or []),
                )
            )
            for c in self.probe_clusters(q, nprobe):
                pair_rows.append((qid, int(c)))
        return pair_rows, meta_rows

    def search_batch_dsl(
        self,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        per_query,
        nprobe: int = 4,
        where=None,
        metadata_col: str | None = "metadata",
        filterable_cols=None,
        text_col: str | None = "content",
    ) -> DataFrame:
        """Batch IVF search where EACH query carries its own where /
        where_document DSL (r9 — the IVF analog of
        :func:`..knn.knn_expr_filtered_dsl`): the probe table's rows
        carry the query's parsed filter columns alongside its probed
        clusters, so ONE broadcast join keeps BOTH the cluster pruning
        and the per-query predicate below scoring — filtered batches no
        longer give up partition pruning at scale.

        ``per_query`` is one parsed tuple per query:
        ``(where_map, contains_list, not_contains_list)`` — the
        caller (``Collection.query_batch``) owns DSL validation.
        ``where`` is an optional GLOBAL predicate Column over the
        carried columns, applied to the corpus side before the join
        (batch-wide filters compose with the per-query ones).  The
        index's carried columns must include ``metadata_col`` /
        ``text_col`` when the corresponding filters are used (pass
        ``None`` for a surface the frame lacks: non-empty filters on it
        then match nothing, same rule as the FLAT kernel).  Standard
        filtered-ANN caveat per query: raise nprobe with selectivity.

        Broadcast shape (r10): the probe table is NORMALIZED — it
        carries only ``(query_id, cluster_id)`` pairs (O(q·nprobe)
        rows, no dim-sized payload), and the query's vector + parsed
        DSL ride a SECOND per-query broadcast (O(q) rows, the vector
        exactly once per query).  Both joins are broadcast hash joins
        in one codegen stage, so the denormalized form never
        materializes — versus the r9 shape that repeated each query's
        full vector once per probed cluster (q × nprobe × dim: ~3.9 GB
        broadcast at q=10k, nprobe=32, d=1536 for ~120 MB of data)."""
        spark = self.assigned.sparkSession
        # materialize ONCE: iterator inputs must not be exhausted by
        # the length check, and zip() silently drops queries on
        # mismatch (same guard as router.routed_search_batch)
        qids = [str(q) for q in query_ids]
        qvecs = list(query_vecs)
        pq = list(per_query)
        if not (len(qids) == len(qvecs) == len(pq)):
            raise ValueError(
                f"query_ids ({len(qids)}), query_vecs ({len(qvecs)}) "
                f"and per_query ({len(pq)}) must be the same length"
            )
        pair_rows, meta_rows = self._probe_tables(qids, qvecs, pq, nprobe)
        pairs_df = F.broadcast(
            spark.createDataFrame(pair_rows, "query_id string, cluster_id int")
        )
        qmeta_df = F.broadcast(
            spark.createDataFrame(
                meta_rows,
                "query_id string, query_vec array<double>, "
                "q_where map<string,string>, q_contains array<string>, "
                "q_not_contains array<string>",
            )
        )
        base = self.assigned if where is None else self.assigned.filter(where)
        # join 1: cluster-pruned (doc, query) pairs; join 2 attaches
        # the per-query vector + DSL and filters non-matching pairs
        # below scoring — both broadcast, pipelined, no materialization
        expanded = base.join(
            pairs_df, base["cluster_id"] == pairs_df["cluster_id"]
        )
        cond = (
            pairs_df["query_id"] == qmeta_df["query_id"]
        ) & knn_ops.dsl_filter_condition(
            base, qmeta_df,
            metadata_col=metadata_col, filterable_cols=filterable_cols,
            text_col=text_col,
        )
        scored = (
            expanded.join(qmeta_df, cond)
            .withColumn(
                "similarity",
                V.dot(
                    F.col(self.vec_col).cast("array<double>"),
                    qmeta_df["query_vec"],
                ),
            )
            .select(pairs_df["query_id"], base[self.id_col], "similarity")
        )
        return knn_ops.topk_per_query(scored, k, "query_id", self.id_col)


def tune_ivf(
    emb: DataFrame,
    target_recall: float = 0.95,
    k: int = 10,
    n_queries: int = 16,
    candidate_nlist: Sequence[int] = (8, 16, 32),
    pq_m: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> dict:
    """Pick an IVF operating point (n_clusters, nprobe[, rerank]) that
    hits ``target_recall`` recall@k with the smallest probed-corpus
    fraction, from a MEASURED sweep — not a heuristic.

    Protocol: sample ``n_queries`` held-in query vectors, compute exact
    brute-force top-k as ground truth, then for each candidate
    ``n_clusters`` build an index once and raise nprobe (1, 2, 4, ...)
    until the target is met.  Among configurations meeting the target,
    choose the one with the lowest expected scan fraction
    (nprobe / n_clusters — the cost a probe actually pays, since
    cluster partitions prune the scan).  With ``pq_m`` set (a single
    codebook count or a sequence to sweep, smallest-first), additionally
    sweep PQ code size x rerank depth (k, 2k, 5k, 10k) at the chosen
    point and return the most compressed (m, rerank) meeting the
    target, plus the full ``pq_sweep``.

    At 100 TB this runs unchanged on a SAMPLE of the corpus (recall is
    a distribution property, not a row-count property); the returned
    settings transfer to the full build with the same nlist-to-corpus
    ratio.  Returns {"n_clusters", "nprobe", "recall", "scan_fraction",
    "sweep": [...], and "rerank"/"pq_recall" when pq_m is set}.
    """
    from ..materialize import materialize

    qdf = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(int(n_queries))
    )
    qrows = qdf.collect()
    qids = [str(r[id_col]) for r in qrows]
    qvecs = [list(r[vec_col]) for r in qrows]
    exact: dict[str, set] = {}
    ground = knn_ops.knn_block(emb, qids, qvecs, k, vec_col=vec_col, id_col=id_col)
    for r in ground.collect():
        exact.setdefault(r["query_id"], set()).add(r[id_col])

    def recall_of(rows) -> float:
        got: dict[str, set] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r[id_col])
        per_q = [len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
        return sum(per_q) / len(per_q)

    sweep: list[dict] = []
    viable: list[dict] = []
    n_rows = emb.count()
    for nlist in candidate_nlist:
        if nlist > max(n_rows // 2, 1):
            continue  # degenerate: fewer than 2 vectors per cluster
        idx = IVFIndex.build(emb, n_clusters=int(nlist), vec_col=vec_col, id_col=id_col)
        idx.assigned = materialize(idx.assigned)
        nprobe = 1
        while nprobe <= nlist:
            r = recall_of(idx.search_batch(qids, qvecs, k, nprobe=nprobe).collect())
            point = {
                "n_clusters": int(nlist),
                "nprobe": int(nprobe),
                "recall": round(r, 4),
                "scan_fraction": round(nprobe / nlist, 4),
            }
            sweep.append(point)
            if r >= target_recall:
                viable.append(point)
                break  # smallest nprobe meeting target for this nlist
            nprobe *= 2
    if not viable:
        # nothing met the target: fall back to the best recall measured
        best = max(sweep, key=lambda p: (p["recall"], -p["scan_fraction"]))
    else:
        best = min(viable, key=lambda p: (p["scan_fraction"], p["n_clusters"]))
    out = dict(best)
    out["target_recall"] = target_recall
    out["sweep"] = sweep

    if pq_m is not None:
        # ``pq_m`` may be one codebook count or a sequence to sweep;
        # smallest m first (most compression) — the first (m, rerank)
        # meeting the target wins, so the tuner returns the cheapest
        # code size that still hits the recall bar.
        m_cands = (
            [int(pq_m)]
            if isinstance(pq_m, int)
            else sorted(int(m) for m in pq_m)
        )
        pq_sweep: list[dict] = []
        chosen: dict | None = None
        for m in m_cands:
            pq = IVFPQIndex.build(
                emb,
                n_clusters=out["n_clusters"],
                m=m,
                vec_col=vec_col,
                id_col=id_col,
            )
            for rerank in (k, 2 * k, 5 * k, 10 * k):
                r = recall_of(
                    pq.search_batch(
                        qids, qvecs, k, nprobe=out["nprobe"], rerank=rerank
                    ).collect()
                )
                point = {"m": m, "rerank": int(rerank), "pq_recall": round(r, 4)}
                pq_sweep.append(point)
                if r >= target_recall:
                    chosen = point
                    break
            if chosen:
                break
        best_pq = chosen or max(pq_sweep, key=lambda p: (p["pq_recall"], -p["m"]))
        out["m"] = best_pq["m"]
        out["rerank"] = best_pq["rerank"]
        out["pq_recall"] = best_pq["pq_recall"]
        out["pq_sweep"] = pq_sweep
    return out


def tune_ivf_sq(
    emb: DataFrame,
    tuned: dict,
    target_recall: float | None = None,
    k: int = 10,
    n_queries: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> dict:
    """Sweep the SQ8 tier's rerank depth at a :func:`tune_ivf`-chosen
    operating point: build an ``IVFSQIndex`` with the tuned n_clusters
    and find the smallest rerank (k, 2k, 5k, 10k) meeting the target
    at the tuned nprobe — the same protocol the PQ sweep runs, for the
    middle compression tier.  Returns {"sq_rerank", "sq_recall",
    "sq_sweep"}; merge into the tune_ivf dict for the full picture."""
    if target_recall is None:
        target_recall = float(tuned.get("target_recall", 0.95))
    qdf = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(int(n_queries))
    )
    qrows = qdf.collect()
    qids = [str(r[id_col]) for r in qrows]
    qvecs = [list(r[vec_col]) for r in qrows]
    exact: dict[str, set] = {}
    ground = knn_ops.knn_block(emb, qids, qvecs, k, vec_col=vec_col, id_col=id_col)
    for r in ground.collect():
        exact.setdefault(r["query_id"], set()).add(r[id_col])

    def recall_of(rows) -> float:
        got: dict[str, set] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r[id_col])
        per_q = [len(got.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
        return sum(per_q) / len(per_q)

    sq = IVFSQIndex.build(
        emb, n_clusters=tuned["n_clusters"], vec_col=vec_col, id_col=id_col
    )
    sweep: list[dict] = []
    chosen: dict | None = None
    for rerank in (k, 2 * k, 5 * k, 10 * k):
        r = recall_of(
            sq.search_batch(
                qids, qvecs, k, nprobe=tuned["nprobe"], rerank=rerank
            ).collect()
        )
        point = {"sq_rerank": int(rerank), "sq_recall": round(r, 4)}
        sweep.append(point)
        if r >= target_recall:
            chosen = point
            break
    best = chosen or max(sweep, key=lambda p: p["sq_recall"])
    return {**best, "sq_sweep": sweep}


# ---------------------------------------------------------------- tombstones

_TOMBSTONES = "_tombstones"  # underscore prefix: parquet readers skip it


def _tombstone_path(path: str) -> str:
    import os

    return os.path.join(path, _TOMBSTONES)


def append_tombstones(
    spark: SparkSession, path: str, ids: Sequence, id_col: str = "vec_id"
) -> None:
    """Logical delete for an appendable index: record deleted ids in a
    ``_tombstones`` side table (underscore-prefixed, so index scans
    never see it).  O(ids) — the index data is untouched; loads
    anti-join the tombstones and the next compact applies them
    physically.  Idempotent: re-deleting an id is a duplicate row the
    anti-join semantics absorb.  This is the standard segment-store
    delete (tombstone + merge-on-compaction), the same story Lucene /
    Delta deletion vectors use."""
    if not list(ids):
        return
    # ids are stored as strings: comparisons cast consistently below
    df = spark.createDataFrame([(str(i),) for i in ids], f"{id_col} string")
    df.write.mode("append").parquet(_tombstone_path(path))


def load_tombstones(spark: SparkSession, path: str, id_col: str = "vec_id"):
    """Tombstoned ids as a 1-column DataFrame, or None when there are
    none recorded."""
    import os

    tp = _tombstone_path(path)
    if not os.path.exists(tp):
        return None
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(tp).select(id_col).distinct()
    except AnalysisException:
        return None  # dir exists but holds no parquet (cleared)


def apply_tombstones(df: DataFrame, tombs, id_col: str):
    """Anti-join deleted ids out (string-normalized comparison — the
    tombstone table stores ids as strings regardless of source type)."""
    if tombs is None:
        return df
    left = df.withColumn("__tid", F.col(id_col).cast("string"))
    t = tombs.select(F.col(tombs.columns[0]).cast("string").alias("__tid"))
    return left.join(F.broadcast(t), "__tid", "left_anti").drop("__tid")


def clear_tombstones(spark: SparkSession, path: str) -> None:
    import shutil

    shutil.rmtree(_tombstone_path(path), ignore_errors=True)


# ------------------------------------------------------------------
# Standalone spherical k-means document clustering — the IVF coarse
# quantizer exposed as an analytics operator (topic bucketing, corpus
# maps, per-cluster sampling quotas).  Same scale shape as an index
# build: bounded driver-side sample for training, one GEMM-argmax
# Arrow pass over the corpus for assignment.
# ------------------------------------------------------------------


def _ordered_sample(
    df: DataFrame, vec_col: str, id_col: str, sample_size: int
) -> np.ndarray:
    """:func:`_hash_sample` with a DRIVER-SIDE sort by id after the
    bounded collect: the training sample no longer depends on Spark's
    partition/collect order, so a quantizer retrained on the same rows
    is bit-identical regardless of file splits, cluster layout, or a
    storage rewrite — and a Spark-free twin
    (:func:`train_cluster_centroids_local`) can reproduce it exactly
    for the DuckDB oracle replay.  The sort is over <= sample_size
    collected rows — driver-bounded, never a cluster sort."""
    n_rows = df.count()
    cand = df
    if n_rows > sample_size:
        p = max(1, int(997 * sample_size / n_rows))
        cand = df.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(997)) < p
        )
    rows = cand.select(id_col, vec_col).limit(sample_size).collect()
    rows.sort(key=lambda r: r[0])
    return np.asarray([r[1] for r in rows], dtype=np.float64)


def train_cluster_centroids(
    df: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 50_000,
) -> np.ndarray:
    """Train the spherical k-means centroid matrix (n_clusters x dim,
    L2-normalized rows) on the order-stable hash-spread sample.  The
    trained matrix is a MODEL ARTIFACT: inject it back into
    :func:`cluster_embeddings` (and the SemDeDup operators) via their
    ``centroids=`` parameter to decouple training from assignment —
    the pattern that lets the assignment pass be replayed in plain SQL
    with the matrix as a literal."""
    sample = _ordered_sample(df, vec_col, id_col, sample_size)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return _kmeans(sample / norms, n_clusters, seed)


def train_cluster_centroids_local(
    parquet_path: str,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 50_000,
) -> np.ndarray:
    """Spark-free twin of :func:`train_cluster_centroids`: read the
    same parquet with pyarrow, apply the same sort-by-id sample rule,
    run the same seeded trainer — bit-identical centroids, no JVM.
    This is what the oracle generator calls so the DuckDB replay of
    the assignment pass scores against the exact matrix the Spark
    query trained.

    Only the n_rows <= sample_size regime is supported (the hash-
    spread filter uses Spark's xxhash64, which has no local twin);
    every test scale factor is far below the default 50k cap."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[id_col, vec_col])
    if t.num_rows > sample_size:
        raise NotImplementedError(
            f"{parquet_path}: {t.num_rows} rows > sample_size="
            f"{sample_size}; the xxhash64 spread filter has no "
            "Spark-free twin — train with train_cluster_centroids"
        )
    ids = t[id_col].to_pylist()
    vecs = t[vec_col].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    sample = np.asarray([vecs[i] for i in order], dtype=np.float64)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return _kmeans(sample / norms, n_clusters, seed)


def cluster_embeddings(
    df: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 50_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Assign every row to its nearest spherical k-means centroid.

    Deterministic (k-means++ seeded, order-stable hash-spread training
    sample).  Returns the input columns minus the vector, plus
    ``cluster_id`` and ``centroid_sim`` (cosine of the row to its
    centroid — a cluster cohesion signal).  The corpus is never
    shuffled: assignment is one mapInPandas GEMM per Arrow batch
    against the broadcast-by-closure centroid matrix.

    ``centroids`` injects a pre-trained matrix
    (:func:`train_cluster_centroids`), skipping the sample+train step —
    assignment against a frozen model is then a pure function of the
    input, exactly replayable in SQL (the oracle path), and at scale
    the natural shape anyway: train once on a bounded sample, assign
    in every downstream job."""
    import pandas as pd  # noqa: F401

    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else train_cluster_centroids(
            df, n_clusters, vec_col, id_col, seed, sample_size
        )
    )

    keep = [f.name for f in df.schema.fields if f.name != vec_col]
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    )
    out_schema = f"{fields}, cluster_id int, centroid_sim double"
    cmat = cents.T.copy()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            rn = np.linalg.norm(mat, axis=1, keepdims=True)
            rn[rn == 0] = 1.0
            sims = (mat / rn) @ cmat
            out = pdf[keep].copy()
            out["cluster_id"] = np.argmax(sims, axis=1).astype(np.int32)
            out["centroid_sim"] = np.max(sims, axis=1)
            yield out

    return df.mapInPandas(gen, out_schema)


def cluster_summary(
    df: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 50_000,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Per-cluster corpus map: (cluster_id, n, mean_sim) — size and
    cohesion of each spherical k-means cluster.  One aggregation over
    the assignment pass.  ``centroids`` as in
    :func:`cluster_embeddings`."""
    assigned = cluster_embeddings(
        df, n_clusters, vec_col, id_col, seed, sample_size,
        centroids=centroids,
    )
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("centroid_sim"), 4).alias("mean_sim"),
    )

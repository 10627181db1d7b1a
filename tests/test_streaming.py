"""Structured Streaming tests: file-source stream of the driver's events
table, drained with availableNow into memory sinks, compared against the
identical batch computation (streaming/batch parity is the correctness
oracle here)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.collection import Collection
from chromem_go_spark.streaming import ingest as S


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    # File streams want a directory of files. The driver's events table
    # stores TIMESTAMP(NANOS), which Spark can't map to TimestampType;
    # stage through pyarrow with a cast to microseconds, split in two so
    # multiple micro-batches happen.
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_stream")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    idx = t.schema.get_field_index("ts")
    t = t.set_column(
        idx, "ts", t.column("ts").cast(pa.timestamp("us"), safe=False)
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "events-000.parquet")
    pq.write_table(t.slice(half), d / "events-001.parquet")
    return str(d)


@pytest.fixture()
def events_batch(spark, events_dir):
    return spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir)


def _drain_to_memory(spark, df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    out = _drain_to_memory(
        spark,
        S.windowed_event_counts(stream),
        "win_counts",
        "append",
    )
    expected = S.windowed_event_counts(events_batch).collect()
    got = out.collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    got_set = {(key(r), r["n"], round(r["total"], 6)) for r in got}
    exp_map = {key(r): (r["n"], round(r["total"], 6)) for r in expected}
    # Every emitted window matches the batch result exactly.
    assert got_set <= {(k, n, t) for k, (n, t) in exp_map.items()}
    # Append mode holds back windows still inside the watermark horizon
    # when the stream drains; anything older MUST have been emitted.
    max_ts = max(r["ts"] for r in events_batch.select("ts").collect())
    import datetime

    horizon = max_ts - datetime.timedelta(hours=2)
    emitted_keys = {k for k, _, _ in got_set}
    for r in expected:
        if r["window_end"] <= horizon:
            assert key(r) in emitted_keys, f"window {key(r)} missing"


def test_sessionize_stream_matches_batch(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir)
    out = _drain_to_memory(
        spark,
        S.sessionize_events(stream, gap="30 minutes"),
        "sessions",
        "append",
    )
    expected = S.sessionize_events(events_batch, gap="30 minutes").collect()
    key = lambda r: (r["user_id"], r["session_start"])  # noqa: E731
    got = {(key(r), r["n_events"]) for r in out.collect()}
    exp = {(key(r), r["n_events"]) for r in expected}
    # emitted sessions match batch exactly; trailing sessions inside the
    # watermark horizon may be held back in state at drain time
    assert got <= exp
    import datetime

    max_ts = max(r["ts"] for r in events_batch.select("ts").collect())
    horizon = max_ts - datetime.timedelta(hours=2)
    emitted = {k for k, _ in got}
    for r in expected:
        if r["session_end"] <= horizon:
            assert key(r) in emitted


def test_session_count_agrees_with_lag_formulation(spark, events_batch):
    """session_window sessions == the lag-gap sessionization used by the
    oracle query (same 30-min gap)."""
    from pyspark.sql import Window

    sess = (
        S.sessionize_events(events_batch, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    w = Window.partitionBy("user_id").orderBy("s")
    lag = (
        events_batch.select("user_id", F.col("ts").cast("double").alias("s"))
        .withColumn("gap", F.col("s") - F.lag("s").over(w))
        .withColumn(
            "is_new",
            F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"))
    )
    assert sorted(map(tuple, sess.collect())) == sorted(map(tuple, lag.collect()))


def test_running_user_stats_stateful(spark, events_dir, events_batch):
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    out = _drain_to_memory(
        spark,
        S.running_user_stats(stream),
        "user_stats",
        "update",
    )
    # final state per user (last emitted row) must equal the batch totals
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    expected = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in expected.collect()}
    assert got == exp


def test_stream_upsert_to_collection(spark, tmp_path, events_dir):
    """Streaming ingest: events become documents, upserted per batch."""
    stream = S.read_events_stream(spark, events_dir)
    docs = stream.select(
        F.concat(F.lit("ev-"), F.col("event_id").cast("string")).alias("id"),
        F.create_map(F.lit("type"), F.col("event_type")).alias("metadata"),
        F.array(
            F.col("value").cast("float"),
            F.lit(0.0).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
        F.coalesce(F.col("props"), F.lit("")).alias("content"),
    )
    col = Collection(spark, "events_ingest")
    writer = S.stream_upsert_to_collection(
        docs, col, checkpoint_dir=str(tmp_path / "ckpt")
    )
    S.run_available_now(writer)
    n_events = spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir).count()
    assert col.count() == n_events
    # embeddings were normalized on ingest (the invariant)
    row = col.df.select("embedding").head()
    import math

    assert math.isclose(
        sum(x * x for x in row[0]), 1.0, abs_tol=1e-5
    )


def test_stream_dedup_drops_redeliveries(spark, tmp_path, sf_dir):
    """dropDuplicatesWithinWatermark: duplicated event_ids across files
    collapse to one row each."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "dup_stream"
    d.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    idx = t.schema.get_field_index("ts")
    t = t.set_column(idx, "ts", t.column("ts").cast(pa.timestamp("us"), safe=False))
    sl = t.slice(0, 200)
    pq.write_table(sl, d / "a.parquet")
    pq.write_table(sl.slice(0, 120), d / "b.parquet")  # redelivery of 120 rows
    stream = S.read_events_stream(spark, str(d))
    deduped = S.dedup_events_stream(stream)
    out = _drain_to_memory(spark, deduped, "dedup_stream", "append")
    ids = [r["event_id"] for r in out.collect()]
    assert len(ids) == 200
    assert len(set(ids)) == 200


def test_transform_with_state_high_water_mark(spark, events_dir, events_batch):
    """transformWithStateInPandas: the last emitted high-water mark per
    user equals the batch max(value). The API's state protocol needs
    protobuf, which this container lacks — skip when absent."""
    pytest.importorskip("google.protobuf.descriptor")
    from chromem_go_spark.streaming import stateful as ST

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    ST.rocksdb_conf(spark)
    try:
        stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
        out = _drain_to_memory(
            spark, ST.user_high_water_mark(stream), "hwm_stream", "update"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.desc("hwm"))
        final = (
            out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "hwm")
        )
        expected = events_batch.groupBy("user_id").agg(F.max("value").alias("hwm"))
        got = {r["user_id"]: round(r["hwm"], 6) for r in final.collect()}
        exp = {r["user_id"]: round(r["hwm"], 6) for r in expected.collect()}
        assert got == exp
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_standing_queries_stream_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static similarity alerting: documents arrive as a file
    stream and are scored against broadcast standing queries; the
    streaming result equals the identical batch plan (stateless op)."""
    import shutil

    src = f"{sf_dir}/embeddings.parquet"
    d = tmp_path / "emb_stream"
    d.mkdir()
    shutil.copy(src, d / "part-000.parquet")

    emb_batch = spark.read.parquet(str(d))
    # two standing queries: vectors of vec_id 0 and 9, normalized
    from chromem_go_spark.functions import vector as V

    qrows = emb_batch.filter(F.col("vec_id").isin(0, 9)).select(
        F.col("vec_id").cast("string").alias("query_id"),
        V.normalize_if_needed("embedding").cast("array<double>").alias("query_vec"),
    )
    queries = spark.createDataFrame(qrows.collect(), qrows.schema)

    expect = {
        (r["query_id"], r["vec_id"], round(r["similarity"], 6))
        for r in S.match_standing_queries(
            emb_batch, queries, threshold=0.6, id_col="vec_id"
        ).collect()
    }
    assert expect  # the query vectors match themselves at sim 1.0

    stream = (
        spark.readStream.schema(emb_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = S.match_standing_queries(stream, queries, threshold=0.6, id_col="vec_id")
    got_df = _drain_to_memory(spark, out, "standing_q", "append")
    got = {
        (r["query_id"], r["vec_id"], round(r["similarity"], 6))
        for r in got_df.collect()
    }
    assert got == expect


def test_incremental_neardup_matches_batch(spark, tmp_path, sf_dir):
    """Incremental (streaming-shaped) near-dup detection: documents
    arrive in two batches; the accumulated pair log equals one-shot
    minhash_lsh_pairs over the full corpus (same signatures, banding,
    and exact verification — candidates against history come from the
    bucket state, not a recompute)."""
    from chromem_go_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert expect

    state = str(tmp_path / "neardup_state")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    S.incremental_neardup_batch(b1, state, threshold=0.5, batch_id=0)
    # a replayed batch must be idempotent (foreachBatch is at-least-once)
    S.incremental_neardup_batch(b1, state, threshold=0.5, batch_id=0)
    S.incremental_neardup_batch(b2, state, threshold=0.5, batch_id=1)
    S.incremental_neardup_batch(b2, state, threshold=0.5, batch_id=1)
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in spark.read.parquet(f"{state}/pairs").collect()
    }
    assert got == expect


def test_incremental_neardup_compaction(spark, tmp_path, sf_dir):
    """With ``compact_after`` small, committed-history ``__batch=N``
    partitions fold into the reserved ``__batch=-1`` partition; results
    stay identical to the one-shot batch run, replay of the current
    batch stays idempotent, and the partition count is bounded instead
    of growing one per micro-batch."""
    import os

    from chromem_go_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }

    state = str(tmp_path / "neardup_compact")
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    for bid, b in enumerate(batches):
        S.incremental_neardup_batch(
            b, state, threshold=0.5, batch_id=bid, compact_after=2
        )
    # replay the LAST batch after compaction ran — must stay idempotent
    S.incremental_neardup_batch(
        batches[-1], state, threshold=0.5, batch_id=3, compact_after=2
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in spark.read.parquet(f"{state}/pairs").collect()
    }
    assert got == expect
    for tbl in ("buckets", "shingles", "pairs"):
        parts = [
            p for p in os.listdir(f"{state}/{tbl}") if p.startswith("__batch=")
        ]
        # bounded: compacted history + at most compact_after recents
        assert len(parts) <= 2 + 2, (tbl, parts)
        assert "__batch=-1" in parts, (tbl, parts)


def test_incremental_neardup_stream_sink(spark, tmp_path, sf_dir):
    """The foreachBatch wrapper drives the same incremental state from a
    file stream (one file per micro-batch)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    d = tmp_path / "docs_stream"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "docs-000.parquet")
    pq.write_table(t.slice(half), d / "docs-001.parquet")

    docs_batch = spark.read.parquet(str(d))
    from chromem_go_spark.operators import dedup as D

    expect = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(docs_batch, threshold=0.5).collect()
    }
    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    state = str(tmp_path / "sink_state")
    writer = S.incremental_neardup_sink(
        stream, state, str(tmp_path / "ckpt"), threshold=0.5
    )
    S.run_available_now(writer)
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(f"{state}/pairs").collect()
    }
    assert got == expect


def test_soak_incremental_neardup_manifest_mode(spark, tmp_path, sf_dir):
    """Soak: ~30 micro-batches through the incremental near-dup state
    with aggressive compaction in MANIFEST commit mode (the
    object-store-safe protocol), a replayed batch mid-run (restart
    semantics), and a simulated crash window (uncommitted generation
    dir) injected between folds.  Invariants: final pair log equals the
    one-shot LSH run, state partition count stays bounded, and the
    manifest names the live generation."""
    import json
    import os

    from chromem_go_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }

    n_batches = 30
    state = str(tmp_path / "soak_state")
    for bid in range(n_batches):
        b = docs.filter(F.col("doc_id") % n_batches == bid)
        S.incremental_neardup_batch(
            b, state, threshold=0.5, batch_id=bid,
            compact_after=4, commit_mode="manifest",
        )
        if bid == 14:
            # restart: the same batch redelivered after a crash
            S.incremental_neardup_batch(
                b, state, threshold=0.5, batch_id=bid,
                compact_after=4, commit_mode="manifest",
            )
        if bid == 20:
            # crash window: a stale uncommitted generation dir appears
            # (fold died before its manifest commit); readers must
            # ignore it and the next fold must replace it.  The stale
            # dir is the generation that is NOT the committed base.
            man_path = os.path.join(state, "pairs", "_base_manifest.json")
            base_id = -99
            if os.path.exists(man_path):
                with open(man_path) as f:
                    base_id = int(json.load(f)["base"].split("=")[1])
            stale_gen = -4 if base_id != -4 else -3
            stale = spark.read.parquet(f"{state}/pairs").limit(2)
            (
                stale.withColumn("__batch", F.lit(stale_gen))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch")
                .parquet(f"{state}/pairs")
            )

    from chromem_go_spark.batchstate import read_live

    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in read_live(spark, f"{state}/pairs").collect()
    }
    assert got == expect
    for tbl in ("buckets", "shingles", "pairs"):
        parts = [p for p in os.listdir(f"{state}/{tbl}") if p.startswith("__batch=")]
        # bounded: one live generation + at most compact_after recents
        # (+1 for a not-yet-folded current, +1 stale pre-GC dir)
        assert len(parts) <= 4 + 3, (tbl, parts)
        man = os.path.join(state, tbl, "_base_manifest.json")
        assert os.path.exists(man), tbl
        with open(man) as f:
            base = json.load(f)["base"]
        assert base in parts, (tbl, base, parts)


def test_interval_join_binned_stream_matches_batch(spark, events_dir, events_batch):
    """Stream-static binned interval join: streamed events match static
    incident windows; stateless (event bin is a pure projection, the
    window side is static), so streaming output equals the batch plan."""
    from chromem_go_spark.operators.events import interval_join_binned

    ev = events_batch
    windows = ev.filter(F.col("event_id") % 25 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").cast("double").alias("lo_epoch"),
        (F.col("ts").cast("double") + 120.0).alias("hi_epoch"),
    )
    windows = spark.createDataFrame(windows.collect(), windows.schema)

    def key(rows):
        return {(r["window_id"], r["event_id"]) for r in rows}

    expect = key(interval_join_binned(ev, windows, bin_seconds=120.0).collect())
    assert expect

    stream = S.read_events_stream(spark, events_dir)
    out = interval_join_binned(stream, windows, bin_seconds=120.0)
    got = key(_drain_to_memory(spark, out, "interval_join", "append").collect())
    assert got == expect


def test_join_within_stream_stream_matches_batch(spark, events_dir, events_batch):
    """Watermarked stream-stream join: click -> purchase of the same
    user within 30 minutes; the streaming inner join (both sides
    watermarked, time-bounded condition) yields exactly the batch
    result once drained."""
    from chromem_go_spark.streaming.ingest import join_within

    def key(rows):
        return {(r["user_id"], r["left_id"], r["right_id"]) for r in rows}

    expect = key(
        join_within(
            events_batch, events_batch, within_seconds=1800,
            left_type="click", right_type="purchase",
        ).collect()
    )
    assert expect  # the sf corpus has click->purchase sequences

    sa = S.read_events_stream(spark, events_dir)
    sb = S.read_events_stream(spark, events_dir)
    out = join_within(
        sa, sb, within_seconds=1800, left_type="click", right_type="purchase"
    )
    got = key(_drain_to_memory(spark, out, "join_within", "append").collect())
    assert got == expect


# ------------------------------------------- incremental semantic dedup


def _semantic_oneshot_pairs(spark, emb, state_dir, threshold):
    """One-shot within-cluster pair enumeration with the SAME frozen
    centroids the incremental path uses — the parity reference."""
    import numpy as np

    from chromem_go_spark.functions import vector as V
    from chromem_go_spark.operators.ann import _assign_clusters

    crows = spark.read.parquet(f"{state_dir}/centroids").collect()
    cents = np.asarray(
        [r["centroid"] for r in sorted(crows, key=lambda r: r["cluster_id"])],
        dtype=np.float64,
    )
    assigned = _assign_clusters(emb.select("vec_id", "embedding"), cents, "embedding")
    a = assigned.select(
        F.col("vec_id").alias("id_a"), "cluster_id", F.col("embedding").alias("va")
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), "cluster_id", F.col("embedding").alias("vb")
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", V.cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def test_incremental_semantic_dedup_matches_oneshot(spark, tmp_path):
    """The union of per-batch pair logs equals the one-shot
    within-cluster enumeration, including a mid-run replayed batch
    (idempotence) and a fold compaction."""
    from chromem_go_spark.batchstate import read_live
    from chromem_go_spark.streaming.ingest import (
        incremental_semantic_dedup_batch,
        init_semantic_state,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    state = str(tmp_path / "sem_state")
    thr = 0.3
    init_semantic_state(emb, state, n_clusters=4)

    n_batches = 5
    for bid in range(n_batches):
        b = emb.filter(F.col("vec_id") % n_batches == bid)
        incremental_semantic_dedup_batch(
            b, state, threshold=thr, batch_id=bid, compact_after=3
        )
        if bid == 2:  # at-least-once redelivery replaces, never duplicates
            incremental_semantic_dedup_batch(
                b, state, threshold=thr, batch_id=bid, compact_after=3
            )

    got = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in read_live(spark, f"{state}/pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in _semantic_oneshot_pairs(spark, emb, state, thr).collect()
    }
    assert got == want
    assert len(want) > 0  # discriminative at this threshold
    # vector state holds every ingested vector exactly once
    n_state = read_live(spark, f"{state}/vectors").count()
    assert n_state == emb.count()


def test_semantic_dedup_sink_stream(spark, tmp_path):
    """The foreachBatch wrapper drives the same state from a file
    stream (one file per micro-batch)."""
    import pyarrow.parquet as pq

    from chromem_go_spark.batchstate import read_live
    from chromem_go_spark.streaming.ingest import (
        init_semantic_state,
        run_available_now,
        semantic_dedup_sink,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    state = str(tmp_path / "sem_state")
    init_semantic_state(emb, state, n_clusters=4)

    t = pq.read_table(f"{sf}/embeddings.parquet")
    d = tmp_path / "vec_stream"
    d.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "v0.parquet")
    pq.write_table(t.slice(half), d / "v1.parquet")

    stream = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    writer = semantic_dedup_sink(
        stream.select("vec_id", "embedding"),
        state,
        str(tmp_path / "ckpt"),
        threshold=0.3,
    )
    run_available_now(writer)
    got = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in read_live(spark, f"{state}/pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in _semantic_oneshot_pairs(spark, emb, state, 0.3).collect()
    }
    assert got == want


def test_value_anomaly_stream_matches_batch(spark, tmp_path, sf_dir):
    """Frozen-baseline streaming anomalies == the batch detector run
    with the same statistics (stateless stream-static join)."""
    import shutil

    from chromem_go_spark.operators.events import value_anomalies

    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "ev_stream"
    d.mkdir()
    shutil.copy(src, d / "part-000.parquet")

    ev_batch = spark.read.parquet(str(d))
    stats = spark.createDataFrame(
        S.baseline_value_stats(ev_batch).collect(),
        "event_type string, __mu double, __sigma double",
    )
    # batch twin with the SAME stats (value_anomalies trains inline on
    # the same frame, so its output is the reference)
    expect = {
        (r["event_id"], r["event_type"], r["value"], r["z"])
        for r in value_anomalies(ev_batch, z_threshold=2.0).collect()
    }
    assert expect

    stream = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = S.value_anomaly_stream(stream, stats, z_threshold=2.0)
    got_df = _drain_to_memory(spark, out, "anomaly_stream", "append")
    got = {
        (r["event_id"], r["event_type"], r["value"], r["z"])
        for r in got_df.collect()
    }
    assert got == expect


def test_soak_incremental_semantic_dedup(spark, tmp_path):
    """Soak: 12 micro-batches with two mid-run redeliveries and folds
    every 4 batches; final pair log and vector state still equal the
    one-shot enumeration (manifest commit mode)."""
    import os as _os

    from chromem_go_spark.batchstate import read_live
    from chromem_go_spark.streaming.ingest import (
        incremental_semantic_dedup_batch,
        init_semantic_state,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    state = str(tmp_path / "sem_soak")
    thr = 0.3
    init_semantic_state(emb, state, n_clusters=4)

    n_batches = 12
    for bid in range(n_batches):
        b = emb.filter(F.col("vec_id") % n_batches == bid)
        incremental_semantic_dedup_batch(
            b, state, threshold=thr, batch_id=bid,
            compact_after=4, commit_mode="manifest",
        )
        if bid in (3, 8):  # at-least-once redeliveries
            incremental_semantic_dedup_batch(
                b, state, threshold=thr, batch_id=bid,
                compact_after=4, commit_mode="manifest",
            )

    got = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in read_live(spark, f"{state}/pairs").collect()
    }
    want = {
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in _semantic_oneshot_pairs(spark, emb, state, thr).collect()
    }
    assert got == want and want
    assert read_live(spark, f"{state}/vectors").count() == emb.count()
    # folds actually ran: batch dirs stay bounded
    parts = [d for d in _os.listdir(f"{state}/pairs") if d.startswith("__batch=")]
    assert len(parts) <= 6, parts


def test_incremental_gram_index_matches_batch(spark, tmp_path, sf_dir):
    """Streaming-maintained $contains posting index: documents arrive
    in two batches (with a replayed batch — at-least-once); the live
    candidate set equals the one-shot batch index's for every pattern,
    and the indexed filter still returns exactly the scan filter's
    rows."""
    from chromem_go_spark.operators import textindex as TI

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full_idx = TI.build_gram_index(docs, text_col="text", id_col="doc_id")

    idx_dir = str(tmp_path / "gram_state")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    S.incremental_gram_index_batch(b1, idx_dir, text_col="text", batch_id=0)
    S.incremental_gram_index_batch(b1, idx_dir, text_col="text", batch_id=0)
    S.incremental_gram_index_batch(b2, idx_dir, text_col="text", batch_id=1)

    for pattern in ("spark", "join", "zzqxv__nope"):
        want = {
            r["id"]
            for r in TI.contains_candidates(full_idx, pattern).collect()
        }
        got = {
            r["id"]
            for r in S.gram_candidates_live(
                spark, idx_dir, pattern
            ).collect()
        }
        assert got == want, pattern
    assert S.gram_candidates_live(spark, idx_dir, "ab") is None


def test_gram_index_sink_and_compaction(spark, tmp_path, sf_dir):
    """The foreachBatch wrapper + aggressive folding: many micro-batch
    partitions collapse into the reserved base while candidates stay
    exact (duplicate postings dedup in the intersection's
    count_distinct)."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    d = tmp_path / "gram_docs_stream"
    d.mkdir()
    third = t.num_rows // 3
    pq.write_table(t.slice(0, third), d / "docs-000.parquet")
    pq.write_table(t.slice(third, third), d / "docs-001.parquet")
    pq.write_table(t.slice(2 * third), d / "docs-002.parquet")

    docs_batch = spark.read.parquet(str(d))
    from chromem_go_spark.operators import textindex as TI

    full_idx = TI.build_gram_index(
        docs_batch, text_col="text", id_col="doc_id"
    )
    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    idx_dir = str(tmp_path / "gram_sink_state")
    writer = S.gram_index_sink(
        stream, idx_dir, str(tmp_path / "gram_ckpt"),
        text_col="text", compact_after=2,
    )
    S.run_available_now(writer)
    want = {
        r["id"] for r in TI.contains_candidates(full_idx, "spark").collect()
    }
    got = {
        r["id"]
        for r in S.gram_candidates_live(spark, idx_dir, "spark").collect()
    }
    assert got == want and want
    # folding kept the partition count bounded
    parts = [p for p in os.listdir(idx_dir) if p.startswith("__batch=")]
    assert len(parts) <= 3, parts

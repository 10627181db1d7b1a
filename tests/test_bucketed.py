"""Bucketed persistent collections: upserts must rewrite ONLY the hash
buckets containing touched ids (dynamic partition overwrite), and all
CRUD semantics must be identical to the flat layout."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from chromem_go_spark import DB, Document


def _bucket_files(data_path):
    out = {}
    for d in glob.glob(os.path.join(data_path, "bucket=*")):
        files = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
        out[os.path.basename(d)] = files
    return out


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    db = DB.new_persistent(spark, str(tmp_path / "db"))
    c = db.create_collection("kb", n_buckets=8)
    c.add_documents(
        [Document(str(i), {"k": str(i)}, [1.0, 0.0], f"doc {i}") for i in range(64)]
    )
    data = c._data_path()
    before = _bucket_files(data)
    assert len(before) > 4  # ids spread over buckets

    # upsert ONE id -> exactly one bucket's files may change
    c.add_document(Document("7", {"k": "updated"}, [0.0, 1.0], "doc 7 v2"))
    after = _bucket_files(data)
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1, f"buckets rewritten: {changed}"

    # semantics: upsert took effect, nothing else lost
    assert c.count() == 64
    got = c.get_by_id("7")
    assert got.metadata == {"k": "updated"}
    assert got.content == "doc 7 v2"


def test_bucketed_reload_and_query(spark, tmp_path):
    path = str(tmp_path / "db2")
    db = DB.new_persistent(spark, path)
    c = db.create_collection("kb", n_buckets=4)
    c.add_documents(
        [Document(str(i), {}, [float(i + 1), 1.0], f"doc {i}") for i in range(10)]
    )
    # reload from disk: n_buckets restored from metadata, data intact
    db2 = DB.new_persistent(spark, path)
    c2 = db2.get_collection("kb")
    assert c2.n_buckets == 4
    assert c2.count() == 10
    res = c2.query_embedding([1.0, 0.1], 3).collect()
    assert len(res) == 3
    # delete works on the bucketed layout (full rewrite path)
    c2.delete(ids=["0", "1"])
    assert c2.count() == 8


def test_bucketed_point_lookup_prunes_partitions(spark, tmp_path):
    """get_by_id on a bucketed collection should let Spark prune to one
    bucket partition when filtered on the bucket value."""
    db = DB.new_persistent(spark, str(tmp_path / "db3"))
    c = db.create_collection("kb", n_buckets=8)
    c.add_documents(
        [Document(str(i), {}, [1.0, 0.0], f"doc {i}") for i in range(32)]
    )
    from chromem_go_spark.plans.explain import formatted_plan

    raw = spark.read.parquet(c._data_path())
    pruned = raw.filter(
        F.col("bucket")
        == F.pmod(F.xxhash64(F.lit("7")), F.lit(8)).cast("int")
    ).filter(F.col("id") == "7")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan

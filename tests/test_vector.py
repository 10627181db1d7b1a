import math

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.functions import vector as V


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [
            ("a", [0.1, 0.2, 0.3]),
            ("b", [0.2, 0.3, 0.4]),
            ("norm", [-0.40824828, 0.40824828, 0.81649655]),
            ("zeroish", [1.0, 0.0, 0.0]),
        ],
        "id string, v array<float>",
    )


def test_dot(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>")
    got = df.select(V.dot("a", "b").alias("d")).head()[0]
    assert got == pytest.approx(32.0)


def test_norm_and_is_normalized(vec_df):
    rows = {r["id"]: r for r in vec_df.select(
        "id", V.norm("v").alias("n"), V.is_normalized("v").alias("ok")
    ).collect()}
    assert rows["a"]["n"] == pytest.approx(math.sqrt(0.01 + 0.04 + 0.09), rel=1e-6)
    assert rows["norm"]["ok"] is True
    assert rows["zeroish"]["ok"] is True
    assert rows["a"]["ok"] is False


def test_normalize_matches_reference_constant(vec_df):
    # normalize([-0.1, 0.1, 0.2]) == [-0.40824828, 0.40824828, 0.81649655]
    # (reference collection_test.go:17-20 stub-embedding constant)
    got = V.normalize_vec([-0.1, 0.1, 0.2])
    assert got == pytest.approx([-0.40824828, 0.40824828, 0.81649655], abs=1e-6)


def test_normalize_column(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<float>")
    got = df.select(V.normalize("v").alias("n")).head()[0]
    assert got == pytest.approx([0.6, 0.8])
    # normalize_if_needed leaves normalized vectors untouched
    got2 = df.select(V.normalize_if_needed(V.normalize("v")).alias("n")).head()[0]
    assert got2 == pytest.approx([0.6, 0.8])


def test_cosine_similarity(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 2.0]), ([1.0, 1.0], [2.0, 2.0])], "a array<float>, b array<float>")
    got = [r[0] for r in df.select(V.cosine_similarity("a", "b")).collect()]
    assert got[0] == pytest.approx(0.0, abs=1e-9)
    assert got[1] == pytest.approx(1.0, rel=1e-9)


def test_subtract_vec_mismatch():
    with pytest.raises(ValueError, match="vectors must have the same length"):
        V.subtract_vec([1.0], [1.0, 2.0])


def test_hoisted_norm(spark):
    # Bit-identical to norm() on non-null vectors, 0.0 (not null) on a
    # null vector, and statically non-nullable — so a join referencing
    # the hoisted column never grows an inferred isnotnull(sqrt(agg))
    # clone of the O(d) aggregate at the scan.
    df = spark.createDataFrame(
        [("a", [3.0, 4.0]), ("nul", None)], "id string, v array<float>"
    )
    out = df.select("id", V.norm("v").alias("n"), V.hoisted_norm("v").alias("h"))
    assert not out.schema["h"].nullable
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["h"] == rows["a"]["n"] == pytest.approx(5.0)
    assert rows["nul"]["n"] is None and rows["nul"]["h"] == 0.0


def test_hoisted_norm_pairs_match_cosine_similarity(spark):
    # embedding_neardup_pairs-shaped check: the hoisted-norm join drops
    # null-vector rows exactly like inline cosine_similarity would
    # (null dot -> null cosine -> filtered), and keeps the same doubles.
    from chromem_go_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None), (4, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_neardup_pairs(df, threshold=0.5).collect()
    }
    a = df.selectExpr("vec_id id_a", "embedding va")
    b = df.selectExpr("vec_id id_b", "embedding vb")
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", V.cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= 0.5)
        .collect()
    }
    assert got == want and (1, 2) in got and all(3 not in k for k in got)

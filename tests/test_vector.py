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

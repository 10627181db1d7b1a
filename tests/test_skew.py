"""salted_join must be row-identical to the plain join, hot keys or not."""

from __future__ import annotations

from pyspark.sql import functions as F

from chromem_go_spark.operators.skew import salted_join


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_inner_join_matches_plain(spark):
    # hot key: 'a' carries 90% of the fact side
    fact = spark.createDataFrame(
        [("a", i) for i in range(900)] + [("b", i) for i in range(80)]
        + [("c", i) for i in range(20)] + [("zzz", 1)],  # unmatched key
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0), ("unused", 0.0)],
        "k string, w double",
    )
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8)
    cols = ["k", "v", "w"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [("a", 1), ("a", 2), ("miss", 3)], "k string, v int"
    )
    dim = spark.createDataFrame([("a", 1.5)], "k string, w double")
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", n_salts=4, how="left")
    cols = ["k", "v", "w"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([("a", i) for i in range(1000)], "k string, v int")
    # the internal salt column must take >1 value for one hot key
    from chromem_go_spark.operators import skew as S

    salted = fact.withColumn(
        "s", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int")
    )
    n_buckets = salted.select("s").distinct().count()
    assert n_buckets > 4

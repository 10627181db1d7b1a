import pytest
from pyspark.sql import functions as F

from chromem_go_spark.functions import text as T


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and it was good."),
            (2, "Der Hund ist nicht mit der Katze und die Maus."),
            (3, "   "),
            (4, "ab"),
            (5, "!!! ??? ,,,"),
        ],
        "doc_id long, text string",
    )


def collect_map(df, col):
    return {r["doc_id"]: r["out"] for r in df.select("doc_id", col.alias("out")).collect()}


def test_token_count(df):
    m = collect_map(df, T.token_count("text"))
    assert m[1] == 13
    assert m[3] == 0
    assert m[4] == 1


def test_lang_id(df):
    m = collect_map(df, T.lang_id("text"))
    assert m[1] == "en"
    assert m[2] == "de"
    assert m[3] == "und"


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    m = collect_map(d, T.fingerprint("text"))
    assert m[1] == m[2]
    assert m[1] != m[3]


def test_char_shingles(spark):
    d = spark.createDataFrame([(1, "abcdef"), (2, "ab")], "doc_id long, text string")
    m = collect_map(d, T.char_shingles("text", 3))
    assert m[1] == ["abc", "bcd", "cde", "def"]
    assert m[2] == []


def test_quality_score_bounds(df):
    m = collect_map(df, T.quality_score("text"))
    assert all(0.0 <= v <= 1.0 for v in m.values())
    assert m[1] > m[5]  # prose beats punctuation soup


def test_word_tokens(spark):
    d = spark.createDataFrame([(1, "Hello, world 42!")], "doc_id long, text string")
    m = collect_map(d, T.word_tokens("text"))
    assert m[1] == ["hello", ",", "world", "42", "!"]

"""TF-IDF term weighting over a distributed corpus.

Beyond the reference (chromem-go only stores embeddings it is given;
it has no lexical scoring, SURVEY §2.4).  TF-IDF is the classical
lexical retrieval/feature path, and on Spark it is pure aggregation
shape: term frequencies and document frequencies are two
map-side-combined groupBys over the exploded token table, and the
per-document top-k is one window.

- :func:`tfidf_topk_terms` — the oracle-checkable statistics: each
  document's ``top_n`` terms by tf * idf with the sklearn-style
  smoothed idf ``ln((N+1)/(df+1)) + 1`` (never negative, never
  divides by zero).
- :func:`tfidf_vectors` — hashed TF-IDF document vectors
  (feature-hashing into ``dim`` buckets via the portable md5-60 token
  hash), L2-normalized ``array<float>`` — directly consumable by the
  kNN/ANN engine, which is the point: lexical similarity search rides
  the same vector path as embeddings.

Scale: the token table is O(total_tokens) rows but every shuffle after
it is vocabulary- or doc-shaped; nothing touches Python.  The corpus
size N is a single driver-side count (one scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def _term_freqs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token, tf): per-document term counts over the regex word
    tokenizer.  One shuffle, map-side combined."""
    toks = df.select(id_col, F.explode(T.word_tokens(text_col)).alias("token"))
    return toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk_terms(
    df: DataFrame,
    top_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Each document's ``top_n`` highest tf*idf terms.

    idf is the smoothed ``ln((N+1)/(df+1)) + 1`` (sklearn's
    ``smooth_idf``), with df = number of documents containing the term.
    Deterministic order inside a doc: (score desc, token asc).
    Returns (id, token, tf, df_docs, score, rank)."""
    n_docs = df.count()
    tf = _term_freqs(df, text_col, id_col)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(dfreq, "token").withColumn(
        "score",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df_docs") + 1)) + 1.0),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            id_col,
            "token",
            "tf",
            "df_docs",
            F.round("score", 4).alias("score"),
            "rank",
        )
    )


def tfidf_vectors(
    df: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed TF-IDF document vectors: feature-hash each term into one
    of ``dim`` buckets with the portable md5-60 hash, accumulate tf*idf
    per bucket, L2-normalize.  Returns (id, embedding array<float>) —
    the same shape the kNN/ANN operators consume, so lexical similarity
    search plugs straight into the vector engine.

    Shape: token-shaped shuffle for tf, vocabulary-shaped for df, then
    one doc-keyed aggregation building the dense array from a
    (bucket -> weight) map — no Python, no per-row UDFs.

    Contract: documents whose text tokenizes to nothing yield NO output
    row (a zero vector has no meaningful direction to normalize) —
    filter or left-join accordingly downstream."""
    n_docs = df.count()
    tf = _term_freqs(df, text_col, id_col)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long") % dim
    ).cast("int")
    weighted = (
        tf.join(dfreq, "token")
        .withColumn(
            "w",
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df_docs") + 1)) + 1.0),
        )
        .groupBy(id_col, bucket.alias("b"))
        .agg(F.sum("w").alias("w"))
    )
    entries = weighted.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("b", "w"))).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("m", i.cast("int")), F.lit(0.0)),
    )
    norm = F.sqrt(F.aggregate(dense, F.lit(0.0), lambda acc, x: acc + x * x))
    return entries.select(
        id_col,
        F.transform(dense, lambda x: (x / norm).cast("float")).alias("embedding"),
    )


def idf_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(token, df_docs, idf): the corpus idf model — broadcastable to
    score new documents without rescanning the corpus."""
    n_docs = df.count()
    tf = _term_freqs(df, text_col, id_col)
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"),
        (F.log(F.lit(float(n_docs + 1)) / (F.count(F.lit(1)) + 1)) + 1.0).alias("idf"),
    )


__all__ = ["tfidf_topk_terms", "tfidf_vectors", "idf_table"]

"""Document sources: load external data into the collection schema.

The reference's examples ingest JSONL (optionally gzipped) — e.g.
reference examples/rag-wikipedia-ollama/main.go:63-95 reads a .jsonl.gz
of {text, category}; examples/semantic-search-arxiv-openai/main.go:43-75
reads arXiv JSON. Spark's readers handle JSONL/CSV/Parquet (and their
compressed forms) natively with predicate pushdown and schema pruning;
these helpers only map arbitrary source columns onto the fixed document
schema (id, metadata map, embedding, content — SURVEY §1.2).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..document import DOCUMENT_SCHEMA


def to_document_df(
    df: DataFrame,
    id_col: str | None = None,
    content_col: str = "text",
    metadata_cols: Sequence[str] | None = None,
    embedding_col: str | None = None,
) -> DataFrame:
    """Project any DataFrame onto the document schema.

    - ``id_col=None`` derives a stable id from the content hash (md5) —
      re-ingesting identical rows upserts instead of duplicating.
    - ``metadata_cols`` become entries of the string->string map column.
    - ``embedding_col=None`` leaves embeddings empty (ingest computes
      them via the collection's embedding func / pandas UDF).
    """
    id_expr = (
        F.col(id_col).cast("string")
        if id_col
        else F.md5(F.coalesce(F.col(content_col).cast("string"), F.lit("")))
    )
    meta_cols = list(metadata_cols or [])
    if meta_cols:
        pairs = []
        for c in meta_cols:
            pairs.append(F.lit(c))
            pairs.append(F.col(c).cast("string"))
        meta_expr = F.create_map(*pairs)
    else:
        meta_expr = F.create_map().cast("map<string,string>")
    emb_expr = (
        F.col(embedding_col).cast("array<float>")
        if embedding_col
        else F.array().cast("array<float>")
    )
    return df.select(
        id_expr.alias("id"),
        meta_expr.alias("metadata"),
        emb_expr.alias("embedding"),
        F.coalesce(F.col(content_col).cast("string"), F.lit("")).alias("content"),
    )


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    id_col: str | None = None,
    content_col: str = "text",
    metadata_cols: Sequence[str] | None = None,
    embedding_col: str | None = None,
    schema: str | None = None,
) -> DataFrame:
    """JSON-lines (plain or .gz — Spark decompresses by extension)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return to_document_df(
        reader.json(path), id_col, content_col, metadata_cols, embedding_col
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    id_col: str | None = None,
    content_col: str = "text",
    metadata_cols: Sequence[str] | None = None,
    header: bool = True,
) -> DataFrame:
    return to_document_df(
        spark.read.option("header", str(header).lower()).csv(path),
        id_col,
        content_col,
        metadata_cols,
    )


def read_documents_parquet(
    spark: SparkSession,
    path: str,
    id_col: str | None = None,
    content_col: str = "text",
    metadata_cols: Sequence[str] | None = None,
    embedding_col: str | None = None,
) -> DataFrame:
    return to_document_df(
        spark.read.parquet(path), id_col, content_col, metadata_cols, embedding_col
    )


def read_documents_orc(
    spark: SparkSession,
    path: str,
    id_col: str | None = None,
    content_col: str = "text",
    metadata_cols: Sequence[str] | None = None,
    embedding_col: str | None = None,
) -> DataFrame:
    """ORC (Spark-native reader: predicate pushdown + column pruning,
    same as parquet)."""
    return to_document_df(
        spark.read.orc(path), id_col, content_col, metadata_cols, embedding_col
    )


def read_documents_text(
    spark: SparkSession,
    path: str,
    mode: str = "file",
    metadata_from_path: bool = True,
) -> DataFrame:
    """Raw text corpus source — the most common LLM-pipeline ingest
    shape (one document per FILE, or per LINE for line-delimited dumps).

    - ``mode="file"``: ``spark.read.text(..., wholetext=True)`` — each
      file is one document; scales to millions of files because the
      listing and reads are distributed.
    - ``mode="line"``: one document per non-empty line.
    - ids are content-md5 (stable across re-ingest: identical text
      upserts rather than duplicating); with ``metadata_from_path`` the
      source file path lands in ``metadata['source']`` for provenance.
    """
    if mode not in ("file", "line"):
        raise ValueError(f"unknown mode: {mode!r}")
    df = spark.read.text(path, wholetext=(mode == "file"))
    if mode == "line":
        df = df.filter(F.length(F.trim(F.col("value"))) > 0)
    df = df.withColumn("source", F.input_file_name())
    out = to_document_df(
        df,
        id_col=None,
        content_col="value",
        metadata_cols=["source"] if metadata_from_path else None,
    )
    return out


def write_documents(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_cols: Sequence[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write a document-schema DataFrame out as a dataset (the sink half
    of the source mapping — parquet/orc/json/csv; csv cannot carry the
    map/array columns and drops them with a clear contract)."""
    out = df
    if fmt == "csv":
        out = df.select("id", "content")  # csv: scalar columns only
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    getattr(w, fmt)(path)

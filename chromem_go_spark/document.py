"""The Document row model (reference document.go:9-17).

Fixed schema — the reference has no DDL and exactly four column types
(SURVEY §1.2). A collection is a DataFrame with this schema; a Document
is one row of it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    MapType,
    StringType,
    StructField,
    StructType,
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("metadata", MapType(StringType(), StringType()), nullable=True),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
        StructField("content", StringType(), nullable=True),
    ]
)

# Query results carry the document columns plus a similarity score
# (reference collection.go:398-408).
RESULT_COLUMNS = ["id", "metadata", "embedding", "content", "similarity"]


@dataclass
class Document:
    """One row (reference document.go:9-17). ``embedding`` may be empty, in
    which case the collection's embedding function fills it at add time
    (reference document.go:28-53)."""

    id: str
    metadata: dict[str, str] = field(default_factory=dict)
    embedding: list[float] = field(default_factory=list)
    content: str = ""

    def as_row(self) -> tuple:
        return (
            self.id,
            dict(self.metadata or {}),
            [float(x) for x in (self.embedding or [])] or None,
            self.content,
        )


def new_document(id: str, metadata=None, embedding=None, content="", embedding_func=None) -> Document:
    """Constructor with eager embedding (reference document.go:28-53):
    if no embedding is given and content is set, compute it."""
    if not id:
        raise ValueError("id is empty")
    if not embedding and not content:
        raise ValueError("either embedding or content must be filled")
    emb = list(embedding or [])
    if not emb and embedding_func is not None:
        emb = list(embedding_func(content))
    return Document(id=id, metadata=dict(metadata or {}), embedding=emb, content=content)

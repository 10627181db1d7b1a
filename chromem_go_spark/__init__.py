"""chromem_go_spark — a PySpark-native engine with the query and data
model of philippgille/chromem-go (vector search + filters + CRUD +
persistence), extended with the operators a large-scale training-data
pipeline needs (dedup, ANN, text analysis, streaming ingest).

Reference citations throughout point into the read-only snapshot at
/root/reference (philippgille/chromem-go).
"""

from .collection import DEFAULT_N_BUCKETS, Collection
from .db import DB
from .document import DOCUMENT_SCHEMA, Document, new_document
from .materialize import disable_reliable_checkpoints, enable_reliable_checkpoints
from .session import get_spark

__all__ = [
    "DB",
    "Collection",
    "Document",
    "DOCUMENT_SCHEMA",
    "DEFAULT_N_BUCKETS",
    "new_document",
    "get_spark",
    "enable_reliable_checkpoints",
    "disable_reliable_checkpoints",
]

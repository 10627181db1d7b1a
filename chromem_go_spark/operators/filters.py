"""The reference's filter DSL as Catalyst predicates.

Semantics from reference query.go:133-163:
- ``where``: conjunctive exact-equality on metadata entries; a missing
  key is a non-match (query.go:135-141).
- ``where_document``: ``$contains`` / ``$not_contains`` substring
  predicates on the content column; any other operator is rejected with
  the golden error string "unsupported operator" (query.go:14,
  collection.go:513-518).

Expressed declaratively so Catalyst pushes the cheap predicates below
the expensive similarity projection (the reference hand-orders this at
collection.go:521; Spark's PushDownPredicates does it for free) and down
to the Parquet scan when the filter hits a top-level column.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference query.go:14
SUPPORTED_FILTERS = ("$contains", "$not_contains")


def validate_where_document(where_document: Mapping[str, str] | None) -> None:
    """Operator whitelist (reference collection.go:513-518, 348-352)."""
    if not where_document:
        return
    for k in where_document:
        if k not in SUPPORTED_FILTERS:
            raise ValueError("unsupported operator")


def where_predicate(where: Mapping[str, str] | None, metadata_col: str = "metadata") -> Column:
    """AND-fold of metadata[k] == v. ``element_at`` on a missing key yields
    NULL, and NULL == v filters out the row — matching the reference's
    zero-value-compare behavior for missing keys (query.go:135-141)."""
    pred = F.lit(True)
    if not where:
        return pred
    for k, v in where.items():
        pred = pred & (F.element_at(F.col(metadata_col), F.lit(k)) == F.lit(v))
    return pred


def where_document_predicate(
    where_document: Mapping[str, str] | None, content_col: str = "content"
) -> Column:
    """$contains / $not_contains on the content column
    (reference query.go:145-160)."""
    validate_where_document(where_document)
    pred = F.lit(True)
    if not where_document:
        return pred
    for op, v in where_document.items():
        contains = F.col(content_col).contains(F.lit(v))
        if op == "$contains":
            pred = pred & contains
        else:  # $not_contains
            pred = pred & ~contains
    return pred


def combined_predicate(
    where: Mapping[str, str] | None,
    where_document: Mapping[str, str] | None,
    metadata_col: str = "metadata",
    content_col: str = "content",
) -> Column:
    """Full pre-filter (reference filterDocs query.go:87-129): metadata AND
    content predicates, applied before any similarity scoring."""
    return where_predicate(where, metadata_col) & where_document_predicate(
        where_document, content_col
    )

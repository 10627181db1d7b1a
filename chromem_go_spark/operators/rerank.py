"""Second-stage reranking with a pluggable (query, doc) cross scorer.

The production retrieval stack is retrieve-then-rerank: a cheap first
stage (BM25 / cosine / hybrid — all in operators/hybrid.py) produces a
bounded candidate set, and a cross-encoder scores each (query, doc)
PAIR jointly for the final ordering.  This module supplies the Spark
side of that stage: Arrow-batched scoring over the bounded candidates,
deterministic ranking, a pluggable scorer.

The container ships no torch/transformers, so the default scorer is a
deterministic lexical-overlap surrogate (token-F1 — the same stub
pattern as the multimodal codecs: the plumbing — batching, schema,
ordering, integration — is real and tested; production swaps in e.g. a
sentence-transformers CrossEncoder predict function with the same
``(query, docs) -> scores`` signature).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_f1_scorer(query: str, docs: "Sequence[str]") -> list[float]:
    """Deterministic surrogate scorer: token-set F1 between query and
    doc (the overlap signal a real cross-encoder learns to refine)."""
    import re

    tok = lambda t: set(re.findall(r"[a-z]+|[0-9]+", t.lower()))  # noqa: E731
    q = tok(query)
    out = []
    for d in docs:
        dt = tok(d)
        inter = len(q & dt)
        if not inter:
            out.append(0.0)
            continue
        p, r = inter / len(dt), inter / len(q)
        out.append(2 * p * r / (p + r))
    return out


def cross_encoder_rerank(
    candidates: DataFrame,
    query_text: str,
    k: int = 10,
    scorer: Callable[[str, Sequence[str]], Sequence[float]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rerank a BOUNDED first-stage candidate frame with a cross
    scorer.  ``scorer(query, docs) -> scores`` runs once per Arrow
    batch inside ``mapInPandas`` (exactly how a GPU cross-encoder
    batches), ranks are deterministic (score desc, id asc), and the
    top ``k`` rows return as (id, ce_score, ce_rank).

    Scale contract: the input must already be first-stage-bounded
    (top-N per query, N ~ 100s) — cross scoring is O(candidates), the
    expensive model makes that the whole point of the two-stage
    design."""
    import pandas as pd

    fn = scorer or token_f1_scorer
    id_type = candidates.schema[id_col].dataType.simpleString()

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ce_score": [float(s) for s in fn(query_text, list(pdf[text_col]))],
                }
            )

    scored = candidates.select(id_col, text_col).mapInPandas(
        score, f"{id_col} {id_type}, ce_score double"
    )
    w = Window.orderBy(F.desc("ce_score"), id_col)
    return (
        scored.withColumn("ce_rank", F.row_number().over(w))
        .filter(F.col("ce_rank") <= int(k))
        .select(id_col, F.round("ce_score", 4).alias("ce_score"), "ce_rank")
    )

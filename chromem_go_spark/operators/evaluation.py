"""Retrieval-quality evaluation: recall@k, MRR@k, nDCG@k over ranked
result lists vs relevance judgments.

Beyond the reference (chromem-go has no eval surface): the measurement
harness every retrieval stack needs — compare rankers (BM25 vs cosine
vs hybrid vs ANN probes) on the same judged queries.  All pure
aggregations/windows: one shuffle on query_id to assemble per-query
frames, one tiny aggregate for the macro summary.  Metric definitions
are the standard public TREC forms (binary or graded relevance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval metrics at cutoff ``k``.

    ``results``: (query, doc, rank) with rank 1-based; ``qrels``:
    (query, doc, rel) graded relevance (>0 = relevant).  Returns one
    row per judged query: ``(query_col, n_rel, recall, mrr, ndcg)``.
    Queries with judgments but no results score 0 on all metrics;
    ranks beyond ``k`` are ignored.

    - recall@k = |retrieved@k ∩ relevant| / |relevant|
    - MRR@k = 1 / rank of the first relevant result (0 if none)
    - nDCG@k = Σ rel_i/log2(rank_i+1) / IDCG@k (graded, standard form)
    """
    res = results.filter(F.col(rank_col) <= int(k)).select(
        query_col, doc_col, rank_col
    )
    rel = qrels.filter(F.col(rel_col) > 0).select(query_col, doc_col, rel_col)

    hits = res.join(rel, [query_col, doc_col]).select(
        query_col,
        F.col(rank_col).alias("__rank"),
        F.col(rel_col).cast("double").alias("__rel"),
    )
    per_q_hits = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("__n_hits"),
        F.min("__rank").alias("__first_rank"),
        F.sum(F.col("__rel") / F.log2(F.col("__rank") + 1)).alias("__dcg"),
    )
    # ideal DCG: the query's relevance grades sorted descending, placed
    # at ranks 1..min(k, n_rel)
    w = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), doc_col
    )
    ideal = (
        rel.withColumn("__irank", F.row_number().over(w))
        .filter(F.col("__irank") <= int(k))
        .groupBy(query_col)
        .agg(
            F.sum(
                F.col(rel_col).cast("double") / F.log2(F.col("__irank") + 1)
            ).alias("__idcg")
        )
    )
    n_rel = rel.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))
    return (
        n_rel.join(ideal, query_col)
        .join(per_q_hits, query_col, "left")
        .select(
            query_col,
            "n_rel",
            F.round(
                F.coalesce(F.col("__n_hits"), F.lit(0)) / F.col("n_rel"), 4
            ).alias("recall"),
            F.round(
                F.coalesce(1.0 / F.col("__first_rank"), F.lit(0.0)), 4
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"), 4
            ).alias("ndcg"),
        )
    )


def macro_metrics(per_query: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Macro-averaged summary of :func:`ranking_metrics` output: one
    row (n_queries, recall, mrr, ndcg) — the headline numbers."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("recall"),
        F.round(F.avg("mrr"), 4).alias("mrr"),
        F.round(F.avg("ndcg"), 4).alias("ndcg"),
    )

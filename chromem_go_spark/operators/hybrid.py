"""Hybrid (lexical + vector) search with reciprocal-rank fusion.

Beyond the reference (chromem-go is vector-only; hybrid keyword+vector
retrieval is the standard production upgrade).  Two independent
rankers — an idf-weighted keyword score and cosine similarity — fuse
by RRF (Cormack et al. 2009): ``score = Σ 1/(rrf_k + rank_i)``, the
rank-space fusion that needs no score normalization between
incommensurable rankers.

Shape: each ranker is a TakeOrdered top-N over its own projection
(lexical: explode query terms -> semi-join the inverted doc-term table
-> sum idf, vocabulary-shaped; vector: the same scan `knn_single`
uses); the fusion joins two k-row frames — driver-scale.  Everything
is Catalyst expressions; determinism via (score desc, id asc) ranks in
both rankers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vector as V


def lexical_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """idf-weighted keyword score per doc: for each DISTINCT query term
    present in the doc, add ``ln((N+1)/(df+1)) + 1``.  (BM25-lite:
    presence x idf, no tf/length normalization — the replayable core.)
    Returns (id, lex_score) for docs matching at least one term.

    Pass ``n_docs`` when the corpus size is already known (e.g. a
    served Collection tracking its count) — otherwise this runs one
    count() job per call, an extra corpus scan on uncached inputs."""
    if n_docs is None:
        n_docs = docs.count()
    terms = sorted(set(query_terms))
    toks = docs.select(
        id_col, F.explode(F.array_distinct(T.word_tokens(text_col))).alias("tok")
    ).filter(F.col("tok").isin(terms))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1.0
    return (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(F.sum(idf).alias("lex_score"))
    )


def hybrid_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k documents by RRF over the lexical and vector rankings.

    Each ranker contributes its top-``depth`` candidates; a doc absent
    from one ranking simply gets no contribution from it (standard
    RRF).  Returns (id, rrf_score, lex_rank, vec_rank) — null rank
    means the doc was outside that ranker's depth.  Deterministic:
    both rankings and the final order break ties by id."""
    qv = V.normalize_vec(list(query_vec))
    # Each ranker: TakeOrdered top-depth FIRST (distributed bounded
    # heaps), THEN rank the <=depth surviving rows — the unpartitioned
    # row_number window only ever sees the tiny frame, never the corpus.
    lex = lexical_scores(docs, query_terms, text_col, id_col, n_docs=n_docs)
    lex_top = (
        lex.orderBy(F.desc("lex_score"), id_col)
        .limit(int(depth))
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.desc("lex_score"), id_col)),
        )
        .select(id_col, "lex_rank")
    )
    sim = V.dot(vec_col, V.query_vector_lit(qv))
    vec_top = (
        docs.select(id_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(int(depth))
        .withColumn(
            "vec_rank",
            F.row_number().over(Window.orderBy(F.desc("sim"), id_col)),
        )
        .select(id_col, "vec_rank")
    )
    fused = lex_top.join(vec_top, id_col, "full_outer")
    contrib = lambda r: F.when(  # noqa: E731
        F.col(r).isNotNull(), 1.0 / (F.lit(int(rrf_k)) + F.col(r))
    ).otherwise(F.lit(0.0))
    return (
        fused.withColumn("rrf_score", F.round(contrib("lex_rank") + contrib("vec_rank"), 6))
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(int(k))
        .select(id_col, "rrf_score", "lex_rank", "vec_rank")
    )


def mmr_rerank(
    docs: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    fetch_k: int = 50,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein
    1998): fetch the top ``fetch_k`` by cosine, then greedily pick k
    results maximizing ``lam * sim(query) - (1-lam) * max sim(chosen)``
    — relevance with redundancy penalized, the standard diversity knob
    for RAG retrieval.

    Scale shape: the distributed part is the TakeOrdered top-``fetch_k``
    scan (the same plan as knn_single); the greedy loop is inherently
    sequential and runs driver-side over the fetch_k collected vectors
    (bounded, small).  Deterministic: ties break by id at both stages.
    Returns (id, similarity, mmr_score, mmr_rank)."""
    import numpy as np

    qv = np.asarray(V.normalize_vec(list(query_vec)), dtype=np.float64)
    sim = V.dot(vec_col, V.query_vector_lit(list(qv)))
    top = (
        docs.select(id_col, vec_col, sim.alias("similarity"))
        .orderBy(F.desc("similarity"), id_col)
        .limit(int(fetch_k))
        .collect()
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, similarity double, mmr_score double, mmr_rank int"
    )
    if not top:
        return docs.sparkSession.createDataFrame([], out_schema)
    ids = [r[id_col] for r in top]
    sims = np.array([float(r["similarity"]) for r in top])
    mat = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in top])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    chosen: list[int] = []
    scores: list[float] = []
    remaining = list(range(len(top)))
    while remaining and len(chosen) < int(k):
        if not chosen:
            mmr = lam * sims[remaining]
        else:
            red = (mat[remaining] @ mat[chosen].T).max(axis=1)
            mmr = lam * sims[remaining] - (1.0 - lam) * red
        # argmax with deterministic id tiebreak
        best = min(
            range(len(remaining)), key=lambda i: (-mmr[i], ids[remaining[i]])
        )
        chosen.append(remaining[best])
        scores.append(float(mmr[best]))
        remaining.pop(best)
    rows = [
        (ids[c], float(sims[c]), round(s, 6), i + 1)
        for i, (c, s) in enumerate(zip(chosen, scores))
    ]
    return docs.sparkSession.createDataFrame(rows, out_schema)


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Full Robertson/Lucene BM25 per document for a term query —
    the production upgrade of :func:`lexical_scores` (which is the
    presence×idf core): term-frequency saturation (k1) and document
    length normalization (b) included.

    ``score = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))``
    with Lucene's ``idf = ln(1 + (N−df+0.5)/(df+0.5))``.

    Returns (id, bm25) for docs matching ≥1 term.  Shape: the token
    explode is filtered to the query's terms immediately (the surviving
    stream is query-vocabulary-sized, not corpus-sized); df/avgdl are
    one bounded aggregation each; everything else is expressions."""
    if n_docs is None:
        n_docs = docs.count()
    terms = sorted(set(query_terms))
    toks = docs.select(
        id_col, F.explode(T.word_tokens(text_col)).alias("tok")
    ).filter(F.col("tok").isin(terms))
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    lens = docs.select(
        id_col, F.size(T.word_tokens(text_col)).alias("dl")
    )
    avgdl = lens.agg(F.avg("dl")).collect()[0][0] or 1.0
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(float(avgdl))
    )
    contrib = idf * F.col("tf") * F.lit(float(k1 + 1)) / norm
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(lens, id_col)
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("bm25"))
    )


def prf_expand_terms(
    docs: DataFrame,
    query_terms: Sequence[str],
    fb_docs: int = 10,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> list[str]:
    """Pseudo-relevance feedback term selection (Rocchio/RM3 family,
    public method): run BM25, take the top ``fb_docs``, score every
    term in them by ``(Σ tf over the feedback set) × idf`` (the same
    ln((N+1)/(df+1))+1 idf the lexical ranker uses), and return the
    original terms plus the top ``fb_terms`` new ones (ties by term).
    Terms appearing in more than ``max_df_frac`` of the corpus are
    excluded — the standard stopword guard; without it a ubiquitous
    term's raw tf swamps the idf damping.

    Driver-side output is a bounded term list (|query| + fb_terms) —
    the model a served expansion cache would hold; both jobs are
    corpus scans with query-vocabulary- or feedback-set-sized
    shuffles."""
    if n_docs is None:
        n_docs = docs.count()
    base = bm25_scores(
        docs, query_terms, k1, b, text_col, id_col, n_docs=n_docs
    )
    fb = base.orderBy(F.desc("bm25"), id_col).limit(int(fb_docs)).select(id_col)
    toks = docs.join(F.broadcast(fb), id_col, "left_semi").select(
        id_col, F.explode(T.word_tokens(text_col)).alias("tok")
    )
    tf_fb = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf_fb"))
    # corpus df for idf (document frequency over the WHOLE corpus)
    dfreq = (
        docs.select(
            F.explode(F.array_distinct(T.word_tokens(text_col))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1.0
    orig = sorted(set(query_terms))
    picked = (
        tf_fb.join(dfreq, "tok")
        .filter(~F.col("tok").isin(orig))
        .filter(F.col("df") <= F.lit(float(max_df_frac)) * F.lit(float(n_docs)))
        .select("tok", (F.col("tf_fb") * idf).alias("score"))
        .orderBy(F.desc("score"), "tok")
        .limit(int(fb_terms))
        .collect()
    )
    return orig + sorted(r["tok"] for r in picked)


def prf_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """BM25 search with PRF expansion: expand via
    :func:`prf_expand_terms`, re-run BM25 with the widened query,
    return the top ``k`` (score desc, id)."""
    if n_docs is None:
        n_docs = docs.count()
    expanded = prf_expand_terms(
        docs, query_terms, fb_docs, fb_terms, k1, b, max_df_frac,
        text_col, id_col, n_docs,
    )
    out = bm25_scores(docs, expanded, k1, b, text_col, id_col, n_docs=n_docs)
    return out.orderBy(F.desc("bm25"), id_col).limit(int(k))

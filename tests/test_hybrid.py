import numpy as np
import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators.hybrid import hybrid_search, lexical_scores


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 8)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(20):
        if i == 1:
            v = base  # vector twin of the query
            text = "nothing lexically relevant here at all"
        elif i == 2:
            v = rng.normal(0, 1, 8)
            text = "spark vector search engine with hybrid ranking"  # lexical hit
        elif i == 3:
            v = base + rng.normal(0, 0.05, 8)  # near the query vector
            text = "hybrid vector retrieval wins"  # AND lexical hit
        else:
            v = rng.normal(0, 1, 8)
            text = f"filler document number {i} about unrelated things"
        rows.append((i, text, (v / np.linalg.norm(v)).tolist()))
    return spark.createDataFrame(rows, "doc_id long, text string, embedding array<double>"), base


def test_lexical_scores_idf_weighting(corpus):
    docs, _ = corpus
    got = {r["doc_id"]: r["lex_score"] for r in lexical_scores(docs, ["hybrid", "vector"]).collect()}
    assert set(got) == {2, 3}
    # doc 3 matches both terms, doc 2 both as well -> equal score
    assert got[2] == pytest.approx(got[3])


def test_hybrid_search_fuses_both_rankers(corpus):
    docs, qvec = corpus
    out = hybrid_search(
        docs, query_terms=["hybrid", "vector"], query_vec=list(qvec), k=5, depth=10
    ).collect()
    by = {r["doc_id"]: r for r in out}
    # doc 3 scores on BOTH rankers -> must win
    assert out[0]["doc_id"] == 3
    assert by[3]["lex_rank"] is not None and by[3]["vec_rank"] is not None
    # the vector twin and the lexical hit both make the fused top-5
    assert 1 in by and by[1]["vec_rank"] == 1 and by[1]["lex_rank"] is None
    assert 2 in by and by[2]["lex_rank"] is not None
    # deterministic order: rrf desc then id
    scores = [(r["rrf_score"], r["doc_id"]) for r in out]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))


def test_hybrid_search_rank_depth_cuts(corpus):
    docs, qvec = corpus
    out = hybrid_search(
        docs, query_terms=["hybrid"], query_vec=list(qvec), k=20, depth=3
    ).collect()
    # no rank beyond the depth appears
    for r in out:
        assert r["lex_rank"] is None or r["lex_rank"] <= 3
        assert r["vec_rank"] is None or r["vec_rank"] <= 3


def test_mmr_rerank_diversifies(spark):
    import numpy as np

    from chromem_go_spark.operators.hybrid import mmr_rerank

    # two tight clusters near the query; plain top-3 would return the
    # query-cluster trio, MMR must interleave the second cluster
    q = np.array([1.0, 0.0, 0.0])
    a1 = np.array([0.999, 0.04, 0.0]); a2 = np.array([0.999, 0.041, 0.0])
    a3 = np.array([0.999, 0.042, 0.0])
    b1 = np.array([0.8, 0.0, 0.6])
    rows = [(i, (v / np.linalg.norm(v)).tolist()) for i, v in
            [(1, a1), (2, a2), (3, a3), (4, b1)]]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")

    out = mmr_rerank(df, list(q), k=3, fetch_k=4, lam=0.5).collect()
    got = [r["doc_id"] for r in out]
    assert got[0] == 1                       # most relevant first
    assert 4 in got[:2] or 4 in got          # the off-cluster doc makes top-3
    assert [r["mmr_rank"] for r in out] == [1, 2, 3]
    # scores non-increasing is NOT guaranteed by MMR, but relevance of
    # rank-1 must be the global max
    assert out[0]["similarity"] == max(r["similarity"] for r in out)


def test_mmr_rerank_lam1_equals_plain_topk(spark):
    import numpy as np

    from chromem_go_spark.operators.hybrid import mmr_rerank
    from chromem_go_spark.operators.knn import knn_single

    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(0, 1, 6).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    q = rng.normal(0, 1, 6)
    plain = [r["doc_id"] for r in knn_single(df, list(q), 5, id_col="doc_id", assume_normalized=False).collect()]
    # lam=1 removes the redundancy term entirely -> pure relevance order.
    # Note mmr_rerank scores RAW dot products (like knn with
    # assume_normalized=True) so normalize the corpus first for parity.
    rows_n = [(i, (np.array(v) / np.linalg.norm(v)).tolist()) for i, v in rows]
    dfn = spark.createDataFrame(rows_n, "doc_id long, embedding array<double>")
    plain_n = [r["doc_id"] for r in knn_single(dfn, list(q), 5, id_col="doc_id").collect()]
    mmr = [r["doc_id"] for r in mmr_rerank(dfn, list(q), k=5, fetch_k=30, lam=1.0).collect()]
    assert mmr == plain_n
    assert len(plain) == 5  # sanity on the unnormalized variant too


def test_collection_query_mmr(spark):
    from chromem_go_spark import DB
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    db = DB(spark)
    c = db.create_collection("mmr", embedding_func=make_hash_embedding_func(16))
    c.add(
        ["a", "b", "c"],
        contents=["alpha beta gamma", "alpha beta gamma", "totally different text"],
    )
    out = c.query_mmr("alpha beta", 3)
    rows = out.collect()
    assert len(rows) == 3 and [r["mmr_rank"] for r in rows] == [1, 2, 3]


def test_hybrid_search_no_keyword_matches_is_vector_only(corpus):
    docs, qvec = corpus
    out = hybrid_search(
        docs, query_terms=["zzzznonexistent"], query_vec=list(qvec), k=3, depth=5
    ).collect()
    assert len(out) == 3
    assert all(r["lex_rank"] is None for r in out)
    assert out[0]["doc_id"] == 1  # pure vector order: the twin wins


def test_bm25_saturation_and_length_norm(spark):
    """tf saturation: doubling tf must NOT double the score; length
    norm: same tf in a longer doc scores lower."""
    from chromem_go_spark.operators.hybrid import bm25_scores

    pad = " ".join(["filler"] * 50)
    docs = spark.createDataFrame(
        [
            (1, "spark " + pad),
            (2, "spark spark " + pad),                 # 2x tf
            (3, "spark " + pad + " " + pad),           # same tf, 2x length
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert out[2] > out[1]                   # more tf, higher
    assert out[2] < 2 * out[1]               # but saturated
    assert out[3] < out[1]                   # longer doc, lower


def test_bm25_matches_hand_formula(spark):
    import math

    from chromem_go_spark.operators.hybrid import bm25_scores

    docs = spark.createDataFrame(
        [(1, "a b c spark"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["spark"]).collect()}
    # N=2, df=1, dl=4, avgdl=4; idf=ln(1 + 1.5/1.5)=ln 2
    want = math.log(2) * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 4 / 4))
    assert abs(out[1] - want) < 1e-9
    assert 2 not in out


def test_ivf_search_filtered_matches_flat(spark):
    import os

    from pyspark.sql import functions as F

    from chromem_go_spark.operators import ann as A
    from chromem_go_spark.operators import knn as K

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    idx = A.IVFIndex.build(emb, n_clusters=4, vec_col="embedding", id_col="vec_id")
    qv = [float(x) for x in emb.filter("vec_id = 2").head()["embedding"]]
    got = [
        (r["vec_id"], round(r["similarity"], 5))
        for r in idx.search_filtered(
            qv, 5, nprobe=4, where=F.col("label") % 2 == 0
        ).collect()
    ]
    want = [
        (r["vec_id"], round(r["similarity"], 5))
        for r in K.knn_single(
            emb.filter(F.col("label") % 2 == 0), qv, 5,
            vec_col="embedding", id_col="vec_id",
        ).collect()
    ]
    assert got == want
    # allowed_ids variant composes with the predicate path
    allow = emb.filter(F.col("vec_id") < 100).select("vec_id")
    got_ids = {
        r["vec_id"]
        for r in idx.search_filtered(qv, 5, nprobe=4, allowed_ids=allow).collect()
    }
    assert all(i < 100 for i in got_ids)


def test_ranking_metrics_hand_checked(spark):
    """Known tiny case: q1 retrieves [d1(rel), d2, d3(rel)] of 3
    relevant docs; q2 retrieves nothing relevant."""
    import math

    from chromem_go_spark.operators.evaluation import macro_metrics, ranking_metrics

    results = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
         ("q2", "d9", 1)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d3", 1), ("q1", "d7", 1),
         ("q2", "d5", 1)],
        "query_id string, doc_id string, rel int",
    )
    out = {r["query_id"]: r for r in ranking_metrics(results, qrels, k=10).collect()}
    assert out["q1"]["n_rel"] == 3
    assert out["q1"]["recall"] == round(2 / 3, 4)
    assert out["q1"]["mrr"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert out["q1"]["ndcg"] == round(dcg / idcg, 4)
    assert out["q2"]["recall"] == 0.0 and out["q2"]["mrr"] == 0.0 and out["q2"]["ndcg"] == 0.0
    m = macro_metrics(ranking_metrics(results, qrels, k=10)).collect()[0]
    assert m["n_queries"] == 2
    # macro averages the (rounded) per-query values — compare loosely
    assert abs(m["recall"] - (2 / 3) / 2) < 1e-3


def test_ranking_metrics_graded_relevance(spark):
    """Graded rels: ideal ordering uses the grades; a perfect ranking
    scores ndcg=1."""
    from chromem_go_spark.operators.evaluation import ranking_metrics

    results = spark.createDataFrame(
        [("q", "hi", 1), ("q", "mid", 2), ("q", "lo", 3)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", "hi", 3), ("q", "mid", 2), ("q", "lo", 1)],
        "query_id string, doc_id string, rel int",
    )
    r = ranking_metrics(results, qrels, k=10).collect()[0]
    assert r["ndcg"] == 1.0 and r["recall"] == 1.0 and r["mrr"] == 1.0


def test_prf_expansion_pulls_cooccurring_terms(spark):
    """Terms frequent in the feedback docs (but absent from the query)
    get added; the expanded search then surfaces docs matching only
    those co-occurring terms."""
    from chromem_go_spark.operators.hybrid import prf_expand_terms, prf_search

    pad = " ".join(["filler"] * 30)
    rows = (
        # relevant cluster: 'spark' docs also discuss 'shuffle'
        [(i, f"spark shuffle tuning {pad}") for i in range(5)]
        # doc with only the co-occurring term
        + [(50, f"shuffle mechanics deep dive {pad}")]
        # noise (enough of it that 'shuffle' clears the df stopword cut)
        + [(100 + i, f"gardening tips {pad}") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expanded = prf_expand_terms(docs, ["spark"], fb_docs=5, fb_terms=2)
    assert "spark" in expanded and "shuffle" in expanded
    hits = {r["doc_id"] for r in prf_search(docs, ["spark"], k=6, fb_docs=5, fb_terms=2).collect()}
    assert 50 in hits  # reachable only via the expansion
    assert not any(h >= 100 for h in hits)


def test_cross_encoder_rerank_two_stage(spark):
    """retrieve-then-rerank: BM25 narrows, the cross scorer reorders —
    the doc with the best joint overlap wins even if its BM25 rank was
    lower; a custom scorer plugs in with the same signature."""
    from chromem_go_spark.operators.hybrid import bm25_scores
    from chromem_go_spark.operators.rerank import cross_encoder_rerank

    pad = " ".join(["filler"] * 40)
    docs = spark.createDataFrame(
        [
            (1, f"spark spark spark spark {pad}"),          # tf-stuffed
            (2, f"how to tune spark shuffle partitions {pad}"),  # best joint match
            (3, f"gardening {pad}"),
        ],
        "doc_id long, text string",
    )
    q = "tune spark shuffle partitions"
    first = bm25_scores(docs, ["spark", "shuffle"]).join(docs, "doc_id")
    out = cross_encoder_rerank(first, q, k=2)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [2, 1]
    assert [r["ce_rank"] for r in rows] == [1, 2]
    # custom scorer: reverse preference by doc_id
    rev = cross_encoder_rerank(
        first, q, k=3, scorer=lambda q_, ds: [float(len(d)) * 0 + i for i, d in enumerate(ds)]
    )
    assert len(rev.collect()) <= 3  # plumbing accepts any scorer shape

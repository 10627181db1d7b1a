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

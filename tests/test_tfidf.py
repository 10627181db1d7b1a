import numpy as np
import pytest

from chromem_go_spark.operators.tfidf import idf_table, tfidf_topk_terms, tfidf_vectors


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine parquet"),
            (3, "rare unicorn token"),
            (4, "engine engine parquet parquet"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_topk_scores_and_order(corpus):
    rows = tfidf_topk_terms(corpus, top_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 'spark' tf=3 df=2 beats 'engine' tf=1 df=3
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert d1[0]["token"] == "spark" and d1[0]["tf"] == 3 and d1[0]["df_docs"] == 2
    expected = 3 * (np.log(5.0 / 3.0) + 1.0)
    assert d1[0]["score"] == pytest.approx(expected, abs=1e-4)
    # doc 3's rare tokens score higher than any common token would
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["df_docs"] == 1
    # deterministic tie-break: equal scores order by token
    assert [r["token"] for r in d3] == sorted([r["token"] for r in d3])


def test_tfidf_vectors_unit_norm_and_similarity(corpus):
    vecs = {r["doc_id"]: np.array(r["embedding"]) for r in tfidf_vectors(corpus, dim=32).collect()}
    assert set(vecs) == {1, 2, 3, 4}
    for v in vecs.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    # lexically overlapping docs are closer than disjoint ones
    sim = lambda a, b: float(vecs[a] @ vecs[b])
    assert sim(1, 2) > sim(1, 3)
    assert sim(2, 4) > sim(4, 3)


def test_idf_table_broadcastable_model(corpus):
    m = {r["token"]: r for r in idf_table(corpus).collect()}
    assert m["spark"]["df_docs"] == 2
    assert m["unicorn"]["df_docs"] == 1
    assert m["unicorn"]["idf"] > m["engine"]["idf"]


def test_tfidf_vectors_drive_knn_lexical_search(spark):
    """Lexical similarity search end-to-end: hashed TF-IDF vectors feed
    the same TakeOrderedAndProject kNN path as embeddings."""
    from chromem_go_spark.operators.knn import knn_single
    from chromem_go_spark.operators.tfidf import tfidf_vectors

    docs = spark.createDataFrame(
        [
            (1, "spark query engine with adaptive execution"),
            (2, "spark query engine with vectorized execution"),
            (3, "gardening tips for tomato plants in summer"),
            (4, "tomato plants love warm summer weather"),
        ],
        "doc_id long, text string",
    )
    vecs = tfidf_vectors(docs, dim=64)
    qv = [r["embedding"] for r in vecs.filter("doc_id = 1").collect()][0]
    got = [r["doc_id"] for r in knn_single(vecs, list(qv), 2, id_col="doc_id").collect()]
    assert got[0] == 1          # self first
    assert got[1] == 2          # lexical twin beats the gardening docs

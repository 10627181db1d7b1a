import numpy as np
import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators import knn
from chromem_go_spark.functions import vector as V


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def brute_topk(ids, mat, qv, k):
    qv = np.asarray(qv, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    sims = mat @ qv
    order = np.lexsort((ids, -sims))[:k]
    return [(int(ids[i]), float(sims[i])) for i in order]


def test_knn_single_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    qv = mat[0]
    expect = brute_topk(ids, mat, qv, 10)
    got = knn.knn_single(emb, list(qv), 10, vec_col="embedding", id_col="vec_id").select(
        "vec_id", "similarity"
    ).collect()
    assert [(r["vec_id"], pytest.approx(r["similarity"], abs=1e-9)) for r in got] == [
        (i, pytest.approx(s, abs=1e-9)) for i, s in expect
    ]
    assert got[0]["vec_id"] == 0  # self-similarity tops


def test_knn_expr_and_block_agree(spark, emb, emb_np):
    ids, mat = emb_np
    qids = [str(i) for i in range(4)]
    qvecs = mat[:4]
    queries = spark.createDataFrame(
        [(qids[j], [float(x) for x in qvecs[j]]) for j in range(4)],
        "query_id string, query_vec array<double>",
    )
    a = knn.knn_expr(emb, queries, 5, vec_col="embedding", id_col="vec_id")
    b = knn.knn_block(emb, qids, qvecs, 5, vec_col="embedding", id_col="vec_id")
    ra = sorted((r["query_id"], r["vec_id"]) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"]) for r in b.collect())
    assert ra == rb
    for qid in qids:
        expect = sorted(i for i, _ in brute_topk(ids, mat, mat[int(qid)], 5))
        got = [i for q, i in rb if q == qid]
        assert got == expect


def test_knn_validation_errors(emb):
    with pytest.raises(ValueError, match="queryEmbedding is empty"):
        knn.knn_single(emb, [], 5)
    with pytest.raises(ValueError, match="nResults must be > 0"):
        knn.knn_single(emb, [1.0, 2.0], 0)


def test_negative_subtract_ranking():
    q = [1.0, 0.0]
    neg = [0.0, 1.0]
    out = knn.negative_subtract_query(q, neg)
    assert out == pytest.approx([0.70710678, -0.70710678], abs=1e-6)


def test_negative_filter(emb, emb_np):
    ids, mat = emb_np
    qv, neg = mat[0], mat[1]
    got = knn.knn_negative_filter(
        emb, list(qv), list(neg), 10, vec_col="embedding", id_col="vec_id"
    ).collect()
    # every surviving doc has sim(neg) <= 0.5
    neg_sims = mat @ (neg / np.linalg.norm(neg))
    keep = {int(i) for i, s in zip(ids, neg_sims) if s <= 0.5}
    assert all(r["vec_id"] in keep for r in got)
    assert len(got) == 10


def test_knn_expr_filtered_dsl(spark):
    """Full per-query DSL: metadata-equality map + contains/not_contains,
    each query with different filters, verified against a Python replay."""
    docs_rows = [
        (1, [1.0, 0.0], "en", 1, "the quick brown fox"),
        (2, [0.9, 0.1], "en", 2, "spark engines are fast"),
        (3, [0.0, 1.0], "de", 1, "der schnelle braune fuchs"),
        (4, [0.5, 0.5], "de", 2, "spark und parquet zusammen"),
        (5, [0.8, 0.2], "en", 1, "lazy dogs sleep all day"),
    ]
    docs = spark.createDataFrame(
        docs_rows, "id long, embedding array<double>, lang string, label int, text string"
    )
    q_rows = [
        ("all", [1.0, 0.0], None, None, None),                      # no filters
        ("en_only", [1.0, 0.0], {"lang": "en"}, None, None),
        ("en1", [1.0, 0.0], {"lang": "en", "label": "1"}, None, None),
        ("has_spark", [1.0, 0.0], None, ["spark"], None),
        ("no_spark_de", [0.0, 1.0], {"lang": "de"}, None, ["spark"]),
        ("badkey", [1.0, 0.0], {"nope": "x"}, None, None),          # unknown key -> no rows
        ("empty", [1.0, 0.0], {}, [], []),                          # empty = match all
    ]
    queries = spark.createDataFrame(
        q_rows,
        "query_id string, query_vec array<double>, q_where map<string,string>, "
        "q_contains array<string>, q_not_contains array<string>",
    )
    out = knn.knn_expr_filtered_dsl(
        docs, queries, 3, filterable_cols=["lang", "label"], text_col="text"
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])

    def replay(where, contains, not_contains):
        keep = set()
        for id_, _, lang, label, text in docs_rows:
            meta = {"lang": lang, "label": str(label)}
            if where and any(k not in ("lang", "label") or meta[k] != v for k, v in where.items()):
                continue
            if contains and any(s not in text for s in contains):
                continue
            if not_contains and any(s in text for s in not_contains):
                continue
            keep.add(id_)
        return keep

    for qid, _, where, contains, not_contains in q_rows:
        expect = replay(where, contains, not_contains)
        # k=3 cap: compare membership against the top-3 of the replay set
        assert got.get(qid, set()) <= expect, qid
        assert len(got.get(qid, set())) == min(3, len(expect)), qid
    assert "badkey" not in got  # unknown where-key matches nothing


def test_knn_expr_filtered_dsl_metadata_map(spark):
    """The same DSL against a map<string,string> metadata column (the
    Collection document model) instead of flat columns."""
    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], {"lang": "en"}, "alpha beta"),
            (2, [0.9, 0.1], {"lang": "de"}, "gamma delta"),
            (3, [0.0, 1.0], {}, "epsilon"),
        ],
        "id long, embedding array<double>, metadata map<string,string>, text string",
    )
    queries = spark.createDataFrame(
        [
            ("de", [1.0, 0.0], {"lang": "de"}, None, None),
            ("miss", [1.0, 0.0], {"lang": "fr"}, None, None),
        ],
        "query_id string, query_vec array<double>, q_where map<string,string>, "
        "q_contains array<string>, q_not_contains array<string>",
    )
    out = knn.knn_expr_filtered_dsl(
        docs, queries, 5, metadata_col="metadata", text_col="text"
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    assert got == {"de": {2}}  # doc 3 has no lang key -> non-match


def test_dsl_where_without_surface_matches_nothing(spark):
    """A non-empty q_where with NO metadata surface configured must
    match nothing (silently ignoring a filter would return wrong rows);
    empty/null filters still match everything."""
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [
            ("filtered", [1.0, 0.0], {"lang": "en"}, None, None),
            ("open", [1.0, 0.0], None, None, None),
            ("empty", [1.0, 0.0], {}, None, None),
        ],
        "query_id string, query_vec array<double>, q_where map<string,string>, "
        "q_contains array<string>, q_not_contains array<string>",
    )
    out = knn.knn_expr_filtered_dsl(docs, queries, 5)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["id"])
    assert "filtered" not in got
    assert got["open"] == {1, 2}
    assert got["empty"] == {1, 2}
    # same rule for contains filters without a text surface
    q2 = spark.createDataFrame(
        [("c", [1.0, 0.0], None, ["spark"], None)],
        "query_id string, query_vec array<double>, q_where map<string,string>, "
        "q_contains array<string>, q_not_contains array<string>",
    )
    assert knn.knn_expr_filtered_dsl(docs, q2, 5).count() == 0


def test_knn_block_float32_matches_float64_ids(spark):
    """On well-separated data the float32 kernel returns the same
    ids/ordering as the oracle-exact float64 mode; scores agree to
    ~1e-6 relative; unknown precision rejects."""
    import numpy as np
    import pytest as _pytest

    from chromem_go_spark.operators.knn import knn_block

    rng = np.random.default_rng(21)
    mat = rng.standard_normal((300, 64))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v.astype(np.float32).tolist()) for i, v in enumerate(mat)],
        "id long, embedding array<float>",
    )
    qs = [mat[0].tolist(), mat[7].tolist()]
    r64 = knn_block(df, ["a", "b"], qs, 5, vec_col="embedding").collect()
    r32 = knn_block(df, ["a", "b"], qs, 5, vec_col="embedding", precision="float32").collect()
    assert [(r["query_id"], r["id"]) for r in r64] == [
        (r["query_id"], r["id"]) for r in r32
    ]
    for a, b in zip(r64, r32):
        assert abs(a["similarity"] - b["similarity"]) < 1e-5
    with _pytest.raises(ValueError, match="precision"):
        knn_block(df, ["a"], [qs[0]], 5, vec_col="embedding", precision="f16")


def test_knn_block_negative_matches_single_path(spark, sf_dir):
    """The GEMM kernel's in-batch negative filter == the single-query
    expression path (knn_negative_filter) per query — the two
    implementations of reference query.go:221-231 must agree."""
    from pyspark.sql import functions as F

    from chromem_go_spark.operators import knn as K

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = (
        emb.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    )
    neg = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 9).head()["embedding"]
    ]
    out = K.knn_block(
        emb,
        [str(r["vec_id"]) for r in qrows],
        [list(r["embedding"]) for r in qrows],
        5,
        vec_col="embedding",
        id_col="vec_id",
        negative_vec=neg,
        negative_threshold=0.5,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(
            (r["vec_id"], round(r["similarity"], 6))
        )
    for qr in qrows:
        single = {
            (r["vec_id"], round(r["similarity"], 6))
            for r in K.knn_negative_filter(
                emb, list(qr["embedding"]), neg, 5,
                threshold=0.5, vec_col="embedding", id_col="vec_id",
            ).collect()
        }
        assert got[str(qr["vec_id"])] == single

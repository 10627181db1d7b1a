"""Property-based tests (hypothesis): invariants of the vector and text
expression layer, checked through Spark against NumPy/Python references.
One Spark job per property run would be slow, so each property collects
its whole example batch in a single DataFrame pass."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chromem_go_spark.functions import text as T
from chromem_go_spark.functions import vector as V

VEC = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=2,
    max_size=8,
)


@settings(max_examples=20, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(st.lists(VEC.filter(lambda v: sum(x * x for x in v) > 1e-9), min_size=1, max_size=8))
def test_normalize_gives_unit_norm(spark, vecs):
    dim = len(vecs[0])
    vecs = [v[:dim] + [0.0] * (dim - len(v)) for v in vecs]
    vecs = [v for v in vecs if sum(x * x for x in v) > 1e-9]
    if not vecs:
        return
    df = spark.createDataFrame([(v,) for v in vecs], "v array<float>")
    out = df.select(V.normalize_if_needed("v").alias("n")).collect()
    for r in out:
        assert math.isclose(
            math.sqrt(sum(x * x for x in r["n"])), 1.0, abs_tol=1e-4
        )


@settings(max_examples=20, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(VEC, VEC), min_size=1, max_size=8))
def test_dot_matches_numpy(spark, pairs):
    pairs = [(a[: len(b)], b[: len(a)]) for a, b in pairs]
    pairs = [(a, b) for a, b in pairs if len(a) == len(b) and len(a) >= 2]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "a array<float>, b array<float>")
    out = df.select(V.dot(F.col("a"), F.col("b")).alias("d")).collect()
    for (a, b), r in zip(pairs, out):
        expected = float(np.dot(np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)))
        assert r["d"] == pytest.approx(expected, rel=1e-4, abs=1e-3)


TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")),
    max_size=200,
)


@settings(max_examples=15, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=1, max_size=10))
def test_text_invariants(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        T.token_count("t").alias("n_tok"),
        T.alpha_ratio("t").alias("alpha"),
        T.punct_ratio("t").alias("punct"),
        T.quality_score("t").alias("q"),
        T.fingerprint("t").alias("fp"),
        T.normalized_text("t").alias("norm"),
    ).collect()
    import re

    # Java regex \s is ASCII-only; Python str.split()/strip() are
    # Unicode-aware (e.g. U+2007 figure space). Mirror the engine's
    # actual (Java) semantics in the reference implementation.
    ascii_ws = r"[ \t\n\x0b\f\r]+"
    for t, r in zip(texts, out):
        assert r["n_tok"] >= 0
        assert 0.0 <= r["alpha"] <= 1.0
        assert 0.0 <= r["punct"] <= 1.0
        assert 0.0 <= r["q"] <= 1.0
        assert len(r["fp"]) == 32  # md5 hex
        # normalization is idempotent under ASCII-whitespace collapsing
        assert re.sub(ascii_ws, " ", r["norm"]).strip(" ") == r["norm"]
        # ASCII-whitespace-only/empty text has zero tokens
        if not re.sub(ascii_ws, "", t):
            assert r["n_tok"] == 0


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(st.lists(TEXT, min_size=2, max_size=6))
def test_fingerprint_equality_iff_normalized_equality(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        T.normalized_text("t").alias("norm"), T.fingerprint("t").alias("fp")
    ).collect()
    seen: dict[str, str] = {}
    for r in rows:
        if r["norm"] in seen:
            assert seen[r["norm"]] == r["fp"]
        seen[r["norm"]] = r["fp"]
    # distinct normalized texts -> distinct fingerprints
    by_fp: dict[str, str] = {}
    for r in rows:
        if r["fp"] in by_fp:
            assert by_fp[r["fp"]] == r["norm"]
        by_fp[r["fp"]] = r["norm"]


@settings(max_examples=15, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(alphabet="ab \nxyz.", max_size=120), min_size=1, max_size=10))
def test_repetition_bounds_and_python_parity(spark, texts):
    """line/ngram repetition: always in [0, 1), 0 for empty, and equal
    to the direct Python computation of the same definition."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select(
        "i",
        T.line_repetition("t").alias("lr"),
        T.ngram_repetition("t", 2).alias("nr"),
    ).collect()
    import re

    for r in rows:
        t = texts[r["i"]]
        ls = [x.strip() for x in t.split("\n")]
        ls = [x for x in ls if x]
        want_lr = 0.0 if not ls else 1 - len(set(ls)) / len(ls)
        toks = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t.lower())
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        want_nr = 0.0 if not grams else 1 - len(set(grams)) / len(grams)
        assert 0.0 <= r["lr"] < 1.0 and 0.0 <= r["nr"] < 1.0
        assert r["lr"] == pytest.approx(want_lr, abs=1e-9), (t, r["lr"], want_lr)
        assert r["nr"] == pytest.approx(want_nr, abs=1e-9), (t, r["nr"], want_nr)


@settings(max_examples=10, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.text(alphabet="ab cd", min_size=1, max_size=60)),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_pack_chunks_partitions_token_stream(spark, chunks, budget):
    """Packing is exactly the concatenate-then-split partition of each
    doc's token stream: pack p holds tokens [p*B, (p+1)*B) — verified
    against a direct Python fold, for arbitrary chunk contents/budgets."""
    from chromem_go_spark.pipeline import pack_chunks

    rows = [(doc, idx, txt) for idx, (doc, txt) in enumerate(chunks)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, chunk string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["pack_id"], r["n_tokens"])
        for r in pack_chunks(df, budget_tokens=budget).collect()
    }
    streams: dict = {}
    for doc, idx, txt in sorted(rows, key=lambda x: (x[0], x[1])):
        ntok = len(txt.split())
        p = streams.get(doc, 0)
        assert got[(doc, idx)] == (p // budget, ntok), (doc, idx, budget)
        streams[doc] = p + ntok


def test_extended_where_matches_reference_evaluator(spark):
    """Differential test for the extended filter DSL: 40 seeded-random
    filter trees over 60 random docs, Spark's compiled predicate vs a
    pure-Python Kleene-logic evaluator implementing the documented
    semantics (missing key/non-numeric -> unknown; unknown coalesces to
    False at the top and inside $not). One Spark job total: all filters
    evaluated as columns of a single select."""
    import random

    from pyspark.sql import functions as F

    from chromem_go_spark.operators.filters import extended_where_predicate

    rng = random.Random(7)
    KEYS = ["a", "b", "c"]
    VALS = ["1", "2", "x", "3.5", "-2", "zz"]

    def rand_doc(i):
        md = {k: rng.choice(VALS) for k in KEYS if rng.random() < 0.7}
        return (str(i), md)

    def rand_leaf():
        k = rng.choice(KEYS)
        r = rng.random()
        if r < 0.3:
            return {k: rng.choice(VALS)}
        if r < 0.5:
            return {k: {rng.choice(["$eq", "$ne"]): rng.choice(VALS)}}
        if r < 0.75:
            return {k: {rng.choice(["$gt", "$gte", "$lt", "$lte"]): rng.choice([0, 1.5, 3])}}
        return {k: {rng.choice(["$in", "$nin"]): rng.sample(VALS, 2)}}

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return rand_leaf()
        op = rng.choice(["$and", "$or", "$not"])
        if op == "$not":
            return {"$not": rand_tree(depth - 1)}
        return {op: [rand_tree(depth - 1) for _ in range(rng.randint(1, 3))]}

    # --- pure-Python reference evaluator (three-valued) ---
    def k_and(vs):
        if any(v is False for v in vs):
            return False
        return None if any(v is None for v in vs) else True

    def k_or(vs):
        if any(v is True for v in vs):
            return True
        return None if any(v is None for v in vs) else False

    def to_num(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    def ev_leaf(k, spec, md):
        val = md.get(k)
        if not isinstance(spec, dict):
            return None if val is None else val == str(spec)
        outs = []
        for op, v in spec.items():
            if op == "$eq":
                outs.append(None if val is None else val == str(v))
            elif op == "$ne":
                outs.append(None if val is None else val != str(v))
            elif op == "$in":
                outs.append(None if val is None else val in [str(x) for x in v])
            elif op == "$nin":
                outs.append(None if val is None else val not in [str(x) for x in v])
            else:
                f = to_num(val)
                if f is None:
                    outs.append(None)
                else:
                    t = float(v)
                    outs.append(
                        {"$gt": f > t, "$gte": f >= t, "$lt": f < t, "$lte": f <= t}[op]
                    )
        return k_and(outs)

    def ev(node, md):
        outs = []
        for k, v in node.items():
            if k == "$and":
                outs.append(k_and([ev(s, md) for s in v]))
            elif k == "$or":
                outs.append(k_or([ev(s, md) for s in v]))
            elif k == "$not":
                inner = ev(v, md)
                outs.append(not (inner if inner is not None else False))
            else:
                outs.append(ev_leaf(k, v, md))
        return k_and(outs)

    docs = [rand_doc(i) for i in range(60)]
    trees = [rand_tree(3) for _ in range(40)]
    df = spark.createDataFrame(docs, "id string, metadata map<string,string>")
    cols = [
        extended_where_predicate(t).alias(f"f{i}") for i, t in enumerate(trees)
    ]
    rows = {r["id"]: r for r in df.select("id", *cols).collect()}
    for i, t in enumerate(trees):
        for did, md in docs:
            want = ev(t, md)
            want = bool(want) if want is not None else False
            got = rows[did][f"f{i}"]
            assert got == want, (t, md, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    ),
    thr=st.floats(0.2, 0.95),
)
def test_semantic_prune_matches_python_reference(spark, vecs, thr):
    """semantic_prune(min_id) == a direct python evaluation of the
    pairwise rule on arbitrary small inputs (degenerate zero vectors
    excluded — cosine undefined)."""
    import numpy as np

    rows = [
        (i, i % 2, [float(x) for x in v])
        for i, v in enumerate(vecs)
        if np.linalg.norm(v) > 1e-6
    ]
    if len(rows) < 2:
        return
    from chromem_go_spark.operators.dedup import semantic_prune

    df = spark.createDataFrame(rows, "vec_id long, cluster_id int, embedding array<double>")
    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_prune(df, threshold=thr, keep="min_id").collect()
    }

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for i, ci, vi in rows:
        dropped = any(
            cj == ci and j < i and cos(vj, vi) >= thr for j, cj, vj in rows
        )
        assert got[i] == (not dropped), (i, thr)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
    ),
)
def test_bm25_matches_python_reference(spark, texts):
    """bm25_scores == a direct python BM25 on arbitrary tiny corpora."""
    import math
    import re

    from chromem_go_spark.operators.hybrid import bm25_scores

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["a", "b"]
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, terms).collect()}

    tok = lambda t: re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", t.lower())  # noqa: E731
    toks = {i: tok(t) for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    df_t = {
        w: sum(1 for v in toks.values() if w in v) for w in terms
    }
    for i, v in toks.items():
        score = 0.0
        for w in terms:
            tf = v.count(w)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df_t[w] + 0.5) / (df_t[w] + 0.5))
            score += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if score > 0:
            assert abs(got[i] - score) < 1e-9, i
        else:
            assert i not in got


def test_extended_where_contains_matches_reference_evaluator(spark):
    """Differential test for the r8 $contains/$not_contains leaves: 40
    seeded-random trees now mixing substring ops — over metadata
    values AND the content COLUMN (key == content_col) — vs the pure
    Kleene evaluator.  Same harness as the comparison-ops test above;
    one Spark job total."""
    import random

    from pyspark.sql import functions as F

    from chromem_go_spark.operators.filters import extended_where_predicate

    rng = random.Random(11)
    KEYS = ["a", "b"]
    VALS = ["abc", "bcd", "xyz", "aXc"]
    SUBS = ["a", "bc", "X", "zz"]
    TEXTS = ["alpha abc text", "bcd body", "no match here", ""]

    def rand_doc(i):
        md = {k: rng.choice(VALS) for k in KEYS if rng.random() < 0.7}
        return (str(i), md, rng.choice(TEXTS))

    def rand_leaf():
        r = rng.random()
        if r < 0.4:  # content-column substring
            return {
                "content": {
                    rng.choice(["$contains", "$not_contains"]):
                        rng.choice(SUBS + ["abc", "body"])
                }
            }
        if r < 0.7:  # metadata-value substring
            return {
                rng.choice(KEYS): {
                    rng.choice(["$contains", "$not_contains"]):
                        rng.choice(SUBS)
                }
            }
        return {rng.choice(KEYS): rng.choice(VALS)}  # plain equality

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return rand_leaf()
        op = rng.choice(["$and", "$or", "$not"])
        if op == "$not":
            return {"$not": rand_tree(depth - 1)}
        return {op: [rand_tree(depth - 1) for _ in range(rng.randint(1, 3))]}

    def k_and(vs):
        if any(v is False for v in vs):
            return False
        return None if any(v is None for v in vs) else True

    def k_or(vs):
        if any(v is True for v in vs):
            return True
        return None if any(v is None for v in vs) else False

    def ev_leaf(k, spec, md, content):
        val = content if k == "content" else md.get(k)
        if not isinstance(spec, dict):
            return None if val is None else val == str(spec)
        outs = []
        for op, v in spec.items():
            if val is None:
                outs.append(None)
            elif op == "$contains":
                outs.append(str(v) in val)
            elif op == "$not_contains":
                outs.append(str(v) not in val)
            else:
                raise AssertionError(op)
        return k_and(outs)

    def ev(node, md, content):
        outs = []
        for k, v in node.items():
            if k == "$and":
                outs.append(k_and([ev(s, md, content) for s in v]))
            elif k == "$or":
                outs.append(k_or([ev(s, md, content) for s in v]))
            elif k == "$not":
                inner = ev(v, md, content)
                outs.append(not (inner if inner is not None else False))
            else:
                outs.append(ev_leaf(k, v, md, content))
        return k_and(outs)

    docs = [rand_doc(i) for i in range(60)]
    trees = [rand_tree(3) for _ in range(40)]
    df = spark.createDataFrame(
        docs, "id string, metadata map<string,string>, content string"
    )
    cols = [
        extended_where_predicate(t, content_col="content").alias(f"f{i}")
        for i, t in enumerate(trees)
    ]
    rows = {r["id"]: r for r in df.select("id", *cols).collect()}
    for i, t in enumerate(trees):
        for did, md, content in docs:
            want = ev(t, md, content)
            want = bool(want) if want is not None else False
            got = rows[did][f"f{i}"]
            assert got == want, (t, md, content, got, want)


def test_conjunctive_contains_patterns_sound_on_random_trees(spark):
    """THE pruning-soundness property, on random trees: every pattern
    conjunctive_contains_patterns extracts must appear in the content
    of EVERY document the compiled predicate matches — if this holds,
    gram-index pruning on those patterns can never drop a correct
    row.  Checked against the compiled Spark predicate itself (one
    job), not the Python evaluator, so the property binds the real
    query path."""
    import random

    from chromem_go_spark.operators.filters import (
        conjunctive_contains_patterns,
        extended_where_predicate,
    )

    rng = random.Random(23)
    SUBS = ["alp", "bod", "tex", "zz"]
    TEXTS = ["alpha abc text", "bcd body", "no match here", "alp bod tex"]

    def rand_leaf():
        r = rng.random()
        if r < 0.5:
            return {
                "content": {
                    rng.choice(["$contains", "$not_contains"]):
                        rng.choice(SUBS)
                }
            }
        return {"k": {"$contains": rng.choice(SUBS)}}  # metadata leaf

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.35:
            return rand_leaf()
        op = rng.choice(["$and", "$and", "$or", "$not"])  # bias to $and
        if op == "$not":
            return {"$not": rand_tree(depth - 1)}
        return {op: [rand_tree(depth - 1) for _ in range(rng.randint(1, 3))]}

    docs = [
        (str(i), {"k": rng.choice(SUBS + ["other"])}, rng.choice(TEXTS))
        for i in range(40)
    ]
    trees = [rand_tree(3) for _ in range(50)]
    df = spark.createDataFrame(
        docs, "id string, metadata map<string,string>, content string"
    )
    cols = [
        extended_where_predicate(t, content_col="content").alias(f"f{i}")
        for i, t in enumerate(trees)
    ]
    rows = df.select("id", "content", *cols).collect()
    checked = 0
    for i, t in enumerate(trees):
        pats = conjunctive_contains_patterns(t)
        if not pats:
            continue
        for r in rows:
            if r[f"f{i}"]:
                checked += 1
                assert all(p in r["content"] for p in pats), (t, pats, r)
    assert checked > 0  # the generator must actually exercise the property


def test_contains_pattern_groups_sound_on_random_trees(spark):
    """r9 group-pruning soundness on random trees: every document the
    compiled predicate matches must FULLY satisfy at least one of the
    extracted pattern groups (contain every pattern in it) — if this
    holds, unioning the groups' gram-index candidate sets can never
    drop a correct row.  Same real-predicate binding as the
    conjunctive property above."""
    import random

    from chromem_go_spark.operators.filters import (
        contains_pattern_groups,
        extended_where_predicate,
    )

    rng = random.Random(29)
    SUBS = ["alp", "bod", "tex", "zz"]
    TEXTS = ["alpha abc text", "bcd body", "no match here", "alp bod tex"]

    def rand_leaf():
        r = rng.random()
        if r < 0.7:  # bias to content $contains so $or branches can
            return {"content": {"$contains": rng.choice(SUBS)}}
        if r < 0.85:
            return {"content": {"$not_contains": rng.choice(SUBS)}}
        return {"k": {"$contains": rng.choice(SUBS)}}  # metadata leaf

    def rand_tree(depth):
        if depth == 0 or rng.random() < 0.3:
            return rand_leaf()
        op = rng.choice(["$and", "$or", "$or", "$not"])  # bias to $or
        if op == "$not":
            return {"$not": rand_tree(depth - 1)}
        return {op: [rand_tree(depth - 1) for _ in range(rng.randint(1, 3))]}

    docs = [
        (str(i), {"k": rng.choice(SUBS + ["other"])}, rng.choice(TEXTS))
        for i in range(40)
    ]
    trees = [rand_tree(3) for _ in range(60)]
    # guaranteed multi-group shapes (the generator only reaches them
    # probabilistically): pure $or, OR-of-AND, AND-of-OR
    trees += [
        {"$or": [{"content": {"$contains": "alp"}},
                 {"content": {"$contains": "bod"}}]},
        {"$or": [
            {"$and": [{"content": {"$contains": "alp"}},
                      {"content": {"$contains": "tex"}}]},
            {"content": {"$contains": "bod"}},
        ]},
        {"$and": [
            {"$or": [{"content": {"$contains": "alp"}},
                     {"content": {"$contains": "bod"}}]},
            {"$or": [{"content": {"$contains": "tex"}},
                     {"content": {"$contains": "zzq"}}]},
        ]},
    ]
    df = spark.createDataFrame(
        docs, "id string, metadata map<string,string>, content string"
    )
    cols = [
        extended_where_predicate(t, content_col="content").alias(f"f{i}")
        for i, t in enumerate(trees)
    ]
    rows = df.select("id", "content", *cols).collect()
    checked = or_shaped = 0
    for i, t in enumerate(trees):
        groups = contains_pattern_groups(t)
        if not groups:
            continue
        if len(groups) > 1:
            or_shaped += 1
        for r in rows:
            if r[f"f{i}"]:
                checked += 1
                assert any(
                    all(p in r["content"] for p in g) for g in groups
                ), (t, groups, r)
    assert checked > 0 and or_shaped > 0  # $or shapes must be exercised


# ------------------------------------------- HNSW eligibility walks (r11)
#
# Spark-free property: the ef >= live-n exactness certificate of
# tombstoned / filtered graph walks (operators/hnsw.py module doc) on
# RANDOM corpora — including clustered shapes, duplicate-heavy shapes,
# and adversarial delete/allow sets (the curated tests pin specific
# corpora; this pins the invariant itself).


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=40),   # corpus size
    st.integers(min_value=2, max_value=5),    # dim
    st.integers(min_value=0, max_value=2**31 - 1),  # corpus seed
    st.sets(st.integers(min_value=0, max_value=39)),  # deleted ids
    st.one_of(
        st.none(), st.sets(st.integers(min_value=0, max_value=39))
    ),  # allowed ids (None = unfiltered)
)
def test_hnsw_eligibility_walk_is_exact_at_ef_live_n(
    n, dim, seed, dele, allowed
):
    from chromem_go_spark.operators.hnsw import HNSWIndex

    rng = np.random.default_rng(seed)
    # half the time, clustered blobs (the shape that used to break
    # naive-pruned connectivity); else uniform
    if seed % 2:
        cents = rng.standard_normal((3, dim)) * 4
        mat = cents[rng.integers(0, 3, size=n)] + rng.standard_normal(
            (n, dim)
        ) * 0.1
    else:
        mat = rng.standard_normal((n, dim))
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ids = list(range(n))
    g = HNSWIndex.build_local(ids, [list(v) for v in mat], M=4,
                              ef_construction=16)
    dele_eff = {i for i in dele if i < n}
    g.delete_ids(dele_eff)
    q = rng.standard_normal(dim)
    # direct_filter_cells=0 (r12, ADVICE): n*dim here is far below the
    # direct-GEMM threshold, so the WALK this property names must be
    # forced — the direct path is exact by construction and pinned by
    # test_direct_filter_path_equals_walk
    got = g.search(list(q), k=10, ef=max(g.n_points(), 1), allowed=allowed,
                   direct_filter_cells=0)
    # brute-force reference over exactly the eligible population —
    # stated in IDS (the API's delete unit), independent of node order
    qn = q / max(np.linalg.norm(q), 1e-12)
    elig = [
        i for i in ids
        if i not in dele_eff and (allowed is None or i in allowed)
    ]
    sims = sorted(
        ((float(mat[i] @ qn), i) for i in elig),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    want = [(i, s) for s, i in sims]
    assert [(i, round(s, 9)) for i, s in got] == [
        (i, round(s, 9)) for i, s in want
    ]


# ------------------------------------------- split_shard kernel (r12)
#
# Spark-free property: the split kernel's conservation invariant on
# RANDOM corpora with random tombstone sets — the sub-cells' id sets
# PARTITION the source's live set (no loss, no duplication), each
# sub-graph is layer-0 connected, and exact search over the union of
# sub-graphs equals exact search over the live source.


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=48),       # corpus size
    st.integers(min_value=2, max_value=6),        # dim
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
    st.sets(st.integers(min_value=0, max_value=47)),  # tombstones
)
def test_split_kernel_partitions_live_set(tmp_path_factory, n, dim,
                                          seed, dele):
    import os

    import pandas as pd

    from chromem_go_spark.operators.hnsw import (
        HNSWIndex,
        _make_split_kernel,
        _read_live,
        _shard_dir,
        load_snapshot,
    )

    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ids = list(range(n))
    g = HNSWIndex.build_local(ids, [list(v) for v in mat], M=4,
                              ef_construction=16)
    dele_eff = {i for i in dele if i < n}
    if len(dele_eff) >= n:  # keep at least one live point
        dele_eff = set(list(dele_eff)[: n - 1])
    g.delete_ids(dele_eff)
    live = set(ids) - dele_eff
    root = str(tmp_path_factory.mktemp("splitprop"))
    src = 0
    g.save(_shard_dir(root, src))
    staging = os.path.join(root, "_split_stage_0")
    kernel = _make_split_kernel(root, src, (1, 2), 4, 16, int(seed) % 997,
                                1_000_000, staging)
    # the two sub-builds are independent tasks (r13) — run both here
    rows = pd.concat(list(kernel([pd.DataFrame({"sub": [0, 1]})])))
    subs = rows
    assert int(subs["n_points"].sum()) == len(live)
    # both tasks must have read the same committed generation
    assert len(set(subs["src_gen"])) == 1
    # conservation evidence the commit validates (r14, ADVICE): both
    # tasks report the same live count, bit-identical fits, and the
    # validator itself accepts the pair
    assert set(int(x) for x in subs["n_live"]) == {len(live)}
    assert len(set(subs["fit_hash"])) == 1
    from chromem_go_spark.operators.hnsw import _validate_split_rows

    assert _validate_split_rows(
        subs.to_dict("records"), src
    ) == int(subs["src_gen"].iloc[0])
    union_ids: set = set()
    union_found = []
    q = rng.standard_normal(dim)
    qn = q / max(np.linalg.norm(q), 1e-12)
    for j in (0, 1):
        sdir = os.path.join(staging, str(j))
        # EVERY sub-cell snapshots, even a memberless one (r12
        # ADVICE: a dir-less sub-cell's watermark would read -1)
        assert _read_live(sdir) is not None
        sub, _ = load_snapshot(sdir)
        if sub.n_points() == 0:
            continue
        assert sub.check_connected()
        sub_ids = set(sub.ids)
        assert not (union_ids & sub_ids), "sub-cells must not overlap"
        union_ids |= sub_ids
        union_found += sub.search(list(q), k=10, ef=sub.n_points())
    assert union_ids == live
    union_found.sort(key=lambda t: (-round(t[1], 9), t[0]))
    want = sorted(
        ((i, float(mat[i] @ qn)) for i in live),
        key=lambda t: (-round(t[1], 9), t[0]),
    )[:10]
    got = [(i, round(s_, 6)) for i, s_ in union_found[:10]]
    assert got == [(i, round(s_, 6)) for i, s_ in want]


# ------------------------------ frozen quantizer tree routing (r13)
#
# The replay-stability invariant the split/replay exactly-once fix
# rests on: routing over the tree AFTER a split is a pure REFINEMENT
# of routing before it — rows whose pre-split argmax picked a
# non-split cell keep that cell exactly; rows that picked the split
# cell land in one of its two children, chosen by the same 2-way
# argmax the split kernel used to place their copies.


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=8),    # base cells S0
    st.integers(min_value=2, max_value=16),   # dim
    st.integers(min_value=1, max_value=60),   # rows
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
    st.integers(min_value=0, max_value=3),    # extra split rounds
)
def test_tree_routing_is_refinement_of_flat(S0, dim, n, seed, rounds):
    from chromem_go_spark.operators.hnsw import (
        _resolve_routing,
        load_routing_table,
    )

    rng = np.random.default_rng(seed)

    def unit(m):
        m = np.atleast_2d(m)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return m / nrm

    cents = unit(rng.standard_normal((S0, dim)))
    meta = {
        "centroids": {str(j): list(cents[j]) for j in range(S0)},
        "retired_centroids": {},
        "split_children": {},
    }
    mat = unit(rng.standard_normal((n, dim)))
    prev = _resolve_routing(mat, load_routing_table(meta))
    next_id = S0
    for _ in range(rounds + 1):
        active = sorted(int(k) for k in meta["centroids"])
        src = int(rng.choice(active))
        pair = unit(rng.standard_normal((2, dim)))
        c0, c1 = next_id, next_id + 1
        next_id += 2
        sc = dict(meta["split_children"])
        sc[str(src)] = [c0, c1]
        rc = dict(meta["retired_centroids"])
        rc[str(src)] = meta["centroids"][str(src)]
        cmap = dict(meta["centroids"])
        del cmap[str(src)]
        cmap[str(c0)] = list(pair[0])
        cmap[str(c1)] = list(pair[1])
        meta = {
            "centroids": cmap,
            "retired_centroids": rc,
            "split_children": sc,
        }
        cur = _resolve_routing(mat, load_routing_table(meta))
        # refinement: unchanged unless the row sat in the split cell,
        # in which case it descends to the argmax child of that cell
        for i in range(n):
            if prev[i] != src:
                assert cur[i] == prev[i], (
                    f"row {i} re-routed {prev[i]} -> {cur[i]} on a "
                    f"split of {src}"
                )
            else:
                sub = int(np.argmax(mat[i] @ pair.T))
                assert cur[i] == (c0, c1)[sub]
        prev = cur

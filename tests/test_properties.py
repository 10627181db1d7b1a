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

"""Token-gram inverted index for $contains pre-filtering
(operators/textindex.py — the reference's roadmap full-text index,
reference README.md:172).

The load-bearing contract: where_contains_indexed returns EXACTLY the
scan filter's rows for every pattern (the index only prunes where the
exact verify runs), and the pruned corpus scan receives a pushed-down
In filter on the id column for bounded candidate sets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.operators import textindex as TI


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def gram_index(docs):
    # unpersist on teardown (cached-plan leakage; see test_hnsw.emb)
    idx = TI.build_gram_index(docs, text_col="text", id_col="doc_id").cache()
    yield idx
    idx.unpersist()


def test_pattern_grams():
    assert TI.pattern_grams("abcd", 3) == ["abc", "bcd"]
    assert TI.pattern_grams("aaaa", 3) == ["aaa"]  # distinct
    assert TI.pattern_grams("ab", 3) == []  # too short for the index


def test_build_gram_index_rows(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "xy")], "id long, content string"
    )
    rows = {
        (r["gram"], r["id"])
        for r in TI.build_gram_index(df, "content", "id").collect()
    }
    # doc 2 is shorter than the gram size: no postings (and no "" rows)
    assert rows == {("abc", 1), ("bcd", 1)}


def test_candidates_are_superset_not_exact(spark):
    """Grams may appear apart: doc 2 holds every gram of 'abcde'
    without the substring — a candidate the exact verify must drop."""
    df = spark.createDataFrame(
        [(1, "xx abcde yy"), (2, "abcd cdef"), (3, "nothing")],
        "id long, content string",
    )
    idx = TI.build_gram_index(df, "content", "id")
    cand = {
        r["id"] for r in TI.contains_candidates(idx, "abcde").collect()
    }
    assert cand == {1, 2}  # superset: 2 has abc,bcd,cde but not "abcde"
    out = {
        r["id"]
        for r in TI.where_contains_indexed(df, idx, "abcde").collect()
    }
    assert out == {1}  # the verify drops the false candidate


@pytest.mark.parametrize("pattern", ["spark", "join", "zzqxv__nope"])
def test_indexed_equals_scan_filter(docs, gram_index, pattern):
    scan = {
        r["doc_id"]
        for r in docs.filter(F.col("text").contains(pattern))
        .select("doc_id")
        .collect()
    }
    idx = {
        r["doc_id"]
        for r in TI.where_contains_indexed(
            docs, gram_index, pattern, text_col="text", id_col="doc_id"
        )
        .select("doc_id")
        .collect()
    }
    assert idx == scan


def test_short_pattern_falls_back_to_scan(docs, gram_index):
    out = TI.where_contains_indexed(
        docs, gram_index, "ab", text_col="text", id_col="doc_id"
    )
    scan = docs.filter(F.col("text").contains("ab"))
    assert out.count() == scan.count()
    assert TI.contains_candidates(gram_index, "ab") is None


def test_semi_join_path_same_rows(docs, gram_index):
    """max_inlist=0 forces the distributed semi-join branch — same
    result set as the collected In-list branch."""
    semi = {
        r["doc_id"]
        for r in TI.where_contains_indexed(
            docs, gram_index, "spark", text_col="text", id_col="doc_id",
            max_inlist=0,
        )
        .select("doc_id")
        .collect()
    }
    scan = {
        r["doc_id"]
        for r in docs.filter(F.col("text").contains("spark"))
        .select("doc_id")
        .collect()
    }
    assert semi == scan


def test_candidate_in_filter_is_pushed_down(spark, docs, gram_index, tmp_path):
    """The whole point at scale: the corpus parquet scan receives the
    candidate ids as PushedFilters [In(doc_id, ...)] so row groups are
    skipped by stats — assert it on the physical plan of the In-list
    branch over a REAL parquet read."""
    out = TI.where_contains_indexed(
        docs, gram_index, "spark", text_col="text", id_col="doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("In(doc_id" in p for p in pushed), plan[:2000]


def test_gram_filter_pruned_on_persisted_index(spark, docs, tmp_path):
    """write_gram_index range-partitions + sorts by gram; the per-query
    gram isin filter must reach the posting parquet scan as a pushed
    In(gram, ...) filter (row-group stats pruning)."""
    idx = TI.build_gram_index(docs, text_col="text", id_col="doc_id")
    path = str(tmp_path / "gram_index")
    TI.write_gram_index(idx, path, num_partitions=4)
    stored = spark.read.parquet(path)
    cand = TI.contains_candidates(stored, "spark")
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "In(gram" in plan, plan[:2000]
    # and the stored index answers identically to the in-memory one
    mem = {r["id"] for r in TI.contains_candidates(idx, "spark").collect()}
    assert {r["id"] for r in cand.collect()} == mem


def test_collection_integration_and_staleness(spark):
    """Collection.build_text_index: indexed query == unindexed query;
    after a mutation the (stale) index is silently bypassed so a new
    matching document still surfaces."""
    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    db = DB(spark)
    c = db.create_collection(
        "ti_test", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(id="1", content="the quick brown fox jumps"),
            Document(id="2", content="pack my box with five dozen jugs"),
            Document(id="3", content="quick silver linings"),
        ]
    )
    baseline = {
        r["id"]
        for r in c.query(
            "quick", 3, where_document={"$contains": "quick"}
        ).collect()
    }
    c.build_text_index()
    indexed = {
        r["id"]
        for r in c.query(
            "quick", 3, where_document={"$contains": "quick"}
        ).collect()
    }
    assert indexed == baseline == {"1", "3"}
    # the prune actually engaged: candidates resolve through the index
    cand = TI.contains_candidates(c._text_index, "quick")
    assert {r["id"] for r in cand.collect()} == {"1", "3"}
    # mutate WITHOUT rebuilding: the stale index must not hide doc 4
    c.add_documents([Document(id="4", content="a quick addendum")])
    after = {
        r["id"]
        for r in c.query(
            "quick", 4, where_document={"$contains": "quick"}
        ).collect()
    }
    assert after == {"1", "3", "4"}
    # rebuild picks the new doc up into the index itself
    c.build_text_index()
    assert {
        r["id"]
        for r in TI.contains_candidates(c._text_index, "quick").collect()
    } == {"1", "3", "4"}


def test_bad_gram_size():
    with pytest.raises(ValueError, match="n >= 2"):
        TI.build_gram_index(None, n=1)


def test_persistent_collection_text_index_reload(spark, tmp_path):
    """A persisted gram index survives the session: a fresh DB over the
    same directory reloads it (signature match) and prunes queries;
    after a mutation the stale snapshot is REFUSED and queries fall
    back to the scan path — correctness never rides on index
    freshness."""
    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    pdir = str(tmp_path / "db")
    db = DB(spark, persist_dir=pdir)
    c = db.create_collection(
        "ti_persist", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(id="1", content="the quick brown fox"),
            Document(id="2", content="lazy dogs sleep"),
        ]
    )
    c.build_text_index()
    import os

    assert os.path.isdir(c._text_index_path())

    # fresh session over the same directory
    db2 = DB(spark, persist_dir=pdir)
    c2 = db2.get_collection(
        "ti_persist", embedding_func=make_hash_embedding_func(16)
    )
    assert c2.load_text_index() is True
    got = {
        r["id"]
        for r in c2.query(
            "quick", 2, where_document={"$contains": "quick"}
        ).collect()
    }
    assert got == {"1"}
    assert {
        r["id"]
        for r in TI.contains_candidates(c2._text_index, "quick").collect()
    } == {"1"}

    # mutate, then try to reload the now-stale snapshot: refused
    c2.add_documents([Document(id="3", content="quick addendum")])
    assert c2.load_text_index() is False
    after = {
        r["id"]
        for r in c2.query(
            "quick", 3, where_document={"$contains": "quick"}
        ).collect()
    }
    assert after == {"1", "3"}  # scan fallback sees the new doc
    # rebuilding refreshes the persisted snapshot + signature
    c2.build_text_index()
    db3 = DB(spark, persist_dir=pdir)
    c3 = db3.get_collection(
        "ti_persist", embedding_func=make_hash_embedding_func(16)
    )
    assert c3.load_text_index() is True
    assert {
        r["id"]
        for r in TI.contains_candidates(c3._text_index, "quick").collect()
    } == {"1", "3"}


# ---------------------------------------------- extended-DSL pruning (r8)


def test_conjunctive_contains_patterns_extraction():
    """Only conjunctively-REQUIRED content $contains leaves are sound
    prunes: top-level AND-folds and $and at any depth collect; $or /
    $not / $not_contains / metadata-valued $contains never do."""
    from chromem_go_spark.operators.filters import (
        conjunctive_contains_patterns as ccp,
    )

    assert ccp({"content": {"$contains": "abc"}}) == ["abc"]
    assert ccp(
        {
            "$and": [
                {"content": {"$contains": "abc"}},
                {"lang": "en"},
                {"$and": [{"content": {"$contains": "def"}}]},
            ]
        }
    ) == ["abc", "def"]
    # AND-fold of multiple entries in one mapping
    assert ccp({"content": {"$contains": "abc"}, "lang": "en"}) == ["abc"]
    # disjunction / negation: nothing prunable
    assert ccp({"$or": [{"content": {"$contains": "abc"}}, {"lang": "en"}]}) == []
    assert ccp({"$not": {"content": {"$contains": "abc"}}}) == []
    assert ccp({"content": {"$not_contains": "abc"}}) == []
    # a metadata key's $contains is not a content prune
    assert ccp({"lang": {"$contains": "abc"}}) == []
    # dedup
    assert ccp(
        {"$and": [{"content": {"$contains": "abc"}},
                  {"content": {"$contains": "abc"}}]}
    ) == ["abc"]
    assert ccp(None) == []


def test_contains_candidates_conjunctive_intersection(docs, gram_index):
    """Multi-pattern candidates == intersection of per-pattern
    candidate sets (one posting pass over the gram union)."""
    a = {r["id"] for r in TI.contains_candidates(gram_index, "spark").collect()}
    b = {r["id"] for r in TI.contains_candidates(gram_index, "batch").collect()}
    both = {
        r["id"]
        for r in TI.contains_candidates_conjunctive(
            gram_index, ["spark", "batch"]
        ).collect()
    }
    assert both == (a & b)
    # unindexable patterns contribute nothing; all-unindexable -> None
    assert TI.contains_candidates_conjunctive(gram_index, ["ab"]) is None
    same = {
        r["id"]
        for r in TI.contains_candidates_conjunctive(
            gram_index, ["spark", "ab"]
        ).collect()
    }
    assert same == a


def test_extended_and_contains_pruned_rows_and_plan(spark, tmp_path):
    """$contains leaves under $and engage the gram-index prune on the
    extended-DSL path (r8 — previously only the flat where_document
    key pruned): identical rows to the scan path, and the persisted
    collection's parquet scan receives the candidate ids as a
    pushed-down In(id, ...) filter."""
    import re

    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    pdir = str(tmp_path / "db")
    db = DB(spark, persist_dir=pdir)
    c = db.create_collection(
        "ext_prune", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(
                id=str(i),
                content=(
                    f"quick brown fox {i}" if i % 3 == 0 else f"lazy dog {i}"
                ),
                metadata={"par": str(i % 2)},
            )
            for i in range(30)
        ]
    )
    qv = c.embedding_func("quick")
    tree = {"$and": [{"content": {"$contains": "quick"}}, {"par": "0"}]}
    scan = {
        (r["id"], round(r["similarity"], 6))
        for r in c.query_embedding(
            qv, 3, where=tree, extended_filters=True
        ).collect()
    }
    assert len(scan) == 3

    c.build_text_index()
    out = c.query_embedding(qv, 3, where=tree, extended_filters=True)
    got = {(r["id"], round(r["similarity"], 6)) for r in out.collect()}
    assert got == scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("In(id" in p for p in pushed), plan[:2000]


def test_extended_or_contains_not_pruned(spark):
    """A $contains under $or must NOT prune: a doc matching only the
    other branch still returns after the index is built."""
    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    db = DB(spark)
    c = db.create_collection(
        "or_prune", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(id="1", content="quick brown fox", metadata={"x": "n"}),
            Document(id="2", content="lazy dog", metadata={"x": "y"}),
        ]
    )
    c.build_text_index()
    tree = {"$or": [{"content": {"$contains": "quick"}}, {"x": "y"}]}
    qv = c.embedding_func("q")
    got = {
        r["id"]
        for r in c.query_embedding(
            qv, 2, where=tree, extended_filters=True
        ).collect()
    }
    assert got == {"1", "2"}  # doc 2 matches only the $or metadata branch


def test_text_entry_routed_with_contains_prune(spark):
    """r8 text-entry composition: ONE query() call runs embed ->
    gram-index $contains prune -> routed ANN, and matches the unrouted
    text entry exactly (auto resolves flat here; forced IVF at
    target 0.999 is the nprobe-all identity)."""
    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    db = DB(spark)
    c = db.create_collection(
        "txt_routed", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(
                id=str(i),
                content=(
                    f"quick brown fox {i}" if i % 2 == 0 else f"lazy dog {i}"
                ),
                metadata={"par": str(i % 3)},
            )
            for i in range(24)
        ]
    )
    c.build_text_index()
    wd = {"$contains": "quick"}
    base = {
        (r["id"], round(r["similarity"], 6))
        for r in c.query("quick fox", 4, where_document=wd).collect()
    }
    assert len(base) == 4
    routed_auto = {
        (r["id"], round(r["similarity"], 6))
        for r in c.query("quick fox", 4, where_document=wd, index="auto").collect()
    }
    assert routed_auto == base
    routed_ivf = {
        (r["id"], round(r["similarity"], 6))
        for r in c.query(
            "quick fox", 4, where_document=wd, index="ivf", target_recall=0.999
        ).collect()
    }
    assert routed_ivf == base


def test_content_key_rebinds_substring_ops_only(spark):
    """Only $contains/$not_contains address the content COLUMN; every
    other operator on a key literally named 'content' keeps strict
    metadata binding, so pre-r8 extended queries never change
    meaning."""
    from chromem_go_spark.operators.filters import extended_where_predicate

    df = spark.createDataFrame(
        [
            ("1", {"content": "summary"}, "full document text"),
            ("2", {}, "summary of things"),
        ],
        "id string, metadata map<string,string>, content string",
    )
    # $eq on key 'content' -> metadata value, NOT the text column
    eq = extended_where_predicate(
        {"content": {"$eq": "summary"}}, content_col="content"
    )
    assert {r["id"] for r in df.filter(eq).collect()} == {"1"}
    # plain equality leaf likewise stays metadata-bound
    plain = extended_where_predicate(
        {"content": "summary"}, content_col="content"
    )
    assert {r["id"] for r in df.filter(plain).collect()} == {"1"}
    # $contains on the same key -> the content COLUMN
    sub = extended_where_predicate(
        {"content": {"$contains": "summary"}}, content_col="content"
    )
    assert {r["id"] for r in df.filter(sub).collect()} == {"2"}


# ---------------------------------------------- $or group pruning (r9)


def test_contains_pattern_groups_extraction():
    """The DNF over-approximation: disjunctions of conjunctive pattern
    groups, sound by construction — unconstrained branches widen to
    nothing-prunable, AND cross-products, OR unions."""
    from chromem_go_spark.operators.filters import (
        and_fold_patterns,
        contains_pattern_groups as cpg,
    )

    # single leaf == single group
    assert cpg({"content": {"$contains": "abc"}}) == [["abc"]]
    # pure $or of content leaves: one group per branch
    assert cpg(
        {"$or": [{"content": {"$contains": "abc"}},
                 {"content": {"$contains": "def"}}]}
    ) == [["abc"], ["def"]]
    # $or with an unconstrained branch prunes nothing
    assert cpg(
        {"$or": [{"content": {"$contains": "abc"}}, {"lang": "en"}]}
    ) == []
    # AND of ORs: cross-product
    got = cpg(
        {"$and": [
            {"$or": [{"content": {"$contains": "a1"}},
                     {"content": {"$contains": "b1"}}]},
            {"$or": [{"content": {"$contains": "c1"}},
                     {"content": {"$contains": "d1"}}]},
        ]}
    )
    assert sorted(map(tuple, got)) == [
        ("a1", "c1"), ("a1", "d1"), ("b1", "c1"), ("b1", "d1"),
    ]
    # OR of ANDs: union of conjunctive groups
    assert cpg(
        {"$or": [
            {"$and": [{"content": {"$contains": "a1"}},
                      {"content": {"$contains": "b1"}}]},
            {"content": {"$contains": "c1"}},
        ]}
    ) == [["a1", "b1"], ["c1"]]
    # $not and metadata leaves stay unconstrained
    assert cpg({"$not": {"content": {"$contains": "abc"}}}) == []
    assert cpg({"lang": {"$contains": "abc"}}) == []
    # a required leaf ANDed with an unprunable $or still prunes on the leaf
    assert cpg(
        {"$and": [
            {"content": {"$contains": "req"}},
            {"$or": [{"content": {"$contains": "abc"}}, {"lang": "en"}]},
        ]}
    ) == [["req"]]
    # and_fold_patterns: flat where_document composes into every group
    assert and_fold_patterns([["a"], ["b"]], ["z"]) == [["a", "z"], ["b", "z"]]
    assert and_fold_patterns([], ["z"]) == [["z"]]
    assert and_fold_patterns([["a"]], []) == [["a"]]


def test_contains_pattern_groups_cap_stays_sound():
    """Past max_groups the cross-product stops folding further AND-ed
    constraints — the result must still be a valid (wider) group set."""
    from chromem_go_spark.operators.filters import contains_pattern_groups

    ors = [
        {"$or": [{"content": {"$contains": f"p{i}a"}},
                 {"content": {"$contains": f"p{i}b"}}]}
        for i in range(6)  # full product would be 2^6 = 64 groups
    ]
    got = contains_pattern_groups({"$and": ors}, max_groups=16)
    assert 0 < len(got) <= 16
    # every group is a subset-requirement of some branch combination:
    # each pattern in a group must come from a distinct OR
    for g in got:
        assert len(g) == len({p[:2] for p in g})


def test_contains_candidates_disjunctive_union(docs, gram_index):
    """Disjunctive candidates == union of each group's intersection
    (one posting pass); any unindexable group -> None."""
    a = {r["id"] for r in TI.contains_candidates(gram_index, "spark").collect()}
    b = {r["id"] for r in TI.contains_candidates(gram_index, "batch").collect()}
    both = {
        r["id"]
        for r in TI.contains_candidates_disjunctive(
            gram_index, [["spark"], ["batch"]]
        ).collect()
    }
    assert both == (a | b)
    # group conjunctions still intersect within each branch
    mixed = {
        r["id"]
        for r in TI.contains_candidates_disjunctive(
            gram_index, [["spark", "batch"]]
        ).collect()
    }
    assert mixed == (a & b)
    # a group with no indexable pattern poisons the disjunction
    assert TI.contains_candidates_disjunctive(
        gram_index, [["spark"], ["ab"]]
    ) is None
    assert TI.contains_candidates_disjunctive(gram_index, []) is None


def test_extended_or_contains_pruned_rows_and_plan(spark, tmp_path):
    """r9: $contains leaves composed through $or engage the gram prune
    (per-branch candidate sets unioned): identical rows to the scan
    path, and the persisted collection's parquet scan receives the
    candidate ids as a pushed-down In(id, ...) filter."""
    import re

    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    pdir = str(tmp_path / "db")
    db = DB(spark, persist_dir=pdir)
    c = db.create_collection(
        "or_prune9", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(
                id=str(i),
                content=(
                    f"quick brown fox {i}" if i % 3 == 0
                    else (f"lazy dog {i}" if i % 3 == 1 else f"plain text {i}")
                ),
                metadata={"par": str(i % 2)},
            )
            for i in range(30)
        ]
    )
    qv = c.embedding_func("quick")
    tree = {"$or": [{"content": {"$contains": "quick"}},
                    {"content": {"$contains": "lazy"}}]}
    scan = {
        (r["id"], round(r["similarity"], 6))
        for r in c.query_embedding(
            qv, 5, where=tree, extended_filters=True
        ).collect()
    }
    assert len(scan) == 5

    c.build_text_index()
    out = c.query_embedding(qv, 5, where=tree, extended_filters=True)
    got = {(r["id"], round(r["similarity"], 6)) for r in out.collect()}
    assert got == scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("In(id" in p for p in pushed), plan[:2000]


def test_per_query_contains_prune_rows_and_plan(spark, tmp_path):
    """r9: per-query $contains filters engage the gram prune on the
    batch kernel's CORPUS side when every query carries a pattern (one
    candidate group per query, unioned) — identical rows to the
    unindexed path, In(id,...) pushed to the persisted scan; a single
    pattern-less query disables the prune (it can match anything)."""
    import re

    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    pdir = str(tmp_path / "db")
    db = DB(spark, persist_dir=pdir)
    c = db.create_collection(
        "pq_prune", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(
                id=str(i),
                content=(
                    f"quick brown fox {i}" if i % 3 == 0
                    else (f"lazy dog {i}" if i % 3 == 1 else f"plain text {i}")
                ),
                metadata={"par": str(i % 2)},
            )
            for i in range(30)
        ]
    )
    texts = ["quick", "lazy"]
    pq = [
        {"where_document": {"$contains": "quick brown"}},
        {"where_document": {"$contains": "lazy dog"}, "where": {"par": "0"}},
    ]
    base = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in c.query_batch(
            query_texts=texts, n_results=3, per_query_filters=pq
        ).collect()
    }
    assert base
    c.build_text_index()
    out = c.query_batch(
        query_texts=texts, n_results=3, per_query_filters=pq
    )
    got = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in out.collect()
    }
    assert got == base
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("In(id" in p for p in pushed), plan[:2000]
    # one query without a contains pattern -> no prune, same rows
    pq2 = [dict(pq[0]), None]
    base2 = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in c.query_batch(
            query_texts=texts, n_results=3, per_query_filters=pq2
        ).collect()
    }
    out2 = c.query_batch(
        query_texts=texts, n_results=3, per_query_filters=pq2
    )
    got2 = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in out2.collect()
    }
    assert got2 == base2
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert not any(
        "In(id" in p
        for p in re.findall(r"PushedFilters: \[([^\]]*)", plan2)
    )
    # and the routed IVF path with the prune still matches (nprobe-all)
    got3 = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in c.query_batch(
            query_texts=texts, n_results=3, per_query_filters=pq,
            index="ivf", target_recall=0.999,
        ).collect()
    }
    assert got3 == base


def test_query_batch_extended_global_or_prune(spark, tmp_path):
    """r9: query_batch(extended_filters=True) compiles the global where
    through the extended DSL and gram-prunes on its $contains structure
    (here an $or tree -> unioned groups): identical rows with and
    without the index, In(id,...) pushed down, and the prune composes
    with per-query contains filters (cross-product groups)."""
    import re

    from chromem_go_spark.db import DB
    from chromem_go_spark.document import Document
    from chromem_go_spark.embeddings.stub import make_hash_embedding_func

    pdir = str(tmp_path / "db")
    db = DB(spark, persist_dir=pdir)
    c = db.create_collection(
        "qb_ext", embedding_func=make_hash_embedding_func(16)
    )
    c.add_documents(
        [
            Document(
                id=str(i),
                content=(
                    f"quick brown fox {i}" if i % 3 == 0
                    else (f"lazy dog {i}" if i % 3 == 1 else f"plain text {i}")
                ),
                metadata={"par": str(i % 2)},
            )
            for i in range(30)
        ]
    )
    texts = ["quick", "lazy"]
    tree = {"$or": [{"content": {"$contains": "quick"}},
                    {"content": {"$contains": "lazy"}}]}

    def run(**kw):
        return {
            (r["query_id"], r["id"], round(r["similarity"], 6))
            for r in c.query_batch(
                query_texts=texts, n_results=3, where=tree,
                extended_filters=True, **kw,
            ).collect()
        }

    base = run()
    # plain-text docs (i%3==2) never match the $or tree
    assert base and all(int(i) % 3 != 2 for _, i, _ in base)
    base_pq = run(per_query_filters=[
        {"where_document": {"$contains": "brown"}}, None,
    ])

    c.build_text_index()
    out = c.query_batch(
        query_texts=texts, n_results=3, where=tree, extended_filters=True
    )
    got = {
        (r["query_id"], r["id"], round(r["similarity"], 6))
        for r in out.collect()
    }
    assert got == base
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert any(
        "In(id" in p
        for p in re.findall(r"PushedFilters: \[([^\]]*)", plan)
    ), plan[:2000]
    # composes with per-query filters (the routed DSL path prunes on
    # the AND-fold of global groups x per-query groups)
    assert run(per_query_filters=[
        {"where_document": {"$contains": "brown"}}, None,
    ]) == base_pq
    # and through the routed entry at the exact-identity setting
    assert run(index="ivf", target_recall=0.999) == base


def test_and_fold_groups_caps_unconstrained_side():
    """r10 ADVICE: and_fold_groups([], huge) must not pass the huge
    side through uncapped — past max_groups the result is [] (a no-op
    prune is always sound), so a large batch where every query carries
    $contains can't reach the disjunctive prune with one group per
    query."""
    from chromem_go_spark.operators.filters import and_fold_groups

    huge = [[f"pat{i}"] for i in range(500)]
    assert and_fold_groups([], huge, max_groups=16) == []
    assert and_fold_groups(huge, [], max_groups=16) == []
    small = [["a"], ["b"]]
    assert and_fold_groups([], small, max_groups=16) == small
    assert and_fold_groups(small, [], max_groups=16) == small
    # cross-product overflow with an already-huge left side: still []
    assert and_fold_groups(huge, small, max_groups=16) == []


def test_contains_candidates_disjunctive_group_cap(gram_index):
    """Past max_groups the disjunctive prune declines (None -> scan
    fallback) instead of building a per-group OR expression tree."""
    groups = [[f"pattern-{i}"] for i in range(17)]
    assert (
        TI.contains_candidates_disjunctive(gram_index, groups, max_groups=16)
        is None
    )
    # at the cap it still prunes
    ok = TI.contains_candidates_disjunctive(
        gram_index, [["spark"], ["batch"]], max_groups=16
    )
    assert ok is not None

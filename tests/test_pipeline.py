"""Pipeline library API: stage composition, reps reuse, config knobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chromem_go_spark.materialize import materialize
from chromem_go_spark.pipeline import (
    PipelineConfig,
    chunked_training_corpus,
    cluster_representatives,
    select_training_documents,
    training_corpus_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stats_match_inline_formulation(spark, docs):
    """The library stats equal the hand-composed query (the oracle
    semantics of training_pipeline)."""
    from chromem_go_spark.functions import text as T
    from chromem_go_spark.operators import dedup as D

    reps = D.dedup_clusters(docs, threshold=0.5)
    expect = {
        (r["lang_pred"], r["n_docs"], r["total_tokens"])
        for r in (
            docs.join(reps, "doc_id")
            .filter(F.col("cluster_rep") == F.col("doc_id"))
            .filter(T.quality_score("text") >= 0.3)
            .filter(T.lang_id("text").isin("en", "de", "fr", "es"))
            .groupBy(T.lang_id("text").alias("lang_pred"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(T.token_count("text")).cast("bigint").alias("total_tokens"),
            )
            .collect()
        )
    }
    got = {
        (r["lang_pred"], r["n_docs"], r["total_tokens"])
        for r in training_corpus_stats(docs).collect()
    }
    assert got == expect


def test_reps_reuse_and_chunking(spark, docs):
    """Precomputed reps feed several consumers without recomputing the
    pair graph; chunk output covers every selected doc."""
    cfg = PipelineConfig(chunk_size=300, chunk_overlap=50)
    reps = materialize(cluster_representatives(docs, cfg))
    survivors = select_training_documents(docs, cfg, reps)
    n_sel = survivors.count()
    assert 0 < n_sel < docs.count()

    chunks = chunked_training_corpus(docs, cfg, reps)
    assert chunks.select("doc_id").distinct().count() == n_sel
    row = chunks.head()
    assert len(row["chunk"]) <= 300

    # language gate off -> at least as many survivors
    cfg_all = PipelineConfig(languages=())
    assert select_training_documents(docs, cfg_all, reps).count() >= n_sel


def test_star_algorithm_same_selection(spark, docs):
    """cc_algorithm='star' selects the identical document set."""
    a = {r["doc_id"] for r in select_training_documents(docs).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in select_training_documents(
            docs, PipelineConfig(cc_algorithm="star")
        ).select("doc_id").collect()
    }
    assert a == b


def test_word_unit_config_reaches_dedup(spark):
    """dedup_unit='word' actually changes the clustering basis: docs
    identical up to word order cluster under char-grams but not under
    strict word-grams at a high threshold."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = a.split()
    rotated = " ".join(words[5:] + words[:5])
    df = spark.createDataFrame(
        [(1, a), (2, rotated)], "doc_id long, text string"
    )
    # char 3-gram jaccard of the pair is 0.875, word 3-gram is 0.6 —
    # a threshold between them separates the two units
    char_cfg = PipelineConfig(dedup_threshold=0.7, dedup_ngram=3)
    word_cfg = PipelineConfig(dedup_threshold=0.7, dedup_ngram=3, dedup_unit="word")
    char_reps = {
        r["doc_id"]: r["cluster_rep"]
        for r in cluster_representatives(df, char_cfg).collect()
    }
    word_reps = {
        r["doc_id"]: r["cluster_rep"]
        for r in cluster_representatives(df, word_cfg).collect()
    }
    # char 3-grams overlap heavily under rotation -> one cluster
    assert char_reps == {1: 1, 2: 1}
    # word 3-grams break at the rotation seam -> separate clusters
    assert word_reps == {1: 1, 2: 2}


def test_stratified_sample_deterministic_and_rated(spark, docs):
    """Hash sampling: replays identically, keeps ~rate per language, and
    the kept set for a lower rate is a SUBSET of a higher rate's
    (nested samples — the property that makes rate changes incremental,
    not a reshuffle of which docs survive)."""
    from chromem_go_spark.pipeline import stratified_sample

    full = {r["doc_id"] for r in stratified_sample(docs, {"en": 1.0}, 0.0).collect()}
    again = {r["doc_id"] for r in stratified_sample(docs, {"en": 1.0}, 0.0).collect()}
    assert full == again and full
    half = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}, 0.0).collect()}
    tenth = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.1}, 0.0).collect()}
    assert tenth <= half <= full
    assert 0.3 <= len(half) / len(full) <= 0.7
    # default_rate drives non-listed languages
    none_kept = stratified_sample(docs, {"zz": 1.0}, 0.0).count()
    assert none_kept == 0


def test_pack_chunks_budget_invariants(spark, docs):
    """Packing: pack ids are contiguous from 0 per doc; every pack
    except the last of a doc reaches the budget in token-stream terms
    (concatenate-then-split: pack p covers tokens [p*B, (p+1)*B))."""
    from chromem_go_spark.pipeline import PipelineConfig, chunked_training_corpus, pack_chunks

    cfg = PipelineConfig(chunk_size=120, chunk_overlap=0)
    chunks = chunked_training_corpus(docs, cfg)
    out = pack_chunks(chunks, budget_tokens=32).collect()
    assert out
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_idx"])
        packs = [r["pack_id"] for r in rows]
        assert packs[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:])), packs
        # exclusive prefix sum of tokens maps each chunk to floor(p/B)
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 32
            cum += r["n_tokens"]


def test_vocabulary_stats_matches_python(spark, docs):
    """Top-n vocabulary equals a direct Python count over the same
    tokenization, including the deterministic (count desc, token)
    order."""
    import re
    from collections import Counter

    from chromem_go_spark.pipeline import vocabulary_stats

    rows = docs.select("doc_id", "text").collect()
    total: Counter = Counter()
    dfreq: Counter = Counter()
    for r in rows:
        toks = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", (r["text"] or "").lower())
        total.update(toks)
        dfreq.update(set(toks))
    want = sorted(
        ((t, c, dfreq[t]) for t, c in total.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["token"], r["n_total"], r["n_docs"])
        for r in vocabulary_stats(docs, top_n=10).collect()
    ]
    assert got == want


def test_sample_per_group_deterministic_and_nested(spark, docs):
    """Per-group sampling: exactly min(n, group size) per group, stable
    across runs, and the n=5 sample is a prefix-subset of the n=10
    sample (nested — growing the eval set never swaps earlier picks)."""
    from chromem_go_spark.pipeline import sample_per_group
    from chromem_go_spark.functions import text as T

    def pick(n):
        return {
            (r["doc_id"],)
            for r in sample_per_group(docs, n).select("doc_id").collect()
        }

    s5, s10, again = pick(5), pick(10), pick(5)
    assert s5 == again
    assert s5 <= s10
    sizes = (
        sample_per_group(docs, 5)
        .groupBy(T.lang_id("text").alias("lang"))
        .count()
        .collect()
    )
    group_totals = {
        r["lang"]: r["count"]
        for r in docs.groupBy(T.lang_id("text").alias("lang")).count().collect()
    }
    for r in sizes:
        assert r["count"] == min(5, group_totals[r["lang"]])


def test_decontaminate_flags_overlapping_docs(spark):
    from chromem_go_spark.pipeline import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark engines"),
            (3, "quick brown fox jumps again and again today"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(corpus, ev, n=4).collect()}
    # doc 1 shares 'the quick brown fox' / 'quick brown fox jumps';
    # doc 3 shares 'quick brown fox jumps'; doc 2 is clean
    assert set(got) == {1, 3}
    assert got[1] >= 2 and got[3] >= 1


def test_decontaminate_short_docs_never_flagged(spark):
    from chromem_go_spark.pipeline import decontaminate

    corpus = spark.createDataFrame([(1, "too short")], "doc_id bigint, text string")
    ev = spark.createDataFrame([(9, "too short")], "doc_id bigint, text string")
    # both under n tokens: no shingles, no contamination, no crash
    assert decontaminate(corpus, ev, n=8).count() == 0


def test_mix_corpus_budgets_and_nesting(spark):
    from chromem_go_spark.pipeline import mix_corpus

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", "word " * (10 + i % 5)) for i in range(40)]
        + [(99, "xx", "dropped source")],
        "doc_id bigint, lang string, text string",
    )
    small = mix_corpus(docs, {"en": 1.0, "de": 1.0}, total_tokens=100)
    rows = small.collect()
    # sources absent from weights never appear
    assert {r["source"] for r in rows} <= {"en", "de"}
    # budget: running total BEFORE each taken doc is under 50 per source
    for r in rows:
        assert r["cum_before"] < 50
    # every source with data contributes at least one doc
    assert {r["source"] for r in rows} == {"en", "de"}
    # nesting: doubling the budget only ADDS docs (stable prefix)
    big = mix_corpus(docs, {"en": 1.0, "de": 1.0}, total_tokens=200)
    small_ids = {r["doc_id"] for r in rows}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids <= big_ids and len(big_ids) > len(small_ids)


def test_unigram_logprob_ranks_fluent_above_noise(spark):
    """The statistical quality signal must score common-token text as
    more probable (lower avg -logp) than rare-token noise, and an
    explicit reference corpus must drive the model."""
    from chromem_go_spark.pipeline import unigram_logprob_scores

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),       # all in-vocab
            (2, "zyzzyva qwertyuiop xylyl"),  # all OOV
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["avg_neg_logp"]
        for r in unigram_logprob_scores(docs, ref_docs=ref, vocab_size=16).collect()
    }
    assert got[1] < got[2]
    assert got[2] > 4.0  # OOV bucket is expensive by construction


def test_keep_best_per_cluster_picks_highest_quality(spark):
    from chromem_go_spark.pipeline import PipelineConfig, keep_best_per_cluster

    # docs 1/2/3 are near-identical (one cluster); doc 2 has less
    # punctuation noise -> highest quality score and must win even
    # though doc 1 has the smaller id. doc 4 is its own cluster.
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base + " !!! ... ;;;"),
            (2, base),
            (3, base + " ???"),
            (4, "completely different content about spark engines and files"),
        ],
        "doc_id long, text string",
    )
    out = {r["cluster"]: r for r in keep_best_per_cluster(docs).collect()}
    assert set(out) == {1, 4}
    assert out[1]["doc_id"] == 2
    assert out[1]["n_members"] == 3
    assert out[4]["doc_id"] == 4 and out[4]["n_members"] == 1
    # winner quality is the max over the cluster
    from chromem_go_spark.functions.text import quality_score
    import pyspark.sql.functions as F
    qs = {r["doc_id"]: r["q"] for r in docs.select("doc_id", F.round(quality_score("text"), 4).alias("q")).collect()}
    assert out[1]["quality"] == max(qs[1], qs[2], qs[3])


def test_keep_best_per_cluster_ties_break_by_id(spark):
    from chromem_go_spark.pipeline import keep_best_per_cluster

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(7, base), (9, base)], "doc_id long, text string"
    )
    out = keep_best_per_cluster(docs).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 7 and out[0]["n_members"] == 2


def test_weighted_sample_formula_and_determinism(spark):
    import hashlib
    import math

    from chromem_go_spark.pipeline import weighted_sample

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (5 + i))) for i in range(20)] + [(99, "   ")],
        "doc_id long, text string",
    )
    out = weighted_sample(docs, k=5).collect()
    assert len(out) == 5
    # empty doc filtered
    assert all(r["doc_id"] != 99 for r in out)
    # replay the priority formula independently
    def pri(did, w):
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float((1 << 60) + 1)
        return math.log(u) / w

    expect = sorted(((pri(i, 5 + i), i) for i in range(20)), key=lambda t: (-t[0], t[1]))[:5]
    assert [r["doc_id"] for r in out] == [i for _, i in expect]
    for r, (p, _) in zip(out, expect):
        assert r["priority"] == round(p, 8)
    # deterministic across calls
    again = weighted_sample(docs, k=5).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_pmi_collocations_finds_fixed_phrases(spark):
    from chromem_go_spark.pipeline import pmi_collocations

    rows = []
    # 'new york' always together; 'the' everywhere (high count, low PMI)
    for i in range(30):
        rows.append((i, "the new york office is near the harbor"))
    for i in range(30, 60):
        rows.append((i, "the weather is mild near the coast"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(docs, top_n=10, min_count=5).collect()
    pairs = {(r["w1"], r["w2"]): r for r in out}
    assert ("new", "york") in pairs
    ny = pairs[("new", "york")]
    assert ny["c_ab"] == 30 and ny["c_a"] == 30 and ny["c_b"] == 30
    # the fixed phrase outranks any pair involving 'the'
    the_pmis = [r["pmi"] for r in out if "the" in (r["w1"], r["w2"])]
    assert all(ny["pmi"] > p for p in the_pmis)
    # deterministic ordering
    assert [(r["pmi"], r["w1"], r["w2"]) for r in out] == sorted(
        [(r["pmi"], r["w1"], r["w2"]) for r in out], key=lambda t: (-t[0], t[1], t[2])
    )


def test_corpus_diff_statuses(spark):
    from chromem_go_spark.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA  "), (3, "gamma changed"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # normalization makes 'BETA  ' == 'beta'
    assert got == {1: "unchanged", 2: "unchanged", 3: "modified", 4: "added"}

    got2 = {r["doc_id"]: r["status"] for r in corpus_diff(new, old).collect()}
    assert got2[4] == "removed"


def test_shard_corpus_deterministic_and_writes_partitions(spark, tmp_path):
    from chromem_go_spark.pipeline import shard_corpus, shard_stats, write_corpus_shards

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * 10)) for i in range(200)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["shard"] for r in shard_corpus(docs, 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in shard_corpus(docs, 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))

    stats = shard_stats(docs, 8).collect()
    assert sum(r["n_docs"] for r in stats) == 200
    assert all(r["n_tokens"] == r["n_docs"] * 10 for r in stats)

    out = str(tmp_path / "shards")
    write_corpus_shards(docs, out, n_shards=8)
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == 8
    back = spark.read.parquet(out)
    assert back.count() == 200
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == a  # layout preserves the deterministic assignment


def _shard_docs(spark, tag: str, n: int = 60):
    return spark.createDataFrame(
        [(i, f"{tag} doc {i}") for i in range(n)], "doc_id long, text string"
    )


def _simulate_shard_crash(spark, path: str, point: str) -> None:
    """Drive the snapshot location into exactly the on-disk state a
    crash at each manifest-protocol step leaves (mirror of
    test_batchstate._simulate_crash_state):

      write gen dir           -> crash: 'staged' (manifest still old)
      commit manifest         -> crash: 'committed' (obsolete not GC'd)
      gc obsolete dirs        -> (complete)

    plus 'first_staged': a crash before the FIRST commit ever.
    """
    import os

    from chromem_go_spark.batchstate import write_json_commit
    from chromem_go_spark.pipeline import (
        _SHARDS_MANIFEST,
        shard_corpus,
        write_corpus_shards,
    )

    def stage(tag: str, gen: int) -> None:
        # the writer's stage step in isolation: gen dir written,
        # manifest untouched — exactly a crash-before-commit state
        (
            shard_corpus(_shard_docs(spark, tag), 4)
            .repartition(4, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{path}/gen={gen}")
        )

    if point == "first_staged":
        stage("v1", 1)
        return
    write_corpus_shards(_shard_docs(spark, "v1"), path, 4, commit_mode="manifest")
    if point == "staged":
        stage("v2", 2)  # manifest still names gen=1
    elif point == "committed":
        stage("v2", 2)
        write_json_commit(  # committed, but obsolete gen=1 not GC'd
            spark, path, _SHARDS_MANIFEST,
            {"live": "gen=2", "obsolete": ["gen=1"]},
        )
        assert os.path.isdir(f"{path}/gen=1")


def test_shard_manifest_commit_exactly_once(spark, tmp_path):
    """Happy path: generations alternate, the reader always sees ONE
    complete snapshot, and a raw read of the root is NOT the contract
    (staged dirs would leak into it)."""
    import os

    from chromem_go_spark.pipeline import read_corpus_shards, write_corpus_shards

    path = str(tmp_path / "snap")
    write_corpus_shards(_shard_docs(spark, "v1"), path, 4, commit_mode="manifest")
    back = read_corpus_shards(spark, path)
    assert back.count() == 60
    assert {r["text"][:2] for r in back.collect()} == {"v1"}
    write_corpus_shards(_shard_docs(spark, "v2", 80), path, 4, commit_mode="manifest")
    back = read_corpus_shards(spark, path)
    assert back.count() == 80
    assert {r["text"][:2] for r in back.collect()} == {"v2"}
    # the obsolete generation was GC'd
    gens = [d for d in os.listdir(path) if d.startswith("gen=")]
    assert gens == ["gen=2"]


def test_shard_manifest_crash_staged_keeps_old_live(spark, tmp_path):
    from chromem_go_spark.pipeline import read_corpus_shards, write_corpus_shards

    path = str(tmp_path / "snap_staged")
    _simulate_shard_crash(spark, path, "staged")
    # reader: the uncommitted gen=2 stage is invisible; v1 still live
    back = read_corpus_shards(spark, path)
    assert {r["text"][:2] for r in back.collect()} == {"v1"}
    # recovery: the next write GCs the stale stage and commits cleanly
    write_corpus_shards(_shard_docs(spark, "v3"), path, 4, commit_mode="manifest")
    back = read_corpus_shards(spark, path)
    assert {r["text"][:2] for r in back.collect()} == {"v3"}
    assert back.count() == 60


def test_shard_manifest_crash_committed_is_exactly_once(spark, tmp_path):
    import os

    from chromem_go_spark.pipeline import read_corpus_shards, write_corpus_shards

    path = str(tmp_path / "snap_committed")
    _simulate_shard_crash(spark, path, "committed")
    # reader sees the NEW snapshot only, despite the un-GC'd old dir
    back = read_corpus_shards(spark, path)
    assert {r["text"][:2] for r in back.collect()} == {"v2"}
    assert os.path.isdir(f"{path}/gen=1")  # crash left it behind
    # next write heals the GC
    write_corpus_shards(_shard_docs(spark, "v3"), path, 4, commit_mode="manifest")
    gens = sorted(d for d in os.listdir(path) if d.startswith("gen="))
    assert gens == ["gen=3"]
    assert {
        r["text"][:2]
        for r in read_corpus_shards(spark, path).collect()
    } == {"v3"}


def test_shard_manifest_crash_before_first_commit_raises(spark, tmp_path):
    import pytest as _pytest

    from chromem_go_spark.pipeline import read_corpus_shards, write_corpus_shards

    path = str(tmp_path / "snap_first")
    _simulate_shard_crash(spark, path, "first_staged")
    with _pytest.raises(ValueError, match="no snapshot was ever committed"):
        read_corpus_shards(spark, path)
    # re-running the write recovers
    write_corpus_shards(_shard_docs(spark, "v1"), path, 4, commit_mode="manifest")
    assert read_corpus_shards(spark, path).count() == 60


def test_shard_rename_mode_unchanged(spark, tmp_path):
    """Default mode keeps the plain layout and the plain reader works
    on it (back-compat)."""
    from chromem_go_spark.pipeline import read_corpus_shards, write_corpus_shards

    path = str(tmp_path / "snap_plain")
    write_corpus_shards(_shard_docs(spark, "v1"), path, 4)
    assert read_corpus_shards(spark, path).count() == 60
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rename"):
        write_corpus_shards(_shard_docs(spark, "v1"), path, 4, commit_mode="zzz")


def test_weighted_sample_k_exceeds_rows(spark):
    from chromem_go_spark.pipeline import weighted_sample

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    out = weighted_sample(docs, k=50).collect()
    assert len(out) == 2  # everything sampled, no error


# ------------------------------------------------------- quality model


def test_quality_model_scores_shape_and_range(spark, sf_dir):
    from chromem_go_spark.pipeline import quality_model_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_model_scores(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        assert 0.0 < r["quality_prob"] < 1.0
    # deterministic
    again = quality_model_scores(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_quality_model_scores_no_python_eval(spark, sf_dir):
    from chromem_go_spark.pipeline import quality_model_scores
    from chromem_go_spark.plans import explain as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = X.plan_flags(quality_model_scores(docs))
    assert not flags["has_python_eval"]
    assert not flags["n_shuffles"]


def test_quality_model_known_weights(spark):
    """Hand-checkable model: weight 1.0 in every bucket -> logit is
    exactly 1.0 for any non-empty doc (sum of n ones / n), sigmoid
    1/(1+e^-1)."""
    import math

    from chromem_go_spark.pipeline import quality_model_scores

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in quality_model_scores(docs, weights=[1.0] * 16, bias=0.5).collect()
    }
    assert out[1]["quality_logit"] == 1.5
    assert out[3]["quality_logit"] == 1.5
    assert out[2]["quality_logit"] == 0.5  # empty text -> bias only
    assert abs(out[1]["quality_prob"] - 1 / (1 + math.exp(-1.5))) < 1e-4


def test_select_for_training_model_gate(spark, sf_dir):
    from chromem_go_spark.pipeline import (
        PipelineConfig,
        quality_model_scores,
        select_for_training,
        select_training_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = PipelineConfig()
    base = {r["doc_id"] for r in select_training_documents(docs, cfg).select("doc_id").collect()}
    gated = {
        r["doc_id"]
        for r in select_for_training(docs, cfg, model_quality_min=0.5)
        .select("doc_id")
        .collect()
    }
    assert gated <= base
    passing = {
        r["doc_id"]
        for r in quality_model_scores(docs)
        .filter("quality_prob >= 0.5")
        .collect()
    }
    assert gated == base & passing
    assert base - gated  # the gate actually removes someone at 0.5


# --------------------------------------------------------------- DSIR


def test_dsir_weights_favor_target_distribution(spark):
    """Docs drawn from the target's vocabulary must outscore docs from
    a disjoint vocabulary under the importance weights."""
    from chromem_go_spark.pipeline import dsir_logratio, dsir_scores

    target_texts = ["alpha beta gamma delta"] * 3
    other_texts = ["zig zag zoom boom"] * 6
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_texts + other_texts)],
        "doc_id long, text string",
    )
    target = raw.filter("doc_id < 3")
    llr = dsir_logratio(raw, target, dim=64)
    assert len(llr) == 64
    out = {r["doc_id"]: r["dsir_logw"] for r in dsir_scores(raw, llr).collect()}
    assert min(out[i] for i in range(3)) > max(out[i] for i in range(3, 9))


def test_dsir_select_topk_and_resample_deterministic(spark):
    from chromem_go_spark.pipeline import dsir_select

    rows = [(i, "alpha beta" if i % 3 == 0 else "zig zag") for i in range(30)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter("doc_id % 3 = 0")
    top = dsir_select(raw, target, k=10, dim=64)
    ids = [r["doc_id"] for r in top.collect()]
    assert len(ids) == 10
    assert all(i % 3 == 0 for i in ids)  # top-k is exactly the target-like docs
    # gumbel resampling: deterministic given the seed, different draw order
    r1 = [r["doc_id"] for r in dsir_select(raw, target, k=10, dim=64, resample=True).collect()]
    r2 = [r["doc_id"] for r in dsir_select(raw, target, k=10, dim=64, resample=True).collect()]
    assert r1 == r2
    r3 = [r["doc_id"] for r in dsir_select(raw, target, k=10, dim=64, resample=True, seed="other").collect()]
    assert r1 != r3  # a different seed reshuffles the draw


def test_dsir_scores_no_python_eval(spark, sf_dir):
    from chromem_go_spark.pipeline import dsir_scores
    from chromem_go_spark.plans import explain as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = X.plan_flags(dsir_scores(docs, [0.1] * 128))
    assert not flags["has_python_eval"]
    assert not flags["n_shuffles"]


def test_dsir_empty_and_single_token_docs(spark):
    """size<2 docs must emit no bigrams (no inverted-sequence fanout)
    and empty docs score exactly 0."""
    from chromem_go_spark.pipeline import dsir_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "two tokens")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["dsir_logw"] for r in dsir_scores(docs, [1.0] * 16).collect()}
    assert out[1] == 0.0
    assert out[2] == 1.0       # one unigram, no bigram
    assert out[3] == 3.0       # two unigrams + one bigram


# ---------------------------------------------------------- bigram LM


def test_bigram_logprob_fluency_ordering(spark):
    """Docs made of the corpus's dominant bigrams must score lower
    (more probable) than token-salad docs over the same vocabulary."""
    from chromem_go_spark.pipeline import bigram_logprob_scores

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(8)] + [(100, "mat the on sat cat the")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_neg_logp2"] for r in bigram_logprob_scores(docs).collect()}
    assert out[0] < out[100]
    assert len(out) == 9


def test_bigram_logprob_short_docs_drop(spark):
    from chromem_go_spark.pipeline import bigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens here")], "doc_id long, text string"
    )
    out = bigram_logprob_scores(docs).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert out[0]["n_bigrams"] == 2


def test_bigram_logprob_interpolation_exact(spark):
    """Hand-checked: corpus = 'a b' x 4 -> bigrams {(a,b):4, (b,a):3},
    c(a)=c(b)=4, N=8, V=1000 -> p_uni=5/1009, oov=1/1009.
    P(b|a) = .7*(4/4) + .3*(5/1009); P(a|b) = .7*(3/4) + .3*(5/1009)."""
    import math

    from chromem_go_spark.pipeline import bigram_logprob_scores

    docs = spark.createDataFrame([(1, "a b a b a b a b")], "doc_id long, text string")
    r = bigram_logprob_scores(docs).collect()[0]
    p_uni = 5.0 / 1009.0
    p_ab = 0.7 * 1.0 + 0.3 * p_uni
    p_ba = 0.7 * (3.0 / 4.0) + 0.3 * p_uni
    want = -(4 * math.log2(p_ab) + 3 * math.log2(p_ba)) / 7
    assert r["n_bigrams"] == 7
    assert abs(r["avg_neg_logp2"] - round(want, 4)) < 1e-9


def test_bigram_logprob_no_python_eval(spark, sf_dir):
    from chromem_go_spark.pipeline import bigram_logprob_scores
    from chromem_go_spark.plans import explain as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = X.plan_flags(bigram_logprob_scores(docs))
    assert not flags["has_python_eval"]


def test_semantic_decontaminate_flags_planted_leak(spark):
    from chromem_go_spark.pipeline import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),       # exact eval dup
            (2, [0.99, 0.14]),     # near-paraphrase
            (3, [0.0, 1.0]),       # clean
        ],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in semantic_decontaminate(corpus, ev, 0.95).collect()}
    assert set(out) == {1, 2}
    assert out[1]["max_eval_sim"] == 1.0
    assert out[1]["n_eval_hits"] == 1
    clean = corpus.join(
        semantic_decontaminate(corpus, ev, 0.95).select("vec_id"),
        "vec_id",
        "left_anti",
    )
    assert [r["vec_id"] for r in clean.collect()] == [3]


def test_pack_corpus_invariants(spark, sf_dir):
    """Every doc lands in exactly one (shard, pack); within a pack the
    offsets + token counts tile the budget without overlap; packing is
    deterministic."""
    from chromem_go_spark.pipeline import pack_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_corpus(docs, budget_tokens=128, n_shards=8).collect()
    assert len(out) == docs.count()
    by_pack: dict = {}
    for r in out:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for rows in by_pack.values():
        rows.sort(key=lambda r: r["pack_offset"])
        # first member starts exactly where the previous pack spilled
        assert rows[0]["pack_offset"] < 128
        for a, b in zip(rows, rows[1:]):
            # members are laid out head-to-tail in the token stream
            assert b["pack_offset"] == (a["pack_offset"] + a["n_tokens"]) % 128 or \
                   b["pack_offset"] == a["pack_offset"] + a["n_tokens"]
    again = pack_corpus(docs, budget_tokens=128, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_corpus_report_known_corpus(spark):
    from chromem_go_spark.pipeline import corpus_report

    good = "the cat and the dog have been to the park with all of their friends " * 3
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good),                       # exact dup of 1
            (3, "mail me at a.b@example.com please do " * 10),
            (4, ""),                         # empty doc
        ],
        "doc_id long, text string",
    )
    r = corpus_report(docs).collect()[0]
    assert r["n_docs"] == 4
    assert r["exact_dup_rate"] == 0.25       # 4 docs, 3 distinct fingerprints
    assert r["pii_email_docs"] == 1
    assert r["n_langs"] >= 2                 # en + und at least
    assert 0.0 <= r["gopher_pass_rate"] <= 1.0
    assert r["total_tokens"] > 0


def test_split_corpus_stable_and_partitioned(spark, sf_dir):
    """Every doc gets exactly one split; assignments are stable under
    corpus growth (a doc keeps its split when new docs arrive) and
    roughly proportional; fractions > 1 reject."""
    import pytest as _pytest

    from chromem_go_spark.pipeline import split_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {r["doc_id"]: r["split"] for r in split_corpus(docs).collect()}
    assert len(out) == docs.count()
    n = len(out)
    n_train = sum(1 for s in out.values() if s == "train")
    assert n_train / n > 0.9  # 0.98 target, small-sample slack
    # stability: the half-corpus assignment agrees with the full one
    half = {
        r["doc_id"]: r["split"]
        for r in split_corpus(docs.filter("doc_id % 2 = 0")).collect()
    }
    assert all(out[k] == v for k, v in half.items())
    with _pytest.raises(ValueError, match="fractions"):
        split_corpus(docs, {"a": 0.9, "b": 0.2}).collect()


def test_length_buckets_integer_exact(spark):
    """Bucket = binary digit count of the token count (1→1, 2→2, 3-4→3,
    5-8→4 ...), empty text → bucket 0 — integer-exact, no float log."""
    from chromem_go_spark.pipeline import length_buckets, length_histogram

    rows = [(i, " ".join(["t"] * n)) for i, n in
            enumerate([0, 1, 2, 3, 4, 5, 8, 9, 16, 100])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"])
           for r in length_buckets(df).collect()}
    assert got == {0: (0, 0), 1: (1, 1), 2: (2, 2), 3: (3, 2), 4: (4, 3),
                   5: (5, 3), 6: (8, 4), 7: (9, 4), 8: (16, 5), 9: (100, 7)}
    h = {r["bucket"]: r for r in length_histogram(df).collect()}
    assert h[0]["pad_frac"] == 0.0
    # bucket 4 holds 8 and 9 tokens against a 16-token ceiling
    assert h[4]["n_docs"] == 2 and h[4]["total_tokens"] == 17
    assert h[4]["pad_frac"] == round(1 - 17 / 32, 4)


def test_source_report_dup_rate(spark):
    from chromem_go_spark.pipeline import source_report

    rows = [
        (1, "same text", "a"), (2, "same text", "a"), (3, "other", "a"),
        (4, "unique one", "b"), (5, "unique two", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_report(df).collect()}
    assert got["a"]["n_docs"] == 3 and got["a"]["dup_rate"] == round(1 - 2 / 3, 4)
    assert got["b"]["dup_rate"] == 0.0
    assert got["a"]["total_tokens"] == 5  # 2+2+1 whitespace tokens


def test_tokenizer_fertility_by_lang(spark):
    """Fertility >= 1 always (every word carries its end-mark piece);
    a language whose words never got merges pays more pieces/word."""
    from chromem_go_spark.pipeline import tokenizer_fertility

    rows = (
        [(i, "low low lowest newest", "en") for i in range(8)]
        + [(100 + i, "zqx wvj pfft", "xx") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # merges trained on the en slice only: "xx" is out-of-vocabulary
    # for the tokenizer, the realistic under-served-language shape
    from chromem_go_spark.operators import bpe as B

    merges = B.bpe_learn(df.filter(F.col("lang") == "en"), n_merges=30)
    got = {r["lang"]: r for r in tokenizer_fertility(df, merges=merges).collect()}
    assert got["en"]["words"] == 32 and got["xx"]["words"] == 6
    assert got["en"]["fertility"] >= 1.0
    # the unseen-vocab language splits to characters: strictly worse
    assert got["xx"]["fertility"] > got["en"]["fertility"]


def test_unimax_weights_policy_invariants(spark):
    """UniMax water-filling: every source respects its epoch cap, the
    budget is exhausted whenever any source is uncapped, allocations
    are monotone in source size within the uncapped region, and a
    budget small enough to under-fill every cap goes uniform."""
    from chromem_go_spark.pipeline import unimax_weights

    rows = (
        [(i, " ".join(["t"] * 10), "tiny") for i in range(2)]          # 20 tok
        + [(10 + i, " ".join(["t"] * 10), "mid") for i in range(20)]   # 200
        + [(100 + i, " ".join(["t"] * 10), "big") for i in range(200)] # 2000
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in unimax_weights(df, 1000, 2.0).collect()}
    # tiny caps at 2 epochs x 20 tokens; the rest splits fair
    assert got["tiny"]["alloc_tokens"] == 40.0
    assert abs(sum(r["alloc_tokens"] for r in got.values()) - 1000) < 1e-6
    assert got["mid"]["alloc_tokens"] == 400.0  # capped too (200*2)
    assert got["big"]["alloc_tokens"] == 560.0  # the remainder
    assert abs(got["big"]["weight"] - 0.56) < 1e-9
    # huge budget: everyone epoch-capped, budget NOT exhausted
    all_capped = {
        r["source"]: r["alloc_tokens"]
        for r in unimax_weights(df, 10_000_000, 2.0).collect()
    }
    assert all_capped == {"tiny": 40.0, "mid": 400.0, "big": 4000.0}
    # tiny budget, nobody capped: uniform thirds
    uniform = {
        r["source"]: r["alloc_tokens"]
        for r in unimax_weights(df, 30, 2.0).collect()
    }
    assert uniform == {"tiny": 10.0, "mid": 10.0, "big": 10.0}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        unimax_weights(df, 0)


def test_packed_shards_round_trip_token_exact(spark, tmp_path):
    """r8 composition (the training-loader handoff in one pipeline):
    pack_corpus_bpe -> write_corpus_shards(manifest) ->
    read_corpus_shards preserves every (doc, pack) row and the
    token-exact counts; the shard column write recomputes equals the
    packer's (one md5 formula end to end)."""
    from pyspark.sql import functions as F

    from chromem_go_spark.pipeline import (
        pack_corpus_bpe,
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} " * (1 + i % 4)) for i in range(40)],
        "doc_id long, text string",
    )
    packed = pack_corpus_bpe(docs, n_merges=10, budget_tokens=32, n_shards=4)
    before = {
        (r["doc_id"], r["shard"], r["pack_id"], r["pack_offset"], r["n_tokens"])
        for r in packed.collect()
    }
    path = str(tmp_path / "packed_snap")
    write_corpus_shards(packed, path, n_shards=4, commit_mode="manifest")
    back = read_corpus_shards(spark, path)
    after = {
        (
            r["doc_id"],
            int(r["shard"]),
            r["pack_id"],
            r["pack_offset"],
            r["n_tokens"],
        )
        for r in back.collect()
    }
    assert after == before
    # loader-side audit: per-shard token sums survive the round trip
    sums = {
        (int(r["shard"]), r["s"])
        for r in back.groupBy("shard")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    want = {
        (r["shard"], r["s"])
        for r in packed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    assert sums == want

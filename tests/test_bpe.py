import pytest

from chromem_go_spark.operators import bpe as B


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest low"),
            (3, "wider wide new"),
        ],
        "doc_id long, text string",
    )


def test_word_frequencies(corpus):
    wf = {r["w"]: r["freq"] for r in B.word_frequencies(corpus).collect()}
    assert wf["low"] == 4 and wf["new"] == 2 and wf["lowest"] == 1


def test_bpe_pair_counts_matches_hand_count(corpus):
    rows = B.bpe_pair_counts(corpus, top_n=5).collect()
    got = [(r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows]
    # hand count over the vocab {low:4, lower:1, lowest:1, new:2,
    # newer:1, newest:1, wider:1, wide:1}: (l,o) and (o,w) appear in
    # low/lower/lowest = 4+1+1 = 6; (w,</w>) ends low (4) AND new (2) = 6
    assert got[0] == ("l", "o", 6)
    assert got[1] == ("o", "w", 6)
    assert got[2] == ("w", "</w>", 6)
    counts = dict(((a, b), c) for a, b, c in got)
    assert counts.get(("n", "e")) == 4  # new/newer/newest
    # deterministic order: count desc then lexicographic
    assert got == sorted(got, key=lambda t: (-t[2], t[0], t[1]))


def test_learn_merges_tiny():
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.learn_merges(vocab, 4)
    # classic Sennrich example shape: 'es' then 'est' then 'est</w>'...
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    assert merges[2][:2] == ("est", "</w>")
    # next best: (l,o) in low+lower = 7
    assert merges[3][:2] == ("l", "o") and merges[3][2] == 7


def test_learn_merges_stops_when_dry():
    assert B.learn_merges({"ab": 1}, 100) == []  # no pair reaches count 2


def test_encode_word_greedy_matches_training_segmentation():
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.learn_merges(vocab, 10)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    assert "".join(B.encode_word("lowest", ranks)) == "lowest" + B.END_MARK
    assert B.encode_word("lowest", ranks)[-1] == "est</w>"
    assert B.encode_word("low", ranks) == ["low</w>"]


def test_bpe_learn_and_encode_end_to_end(corpus):
    merges = B.bpe_learn(corpus, n_merges=8)
    assert merges.columns == ["rank", "left_sym", "right_sym", "pair_count"]
    mrows = merges.collect()
    assert [r["rank"] for r in mrows] == list(range(len(mrows)))
    # first learned merge must equal the top pair-count entry
    top = B.bpe_pair_counts(corpus, top_n=1).collect()[0]
    assert (mrows[0]["left_sym"], mrows[0]["right_sym"]) == (
        top["left_sym"], top["right_sym"])

    enc = {r["doc_id"]: r["pieces"] for r in B.bpe_encode(corpus, merges).collect()}
    ranks = {(r["left_sym"], r["right_sym"]): r["rank"] for r in mrows}
    # every doc's pieces == concatenation of its words' greedy encodings
    import re
    for doc in corpus.collect():
        words = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", doc["text"].lower())
        expect = [p for w in words for p in B.encode_word(w, ranks)]
        assert enc[doc["doc_id"]] == expect
    # round-trip: joining pieces reproduces the words
    for doc_id, pieces in enc.items():
        joined = "".join(pieces).replace(B.END_MARK, " ").strip()
        txt = [r["text"] for r in corpus.collect() if r["doc_id"] == doc_id][0]
        assert joined == " ".join(txt.lower().split())


def test_encode_word_handles_oov_symbols():
    vocab = {"low": 5, "newest": 6}
    merges = B.learn_merges(vocab, 10)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = B.encode_word("zq9", ranks)  # chars never seen in training
    assert out == ["z", "q", "9", B.END_MARK]
    assert "".join(B.encode_word("lowzz", ranks)).replace(B.END_MARK, "") == "lowzz"


def test_bpe_piece_counts_local_matches_spark(spark, tmp_path):
    """The Spark-free twin (pyarrow read + same regex + same trainer +
    same encoder) produces the exact per-word piece counts the Spark
    bpe_encode path yields — the identity the pack_corpus_bpe oracle
    literal rests on."""
    rows = [
        (1, "the lowest low rate"),
        (2, "newest new widest wide"),
        (3, ""),
        (4, "low low low newest"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    # pyarrow twin reads a single file; point it at the part file
    import glob

    part = glob.glob(f"{p}/part-*.parquet")[0]
    local = B.bpe_piece_counts_local(part, n_merges=20)

    merges = B.bpe_learn(df, n_merges=20)
    enc = B.bpe_encode(df, merges)
    spark_counts = {}
    import re

    for doc in df.collect():
        for w in re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", doc["text"].lower()):
            spark_counts.setdefault(w, None)
    ranks = {
        (r["left_sym"], r["right_sym"]): r["rank"] for r in merges.collect()
    }
    for w in spark_counts:
        spark_counts[w] = len(B.encode_word(w, ranks))
    assert local == spark_counts
    # and per-doc sizes line up with the sum of word piece counts
    sizes = {r["doc_id"]: len(r["pieces"]) for r in enc.collect()}
    for doc in df.collect():
        words = re.findall(r"[a-z]+|[0-9]+|[^a-z0-9\s]", doc["text"].lower())
        assert sizes[doc["doc_id"]] == sum(local[w] for w in words)
    assert sizes[3] == 0  # empty doc -> zero pieces


def test_pack_corpus_bpe_counts_and_layout(spark):
    """pack_corpus_bpe packs by real piece counts: same deterministic
    (shard, order) layout as pack_corpus, but n_tokens == BPE pieces
    (>= whitespace words, since every word carries its end-mark and
    unseen words split into characters)."""
    from chromem_go_spark.pipeline import pack_corpus, pack_corpus_bpe

    rows = [(i, "low lower lowest newest wide" * (1 + i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ws = {r["doc_id"]: r for r in pack_corpus(df, 64, 4).collect()}
    bp = {r["doc_id"]: r for r in pack_corpus_bpe(df, n_merges=10,
                                                  budget_tokens=64,
                                                  n_shards=4).collect()}
    assert set(ws) == set(bp) == set(range(30))
    for i in range(30):
        assert bp[i]["shard"] == ws[i]["shard"]  # layout keys identical
        assert bp[i]["n_tokens"] >= ws[i]["n_tokens"]  # pieces >= words
    # packing invariant: offsets stay inside the budget
    assert all(0 <= r["pack_offset"] < 64 for r in bp.values())

"""Byte-pair-encoding tokenizer training over a distributed corpus.

Beyond the reference (chromem-go stores text, never tokenizes it,
SURVEY §2.4) — BPE vocabulary induction (Sennrich et al. 2016,
arXiv:1508.07909) is a standard step of an LLM training-data pipeline,
and its expensive half is corpus-shaped, not model-shaped:

- :func:`word_frequencies` / :func:`bpe_pair_counts` — the distributed
  statistics: aggregate the corpus to a (word, freq) table (one
  map-side-combined shuffle over token hashes), then count adjacent
  symbol pairs weighted by word frequency (pure Catalyst array
  expressions over the *aggregated vocabulary*, never over raw text —
  at 100 TB the vocab table is millions of rows where the corpus is
  trillions of tokens).
- :func:`bpe_learn` — the merge loop.  After aggregation the vocabulary
  is bounded (``max_vocab_words``, frequency-ranked), so the classical
  iterative merge runs driver-side on the collected table — the same
  shape every production BPE trainer uses (corpus pass distributed,
  merge loop on the word-frequency dict).  Deterministic: ties break on
  (count desc, pair lexicographic).
- :func:`bpe_encode` — distributed application: encode each DISTINCT
  word once with a Python kernel (greedy lowest-rank merging over a
  broadcast rank map), then map the corpus through the word→pieces
  table with an order-preserving posexplode/flatten — the raw text is
  never touched per-token by Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T

END_MARK = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): corpus word-frequency table over the regex word
    tokenizer (letter runs / digit runs / single symbols, lowercased).
    One shuffle with map-side partial aggregation."""
    return (
        df.select(F.explode(T.word_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _sym_pairs(words: DataFrame) -> DataFrame:
    """Explode each vocabulary word into adjacent symbol pairs
    (chars + terminal '</w>'), carrying the word frequency."""
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_MARK)),
    )
    with_syms = words.select("freq", syms.alias("s"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("s") - 1),
        lambda i: F.struct(
            F.element_at("s", i).alias("left_sym"),
            F.element_at("s", (i + F.lit(1)).cast("int")).alias("right_sym"),
        ),
    )
    return with_syms.select(F.explode(pairs).alias("p"), "freq").select(
        "p.left_sym", "p.right_sym", "freq"
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """The first BPE iteration's pair statistics: the ``top_n`` most
    frequent adjacent symbol pairs (initial symbols = characters plus a
    terminal word mark), weighted by word frequency.

    Two shuffles total (word agg, pair agg) — both over bounded
    vocabulary-shaped tables — then a TakeOrdered top-n.  Deterministic
    order: (count desc, left, right)."""
    counted = (
        _sym_pairs(word_frequencies(df, text_col))
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )
    return counted.orderBy(
        F.desc("pair_count"), "left_sym", "right_sym"
    ).limit(top_n)


# ------------------------------------------------------------- learning


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Classical BPE merge loop over a word-frequency dict.  Returns
    [(left, right, pair_count)] in merge order.  Stops early when no
    pair occurs twice.  Pure Python — the vocabulary is bounded."""
    seqs: dict[tuple[str, ...], int] = {}
    for w, f in vocab.items():
        seqs[tuple(list(w) + [END_MARK])] = seqs.get(tuple(list(w) + [END_MARK]), 0) + f
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        new_seqs: dict[tuple[str, ...], int] = {}
        for syms, f in seqs.items():
            m = _merge_word(syms, (left, right))
            new_seqs[m] = new_seqs.get(m, 0) + f
        seqs = new_seqs
    return merges


def bpe_learn(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_vocab_words: int = 1_000_000,
) -> DataFrame:
    """Train BPE merges: distributed word-frequency aggregation, then
    the driver-side merge loop over the (bounded) collected vocabulary.

    ``max_vocab_words`` caps the driver collect by frequency rank
    (deterministic tie-break on the word) — the long tail it drops
    contributes negligibly to pair counts, which is why every
    production BPE trainer aggregates first.  Returns a DataFrame
    (rank, left_sym, right_sym, pair_count) in merge order."""
    spark = df.sparkSession
    rows = (
        word_frequencies(df, text_col)
        .orderBy(F.desc("freq"), "w")
        .limit(max_vocab_words)
        .collect()
    )
    vocab = {r["w"]: r["freq"] for r in rows}
    merges = learn_merges(vocab, n_merges)
    return spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, left_sym string, right_sym string, pair_count long",
    )


# ------------------------------------------------------------- encoding


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encoding of one word: repeatedly apply the
    lowest-rank applicable merge (the GPT-2 style encoder loop)."""
    syms = list(word) + [END_MARK]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_piece_counts_local(
    parquet_path: str,
    n_merges: int = 50,
    text_col: str = "text",
) -> dict[str, int]:
    """Spark-free twin of ``bpe_learn`` + per-word ``encode_word``:
    read the corpus with pyarrow, tokenize with the same regex
    (functions/text.word_tokens), learn the same merges
    (:func:`learn_merges` is pure Python and deterministic), and
    return {word: piece count} for every distinct word — the literal
    map the DuckDB oracle uses to replay pack_corpus_bpe's token-exact
    counts without a JVM (the train_cluster_centroids_local pattern)."""
    import re

    import pyarrow.parquet as pq

    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    vocab: dict[str, int] = {}
    for t in pq.read_table(parquet_path, columns=[text_col])[
        text_col
    ].to_pylist():
        for w in pat.findall((t or "").lower()):
            vocab[w] = vocab.get(w, 0) + 1
    merges = learn_merges(vocab, n_merges)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    return {w: len(encode_word(w, ranks)) for w in vocab}


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with learned merges: (id, pieces array).

    Scale shape: the Python encoder runs once per DISTINCT word (an
    Arrow-batched mapInPandas over the vocabulary table, rank map
    captured in the closure), and the corpus rejoins that word→pieces
    mapping through a posexplode + broadcast-friendly equi-join +
    order-preserving flatten.  Raw documents never pass through
    Python."""
    import pandas as pd  # noqa: F401  (mapInPandas batch type)

    rank_map = {
        (r["left_sym"], r["right_sym"]): r["rank"]
        for r in merges.select("rank", "left_sym", "right_sym").collect()
    }

    def enc(batches):
        for pdf in batches:
            yield pdf.assign(
                pieces=[encode_word(w, rank_map) for w in pdf["w"]]
            )

    words = word_frequencies(df, text_col).select("w")
    pieces = words.mapInPandas(enc, "w string, pieces array<string>")

    toks = df.select(
        id_col, F.posexplode(T.word_tokens(text_col)).alias("pos", "w")
    )
    encoded = (
        toks.join(pieces, "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
    )
    # token-less docs (empty/whitespace text) produce no exploded rows;
    # left-join them back with an empty pieces array so every input id
    # appears exactly once in the output.
    return (
        df.select(id_col)
        .join(encoded, id_col, "left")
        .select(
            id_col,
            F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
        )
    )

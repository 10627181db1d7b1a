"""Deduplication operators for training-data pipelines.

Beyond the reference's surface (chromem-go has no dedup, SURVEY §2.4) —
these are the standard large-corpus dedup family, each built so the
expensive stages are shuffle-lean:

- exact_dedup          — hash-groupBy on a content fingerprint.
- ngram_jaccard_pairs  — exact Jaccard over char-shingle sets via an
                         inverted-index join (explode -> join on shingle
                         -> count), the oracle-checkable ground truth.
- minhash_lsh_pairs    — MinHash signatures + banded LSH bucketing; only
                         bucket-colliding pairs are verified, so the join
                         never goes quadratic. The scale path.
- simhash_pairs        — 64-bit SimHash + chunked hamming candidate join.
- embedding_neardup_pairs — cosine near-duplicates over an embedding
                         column: exact all-pairs (small/oracle) and a
                         random-hyperplane-bucketed variant (scale).

All hot paths are JVM expressions (xxhash64, explode, groupBy agg);
nothing touches Python per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from ..functions import vector as V


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one survivor (min id) per identical normalized text.

    One shuffle on the md5 fingerprint; the fingerprint groupBy gets
    map-side partial aggregation for free.
    """
    fp = T.fingerprint(text_col)
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the inverted-index input."""
    return (
        df.select(id_col, F.explode(T.char_shingles(text_col, k)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join.

    inverted index: explode distinct shingles, self-join on shingle to
    count intersections, then |A∪B| = |A|+|B|-|A∩B|. Only pairs sharing
    >=1 shingle survive the join — never a full cross product. At 100 TB
    this is still superlinear in pathological cases; minhash_lsh_pairs is
    the scale path and uses this only as a verifier on candidates.
    """
    sh = shingle_table(df, text_col, id_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per doc as ``num_hashes`` min-aggregates.

    Base shingle hash is JVM xxhash64; the hash family is the classic
    (a*x + b) mod p permutation over it. One explode + one groupBy with
    map-side combine — the signature build is a single shuffle.
    """
    import random

    rnd = random.Random(seed)
    # 2^31-1 keeps a*x + b < 2^62: no long overflow under ANSI mode.
    p = (1 << 31) - 1  # Mersenne prime
    coeffs = [(rnd.randrange(1, p), rnd.randrange(0, p)) for _ in range(num_hashes)]
    sh = shingle_table(df, text_col, id_col, k)
    x = F.pmod(F.xxhash64("shingle"), F.lit(p))
    aggs = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(p))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    bands x rows = num_hashes; two docs become candidates iff at least
    one band of their signatures collides (bucket groupBy-join — the
    shuffle key is the band hash, so volume is O(docs x bands), not
    O(docs^2)). Candidates are then verified with exact n-gram Jaccard
    against ``threshold`` (mirrors how production LLM dedup pipelines
    layer LSH recall + exact verification).
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, seed)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.col(f"mh_{bi * rows + r}") for r in range(rows)]).alias(
                    "bucket"
                ),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select(id_col, F.explode(band_structs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if not verify:
        return cand
    exact = ngram_jaccard_pairs(df, threshold=0.0, text_col=text_col, id_col=id_col, k=k)
    return (
        cand.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sum +1/-1 weighted votes
    of each token's xxhash64 bit, sign-threshold into the fingerprint.

    Explode + single groupBy with ``bits`` conditional sums — all codegen.
    """
    toks = df.select(
        id_col, F.explode(T.word_tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for b in range(bits - 1):  # skip the sign bit to stay in non-negative longs
        fp = fp + F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(id_col, fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Candidate generation by the 4x16-bit chunk trick (any pair within
    hamming 3 of a 64-bit hash agrees exactly on at least one 16-bit
    chunk) — the join key is (chunk_idx, chunk_value), never quadratic.
    """
    sh = simhash(df, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for i in range(4)
        ]
    )
    ix = sh.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    a = ix.alias("a")
    b = ix.alias("b")
    cand = (
        a.join(b, ["ci", "cv"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-duplicate pairs (all-pairs). Correctness-grade;
    use :func:`embedding_neardup_pairs_lsh` at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", V.cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing, then exact cosine only
    within buckets. Join key is (table, bucket-signature); a pair at
    cosine >= 0.95 collides in at least one table with high probability.
    """
    import numpy as np

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim))

    def sig_expr(t: int):
        bit = F.lit(0).cast("long")
        for pi in range(num_planes):
            proj = V.dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in planes[t, pi]]))
            bit = bit + F.when(
                proj > 0, F.shiftleft(F.lit(1).cast("long"), pi)
            ).otherwise(F.lit(0).cast("long"))
        return bit

    tables = F.array(
        *[F.struct(F.lit(t).alias("tbl"), sig_expr(t).alias("sig")) for t in range(num_tables)]
    )
    bucketed = df.select(id_col, vec_col, F.explode(tables).alias("b")).select(
        id_col, vec_col, F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("va"),
            F.col(f"b.{vec_col}").alias("vb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("cosine", V.cosine_similarity("va", "vb"))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )

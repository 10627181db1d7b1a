"""Token-gram inverted index for ``$contains`` pre-filtering.

The reference lists a full-text index as its one un-built roadmap item
(reference README.md:172 — "roaring bitmaps" for ``$contains``
pre-filtering before the vector scan).  Today a ``$contains`` filter is
a whole-corpus substring scan; at 100 TB that scan IS the query cost.

Spark-native realization: a character n-gram posting-list table

    (gram string, id)        -- one row per (distinct gram, doc)

built once per corpus snapshot (an amortized scheduled job, like an ANN
index build), written SORTED BY gram so parquet row-group min/max stats
prune the posting read down to the handful of grams a pattern needs.

Query compilation (:func:`contains_candidates`): a pattern P of length
>= n matches a document only if EVERY n-gram of P appears in that
document — so the candidate set is

    ids that contain ALL distinct n-grams of P

computed as a posting-list intersection: filter the index to the
pattern's grams (parquet-pruned — the scan never touches other grams),
group by id, keep ids whose gram count equals the pattern's distinct
gram count.  That is a SUPERSET of the true matches (grams may appear
apart), so the exact ``contains`` verify still runs — but only against
the pruned id set, never the whole corpus.

Scale shape: the posting read is a few grams' rows (parquet-pruned);
the intersection shuffles only those rows; the candidate ids reach the
corpus scan either as a pushed-down ``In`` filter (bounded candidate
sets — ``PushedFilters: [In(id, ...)]``, row groups skipped via
stats/bloom) or as a broadcast semi-join (unbounded fallback; AQE
broadcasts the small side).  Either way the expensive substring verify
runs on candidates only.

Patterns shorter than n can't use the index and fall back to the scan
filter — same results, documented cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GRAM = 3


def _gram_expr(text_col: str, n: int):
    """All distinct n-grams of a string as an array column — pure
    Catalyst (sequence + transform + array_distinct), no Python."""
    c = F.col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(0))),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def pattern_grams(pattern: str, n: int = DEFAULT_GRAM) -> list[str]:
    """The distinct n-grams of a query pattern (driver-side: patterns
    are tiny).  Empty when the pattern is too short for the index."""
    if len(pattern) < n:
        return []
    return sorted({pattern[i : i + n] for i in range(len(pattern) - n + 1)})


def build_gram_index(
    df: DataFrame,
    text_col: str = "content",
    id_col: str = "id",
    n: int = DEFAULT_GRAM,
) -> DataFrame:
    """The posting-list table (gram, id), one row per distinct gram per
    document.  ZERO shuffles (r14): ``_gram_expr`` already emits each
    doc's DISTINCT gram array, so the exploded (id, gram) rows are
    globally distinct by construction — the old trailing
    ``.distinct()`` paid a full shuffle of the posting stream to dedup
    rows that had no duplicates.  Persist it sorted by gram
    (``.sortWithinPartitions("gram")`` after a repartition on gram) so
    the per-query gram filter becomes parquet row-group pruning."""
    if n < 2:
        raise ValueError("gram index needs n >= 2")
    # the gram expression is INLINED into explode: exploding a NAMED
    # array column makes InferFiltersFromGenerate clone the whole
    # build into an inferred size()>0 filter below the Project —
    # computing every doc's gram array twice (see dedup.py's
    # hashed_shingle_table for the pathological regex variant)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_gram_expr(text_col, n)).alias("gram"),
        )
        .filter(F.length("gram") == n)
    )


def write_gram_index(
    index: DataFrame, path: str, num_partitions: int = 8
) -> None:
    """Persist the posting table RANGE-partitioned + sorted by gram:
    each output file covers a contiguous gram range and every row group
    carries tight gram min/max stats, so a query's gram ``isin`` filter
    prunes to the files/row groups actually holding those grams (hash
    partitioning would scatter each gram range across all files and
    defeat the stats)."""
    (
        index.repartitionByRange(num_partitions, "gram")
        .sortWithinPartitions("gram", "id")
        .write.mode("overwrite")
        .parquet(path)
    )


def contains_candidates(
    index: DataFrame, pattern: str, n: int = DEFAULT_GRAM
) -> DataFrame | None:
    """Compile a ``$contains`` pattern into the candidate id set via
    posting-list intersection, or ``None`` when the pattern is shorter
    than the gram size (caller falls back to the scan filter).

    The gram filter is an ``isin`` over <= len(pattern) literals —
    pushed to the posting parquet scan; the intersection is one
    groupBy over only those grams' rows."""
    grams = pattern_grams(pattern, n)
    if not grams:
        return None
    return (
        index.filter(F.col("gram").isin(grams))
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select("id")
    )


def contains_candidates_conjunctive(
    index: DataFrame, patterns: list[str], n: int = DEFAULT_GRAM
) -> DataFrame | None:
    """Candidate ids for SEVERAL conjunctively-required patterns (every
    pattern must match — ``$contains`` leaves under ``$and``): a true
    match contains every gram of every pattern, so ONE posting-list
    intersection over the union of all patterns' grams is the sound
    (superset) candidate set — no per-pattern passes.

    Patterns shorter than the gram size contribute nothing (they can't
    be indexed; the caller's exact verify still enforces them); returns
    ``None`` when no pattern is indexable."""
    grams = sorted({g for p in patterns for g in pattern_grams(p, n)})
    if not grams:
        return None
    return (
        index.filter(F.col("gram").isin(grams))
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select("id")
    )


def contains_candidates_disjunctive(
    index: DataFrame,
    groups: list[list[str]],
    n: int = DEFAULT_GRAM,
    max_groups: int = 16,
) -> DataFrame | None:
    """Candidate ids for a DISJUNCTION of conjunctive pattern groups
    (:func:`..filters.contains_pattern_groups` output — ``$contains``
    leaves composed through ``$or``): a matching document satisfies at
    least one group in full, so the candidate set is the UNION over
    groups of each group's posting intersection.

    Still ONE pass over the posting table: filter to the union of all
    groups' grams (parquet-pruned), ``collect_set`` the grams per id
    (one shuffle), then test per-group containment as an OR of
    ``forall(group_grams, g -> array_contains(...))`` literals —
    patterns are tiny, so the literal arrays are a handful of nodes.

    A group with NO indexable pattern makes the whole disjunction
    unprunable (that branch could match any document) — returns
    ``None``, callers fall back to the scan.  Empty ``groups`` is also
    ``None``.  So is a group count past ``max_groups`` (r10, ADVICE):
    the per-group containment test is one OR branch per group in a
    single Catalyst expression, and an uncapped caller (e.g. one group
    per query in a large batch) would build a left-deep tree that can
    stall analysis — a no-op prune is always sound, so skip instead."""
    if not groups or len(groups) > max_groups:
        return None
    gram_groups: list[list[str]] = []
    for pats in groups:
        grams = sorted({g for p in pats for g in pattern_grams(p, n)})
        if not grams:
            return None
        gram_groups.append(grams)
    if len(gram_groups) == 1:
        return contains_candidates_conjunctive(index, groups[0], n)
    all_grams = sorted({g for gs in gram_groups for g in gs})
    per_id = (
        index.filter(F.col("gram").isin(all_grams))
        .groupBy("id")
        .agg(F.collect_set("gram").alias("__gs"))
    )
    cond = None
    for grams in gram_groups:
        has_all = F.forall(
            F.array(*[F.lit(g) for g in grams]),
            lambda g: F.array_contains(F.col("__gs"), g),
        )
        cond = has_all if cond is None else (cond | has_all)
    return per_id.filter(cond).select("id")


def apply_candidate_prune(
    df: DataFrame,
    cand: DataFrame | None,
    id_col: str = "id",
    max_inlist: int = 10_000,
) -> DataFrame:
    """Shrink ``df`` to a candidate id set, scale-shaped: bounded sets
    (<= ``max_inlist``) collect to an ``In`` filter the parquet scan
    skips row groups with (``PushedFilters: [In(id,...)]`` — the
    plan-gated contract); larger sets stay distributed as a semi-join
    (AQE broadcasts the candidate side when it's small enough).
    ``cand=None`` (nothing indexable) returns ``df`` untouched.  The
    caller ALWAYS still applies its exact predicate — pruning only
    shrinks where the verify runs, never what it returns."""
    if cand is None:
        return df
    ids = [r[0] for r in cand.limit(max_inlist + 1).collect()]
    if len(ids) <= max_inlist:
        if not ids:
            return df.filter(F.lit(False))
        return df.filter(F.col(id_col).isin(ids))
    return df.join(cand.withColumnRenamed("id", id_col), id_col, "left_semi")


def where_contains_indexed(
    df: DataFrame,
    index: DataFrame,
    pattern: str,
    text_col: str = "content",
    id_col: str = "id",
    n: int = DEFAULT_GRAM,
    max_inlist: int = 10_000,
) -> DataFrame:
    """``$contains`` via the gram index: identical semantics to the
    scan filter (the exact substring verify always runs), but the
    corpus scan receives the PRUNED id set first (see
    :func:`apply_candidate_prune` for the In-pushdown / semi-join
    split).  Patterns below the gram size fall back to the plain scan
    filter — same rows either way."""
    verify = F.col(text_col).contains(F.lit(pattern))
    cand = contains_candidates(index, pattern, n)
    if cand is None:
        return df.filter(verify)
    return apply_candidate_prune(df, cand, id_col, max_inlist).filter(verify)

"""Skew-handling utilities for hot join keys.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; explicit salting remains the tool when one reduce key
is hot enough that a single task would still spill or straggle — e.g.
joining a 100 TB event log against a dimension where a handful of keys
carry half the volume.

``salted_join``: replicate the small side ``n_salts`` times, scatter the
big side uniformly across the salt space, join on (key, salt). Result is
row-identical to the plain join; the hot key's rows are spread over
``n_salts`` reduce partitions. Trade-off: the small side shuffles
``n_salts`` x its size — only worth it when it is genuinely small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting: ``big ⋈ small`` on ``on`` columns, hot-key
    safe. Supported joins: inner / left (the small side is replicated, so
    right/full would need dedup of unmatched rows)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    n = int(n_salts)
    big_s = big.withColumn(
        _SALT, (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n))).cast("int")
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<int>"))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)

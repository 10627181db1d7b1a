"""pandas_udf construction for Embedder objects.

Separate module WITHOUT ``from __future__ import annotations``:
pandas_udf infers its eval type from the function's type hints, and
postponed (string) annotations break that inference.
"""

from typing import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_embed_series_udf(embedder):
    @pandas_udf("array<float>")
    def embed_series(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            vecs = embedder.embed_batch(s.fillna("").tolist())
            yield pd.Series(vecs)

    return embed_series

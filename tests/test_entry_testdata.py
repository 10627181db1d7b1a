"""Schema-drift regression tests against the REAL driver testdata.

Round 3's only failure was invisible to the suite: the driver
regenerated events.parquet with a different ts encoding, the unit tests
(synthetic frames) stayed green, and only the sf0.01 oracle caught the
four broken queries.  These tests close that gap by running the actual
``__spark_entry__`` surface against /root/testdata/sf0.001:

- every ``queries()`` entry must at least ANALYZE against the real
  parquet schemas (catches AnalysisException-class drift for the whole
  surface at plan-build cost, no heavy execution);
- the events queries — the encoding-sensitive class — are additionally
  value-checked against the same DuckDB oracle the driver runs.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _hash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


ALL_QUERIES = {**entry.queries(), **entry.extra_queries()}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES.keys()))
def test_query_analyzes_on_real_testdata(spark, name):
    """df.schema forces full analysis (resolution + type checking)
    against the real parquet footers without running a job — the r3
    CAST_WITHOUT_SUGGESTION failure is caught exactly here."""
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert len(df.schema.fields) > 0


EVENTS_QUERIES = [
    "events_sessionize",
    "events_window_hourly",
    "events_session_window",
    "events_trending",
    "events_topk_users",
    "events_percentiles",
]


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_queries_match_duckdb_oracle(spark, name):
    duckdb = pytest.importorskip("duckdb")
    sql = {**entry.oracle_sql(), **entry.extra_oracle_sql()}[name]
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    sdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    odf = con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert _hash(sdf) == _hash(odf)

"""Self-check: run every queries() entry against its oracle_sql() via
DuckDB at sf0.01, mimicking the driver's compare (row count + column
names + order-insensitive values). Run: python tools/selfcheck.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from chromem_go_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # Data-dependent oracle literals (k-means centroids) must be trained
    # on the SAME sf the queries run at; the driver never sets this var,
    # so its compare keeps the sf0.01 default.
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(sys.argv[1:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # registry-inventory drift gate (no Spark needed): COVERAGE.md's
    # generated counts must match the live registry + bench list
    import inventory

    sys.argv, argv = [sys.argv[0], "--check"], sys.argv
    try:
        if inventory.main() != 0:
            return 1
    finally:
        sys.argv = argv
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # canonical window + the twin-operator extras: selfcheck covers BOTH
    # (the driver only checks queries(); extras get the same treatment here)
    qs = {**entry.queries(), **entry.extra_queries()}
    oracles = {**entry.oracle_sql(), **entry.extra_oracle_sql()}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in rel.description)
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            ok = False
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
        else:
            def keyed(rows, cols):
                out = []
                for r in rows:
                    d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
                    out.append(tuple(d[c] for c in duck_cols))
                return sorted(out, key=lambda x: tuple(str(v) for v in x))

            s_sorted = keyed(spark_rows, sdf.columns)
            d_sorted = keyed(duck_rows, [d[0] for d in rel.description])
            mism = [
                (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
            ]
            if mism:
                print(f"FAIL {name}: {len(mism)} row mismatches; first: {mism[0]}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Comparable baseline (BASELINE.md): chromem-go scores a 1536-dim corpus at
~2.5M doc-scores/ms-equivalent... its headline is 100k docs in 40 ms per
single query. Spark is a batch engine, so the headline here is batch kNN
throughput: (queries x docs) similarity scores per second, plus the
pipeline operators the reference doesn't have.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from chromem_go_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    bench_names = [
        "knn_topk",
        "knn_batch",
        "knn_filtered",
        "knn_negative_subtract",
        "ivf_search_exact",
        "dedup_exact",
        "ngram_jaccard",
        "minhash_lsh",
        "simhash_pairs",
        "embedding_neardup_lsh",
        "text_stats",
        "lang_id",
        "events_sessionize",
        "events_window_hourly",
    ]

    # Warm the JVM/session so the first measured query isn't paying startup.
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    times: dict[str, float] = {}
    for name in bench_names:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

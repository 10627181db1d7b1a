"""End-to-end retrieval stack tour: first-stage rankers (BM25, cosine,
hybrid RRF), PRF query expansion, MMR diversification, cross-encoder
reranking, filtered ANN serving, and the evaluation harness scoring
every ranker on the same judged queries.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/retrieval_stack.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from chromem_go_spark.functions import vector as V
from chromem_go_spark.operators import ann as ANN
from chromem_go_spark.operators.evaluation import macro_metrics, ranking_metrics
from chromem_go_spark.operators.hybrid import bm25_scores, hybrid_search, mmr_rerank, prf_search
from chromem_go_spark.operators.rerank import cross_encoder_rerank
from chromem_go_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("retrieval-stack")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding", "label"
    )

    print("== first stage: full BM25")
    bm25_scores(docs, ["spark", "join", "window"]).orderBy(
        F.desc("bm25"), "doc_id"
    ).show(5)

    print("== PRF expansion: widened query re-run")
    prf_search(docs, ["spark", "join"], k=5).show()

    print("== hybrid RRF: keyword + cosine fused")
    qv = [float(x) for x in emb.filter("vec_id = 3").head()["embedding"]]
    hybrid_search(corpus, ["spark", "join"], qv, k=5).show()

    print("== MMR: diversity-aware top-5")
    mmr_rerank(corpus, qv, k=5, fetch_k=20).show()

    print("== cross-encoder rerank over the BM25 top-20")
    first = (
        bm25_scores(docs, ["spark", "join", "window"])
        .orderBy(F.desc("bm25"), "doc_id").limit(20).join(docs, "doc_id")
    )
    cross_encoder_rerank(first, "spark join window strategies", k=5).show()

    print("== filtered ANN serving (predicate inside probed partitions)")
    idx = ANN.IVFSQIndex.build(emb, n_clusters=8, vec_col="embedding", id_col="vec_id")
    print("SQ8 index: 1 byte/dim codes;")
    ANN.IVFIndex.build(emb, n_clusters=8, vec_col="embedding", id_col="vec_id").search_filtered(
        qv, 5, nprobe=8, where=F.col("label") % 2 == 0
    ).show()

    print("== evaluation: cosine ranker vs label-match relevance")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        V.normalize("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(q.select("query_id", "qv")))
        .select(
            "query_id", "vec_id",
            V.dot(F.col("embedding").cast("array<double>"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    results = scored.withColumn("rank", F.row_number().over(w)).filter("rank <= 10")
    qrels = (
        emb.select("vec_id", "label")
        .join(F.broadcast(q.select("query_id", "qlabel")), F.col("label") == F.col("qlabel"))
        .select("query_id", "vec_id", F.lit(1).alias("rel"))
    )
    per_q = ranking_metrics(results, qrels, k=10, doc_col="vec_id")
    per_q.orderBy("query_id").show()
    macro_metrics(per_q).show()


if __name__ == "__main__":
    main()

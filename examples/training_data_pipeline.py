"""Training-data pipeline tour over the driver test tables: quality
gate -> language gate -> near-dup clustering -> token accounting, plus
ANN index build/search. The beyond-reference operator families a 100 TB
LLM data pipeline runs.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python examples/training_data_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chromem_go_spark.functions import text as T
from chromem_go_spark.operators import ann as ANN
from chromem_go_spark.operators import dedup as D
from chromem_go_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("example-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    print("== near-duplicate clusters (exact Jaccard -> connected components)")
    reps = D.dedup_clusters(docs, threshold=0.5, algorithm="star")
    n_docs = docs.count()
    n_reps = reps.filter(F.col("cluster_rep") == F.col("doc_id")).count()
    print(f"{n_docs} docs -> {n_reps} cluster representatives")

    print("\n== selection: dedup reps + quality >= 0.3 + target languages")
    survivors = (
        docs.join(reps, "doc_id")
        .filter(F.col("cluster_rep") == F.col("doc_id"))
        .filter(T.quality_score("text") >= 0.3)
        .filter(T.lang_id("text").isin("en", "de", "fr", "es"))
    )
    survivors.groupBy(T.lang_id("text").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("tokens"),
    ).show()

    print("== ANN: IVF-PQ index (16-byte codes) + batch search w/ exact re-rank")
    idx = ANN.IVFPQIndex.build(emb, n_clusters=8, m=16, vec_col="embedding", id_col="vec_id")
    qrows = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    idx.search_batch(
        [str(r["vec_id"]) for r in qrows],
        [list(r["embedding"]) for r in qrows],
        k=3,
        nprobe=4,
        rerank=64,
    ).show()

    print("== corpus mixing: deterministic per-language downsampling")
    from chromem_go_spark.pipeline import (
        PipelineConfig,
        chunked_training_corpus,
        pack_chunks,
        stratified_sample,
    )

    mixed = stratified_sample(docs, {"en": 1.0, "de": 0.5}, default_rate=0.1)
    mixed.groupBy(T.lang_id("text").alias("lang")).count().show()

    print("== repetition signal: duplicate word-trigram fraction (top 5)")
    docs.select(
        "doc_id", F.round(T.ngram_repetition("text", 3), 3).alias("rep3")
    ).orderBy(F.desc("rep3")).show(5)

    print("== sequence packing: chunks -> fixed 256-token packs per doc")
    chunks = chunked_training_corpus(mixed, PipelineConfig())
    packed = pack_chunks(chunks, budget_tokens=256)
    packed.groupBy("doc_id", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("doc_id", "pack_id").show(5)

    print("== hygiene: eval-set decontamination + PII scrubbing")
    from chromem_go_spark.pipeline import decontaminate

    ev = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    dirty = decontaminate(corpus, ev, n=4)
    print(f"{dirty.count()} corpus docs share a 4-gram with the eval slice")
    docs.select(
        "doc_id",
        T.pii_email_count("text").alias("emails"),
        F.md5(T.scrub_pii("text")).alias("clean_fp"),
    ).show(3)

    print("== exact substring dedup: cross-doc duplicated 10-token runs")
    from chromem_go_spark.operators.dedup import strip_duplicate_spans

    stripped = strip_duplicate_spans(docs, width=10)
    stripped.agg(
        F.sum("n_removed").alias("tokens_removed"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias("docs_touched"),
    ).show()

    print("== hybrid retrieval: keyword idf + cosine, RRF-fused")
    from chromem_go_spark.operators.hybrid import hybrid_search

    corpus_h = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    hybrid_search(corpus_h, ["window", "batch"], qv, k=5).show()

    print("== semantic dedup (SemDeDup): k-means clusters -> cosine prune")
    sem = D.semantic_dedup(emb, threshold=0.4, n_clusters=8)
    sem.groupBy("kept").count().show()

    print("== learned quality gate: hashed linear model (fastText-style)")
    from chromem_go_spark.pipeline import quality_model_scores

    quality_model_scores(docs).orderBy(F.desc("quality_prob")).show(3)

    print("== DSIR: importance-weighted selection toward the en slice")
    from chromem_go_spark.pipeline import dsir_select

    target = docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 5 == 0))
    dsir_select(docs, target, k=5, dim=512).show()

    print("== statistical quality: interpolated-bigram LM scores (top 3)")
    from chromem_go_spark.pipeline import bigram_logprob_scores

    bigram_logprob_scores(docs).orderBy("avg_neg_logp2").show(3)

    print("== published rule sets: Gopher pass rate at corpus-tuned thresholds")
    from chromem_go_spark.functions.text import gopher_quality_filter

    docs.groupBy(
        gopher_quality_filter("text", min_words=30, min_stopwords=1).alias("gopher_pass")
    ).count().show()

    print("== tokenizer training: top BPE merges from corpus statistics")
    from chromem_go_spark.operators.bpe import bpe_learn

    bpe_learn(docs, n_merges=5).show()

    print("== output layout: deterministic hash shards (balance audit)")
    from chromem_go_spark.pipeline import shard_stats

    shard_stats(docs, n_shards=8).orderBy("shard").show()

    print("== index maintenance: tombstone deletes applied at compact")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivf"
        ANN.IVFIndex.build(emb, n_clusters=8, vec_col="embedding", id_col="vec_id").save(path)
        ANN.IVFIndex.delete_ids(spark, path, [0, 1])  # logical, O(ids)
        ANN.IVFIndex.compact(spark, path)  # physical, inside the fold
        n = ANN.IVFIndex.load(spark, path, vec_col="embedding", id_col="vec_id").assigned.count()
        print(f"{emb.count()} vectors -> {n} after deleting 2")


if __name__ == "__main__":
    main()

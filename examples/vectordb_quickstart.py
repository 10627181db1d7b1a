"""Vector-DB quick start — the reference's minimal example re-expressed
(reference examples/minimal/main.go): create a collection, add
documents, run filtered queries.

Run: python examples/vectordb_quickstart.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chromem_go_spark import DB, Document
from chromem_go_spark.embeddings.stub import make_hash_embedding_func
from chromem_go_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-vectordb")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as root:
        # Persistent DB: collections live as (bucketed) parquet dirs.
        db = DB.new_persistent(spark, os.path.join(root, "db"))
        c = db.create_collection(
            "knowledge-base", embedding_func=make_hash_embedding_func(64)
        )
        c.add_documents(
            [
                Document("1", {"category": "technology", "lang": "en"},
                         content="The quick brown fox jumps over the lazy dog"),
                Document("2", {"category": "technology", "lang": "de"},
                         content="Der schnelle braune Fuchs springt"),
                Document("3", {"category": "science", "lang": "en"},
                         content="Gravity bends spacetime around massive objects"),
            ]
        )

        print("count:", c.count())
        print("\nplain query:")
        c.query("quick brown fox", n_results=2).select(
            "id", "content", "similarity"
        ).show(truncate=50)

        print("filtered query (metadata + $not_contains):")
        c.query(
            "quick brown fox",
            n_results=1,
            where={"lang": "en"},
            where_document={"$not_contains": "gravity"},
        ).select("id", "content", "similarity").show(truncate=50)

        print("batch query with per-query filters:")
        c.query_batch(
            query_texts=["fox", "spacetime"],
            n_results=2,
            per_query_filters=[
                {"where": {"category": "technology"}},
                {"where": {"category": "science"}},
            ],
        ).show(truncate=40)

        # Export the whole DB to a stream (S3-shaped API), re-import.
        import io

        buf = io.BytesIO()
        db.export_to_writer(buf, compress=True)
        buf.seek(0)
        db2 = DB(spark)
        db2.import_from_reader(buf)
        print("re-imported collections:", sorted(db2.list_collections()))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Similarity-search demo: IVF index -> top-k -> measured recall, one line.

Builds the learned-centroid IVF index over the embeddings table, answers
top-k for a query sample through the bucketed scale path, and scores its
recall against the exact brute-force tier in the same run — the
"measure, don't guess" loop for picking nlist/nprobe on a real corpus.

Usage: python scripts/ann_demo.py [sf_dir] [k] [nprobe]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from distributed_api_etl_spark.operators.similarity import (
        bruteforce_topk,
        ivf_multiprobe_topk,
    )
    from distributed_api_etl_spark.queries.registry import fan_out, table
    from distributed_api_etl_spark.session import get_spark, release_caches

    spark = get_spark(app_name="ann-demo")
    spark.sparkContext.setLogLevel("ERROR")

    emb = fan_out(table(spark, sf_dir, "embeddings"))
    n_vectors = emb.count()
    n_centroids = max(8, int(n_vectors**0.5) // 2)
    queries = emb.where(F.col("vec_id") % 97 == 0).select("vec_id")
    n_queries = queries.count()

    approx = ivf_multiprobe_topk(
        emb, "vec_id", "embedding", n_centroids, queries, k, nprobe=nprobe
    ).select("query_id", "neighbor_id")
    exact = bruteforce_topk(
        emb, emb.join(queries, "vec_id"), "vec_id", "embedding", k
    ).select("query_id", "neighbor_id")
    hit = approx.join(exact, ["query_id", "neighbor_id"]).count()
    total = exact.count()
    release_caches()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n_vectors,
                "n_queries": n_queries,
                "n_centroids": n_centroids,
                "k": k,
                "nprobe": nprobe,
                "recall_at_k": round(hit / total, 4) if total else None,
            }
        )
    )


if __name__ == "__main__":
    main()

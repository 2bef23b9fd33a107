"""Round-13 probe: kNN-graph build cost vs recall across bucket counts.

The all-vectors kNN graph (operators/similarity.py:knn_graph_bucket) is
quadratic WITHIN buckets, so `n_centroids` is the knob that trades scored
pairs (cost) against boundary-loss (recall). This probe sweeps bucket
count at fixed nprobe and measures, per configuration: scored candidate
pairs, build wall, and mean recall@k vs the exact graph — the sizing
table a SemDeDup / mutual-kNN clustering pass reads before building at
scale (pairs shrink ~linearly with bucket count; recall decays as cells
get smaller than the true neighborhoods; nprobe buys it back linearly).

Usage: python scripts/probe_knn_graph_sizing_r13.py [sf_dir]
"""

import json
import os
import sys
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_api_etl_spark.functions.vectors import cosine_similarity  # noqa: E402
from distributed_api_etl_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_probe_assign,
    knn_graph_bucket,
)

K = 5


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(32).cache()
    n = emb.count()

    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("sv"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("dv"))
    wt = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    truth = (
        a.join(F.broadcast(b), F.col("src") != F.col("dst"))
        .withColumn("cosine", cosine_similarity("sv", "dv"))
        .withColumn("rnk", F.row_number().over(wt))
        .where(F.col("rnk") <= K)
        .select("src", "dst")
        .cache()
    )
    n_truth = truth.count()

    rows = []
    for n_cent in (8, 32, 128):
        for nprobe in (1, 2):
            # scored-pairs census: sum over probed (bucket pairs)
            cents = emb.orderBy("vec_id").limit(n_cent)
            assigned = ivf_assign(emb, cents, "vec_id", "embedding")
            probes = ivf_probe_assign(
                emb.select("vec_id", "embedding"), cents, "vec_id", "embedding",
                nprobe,
            )
            pairs = (
                probes.groupBy("centroid_id").count().withColumnRenamed("count", "p")
                .join(
                    assigned.groupBy("centroid_id").count()
                    .withColumnRenamed("count", "c"),
                    "centroid_id",
                )
                .agg(F.sum(F.col("p") * F.col("c")).alias("pairs"))
                .collect()[0]["pairs"]
            )
            t0 = time.time()
            g = knn_graph_bucket(emb, "vec_id", "embedding", n_cent, K, nprobe=nprobe)
            hits = g.select("src", "dst").join(truth, ["src", "dst"]).count()
            wall = time.time() - t0
            rows.append(
                {
                    "n_centroids": n_cent,
                    "nprobe": nprobe,
                    "scored_pairs": int(pairs),
                    "pairs_vs_brute_pct": round(100.0 * pairs / (n * (n - 1)), 1),
                    "build_and_score_wall_s": round(wall, 2),
                    "mean_recall_ppm": int(1_000_000 * hits / n_truth),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n, "k": K,
        "loadavg": os.getloadavg()[0], "grid": rows,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-12 probe (VERDICT r11 next-round #7): does rerank depth (k_cand)
have to GROW with probe count (nprobe) at higher centroid counts?

The graded sweeps each fix one knob: ann_rerank_depth_recall_at_k sweeps
k_cand at fixed nprobe; ann_ivf_int8_rerank_recall_at_k sweeps nprobe at
fixed k_cand=10. A 100-TB operator reading those tables needs the cross
term: probing more buckets admits more (weaker) candidates into the int8
tier — if the true neighbors' quantized ranks degrade as the candidate
pool grows, a k_cand chosen at nprobe=2 silently under-serves at
nprobe=8. This grid measures compound recall@5 over the full
(nprobe x k_cand) lattice at n_centroids=32 (vs the graded heads' 8 —
closer to the sqrt(N) a real corpus uses, 2000 vectors at sf0.1).

Output: one markdown table for SCALE.md. Not a graded head — the graded
sweeps stay 1-D; this closes the budget-table gap identified in
VERDICT r11.

Usage: python scripts/probe_rerank_depth_diversity_r12.py [sf_dir]
"""

import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_api_etl_spark.operators.similarity import (  # noqa: E402
    bruteforce_topk,
    ivf_int8_multiprobe_topk,
)

N_CENTROIDS = 32
TOP_K = 5
N_QUERIES = 20
NPROBES = (1, 2, 4, 8)
K_CANDS = (5, 10, 20, 40)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id")

    truth = {
        (r.query_id, r.neighbor_id)
        for r in bruteforce_topk(
            emb, emb.where(F.col("vec_id") < N_QUERIES), "vec_id", "embedding", TOP_K
        ).collect()
    }

    grid = {}
    for nprobe in NPROBES:
        for k_cand in K_CANDS:
            served = {
                (r.query_id, r.neighbor_id)
                for r in ivf_int8_multiprobe_topk(
                    emb,
                    "vec_id",
                    "embedding",
                    N_CENTROIDS,
                    queries,
                    TOP_K,
                    k_cand=k_cand,
                    nprobe=nprobe,
                ).collect()
            }
            hits = len(served & truth)
            recall_ppm = (1_000_000 * hits) // (N_QUERIES * TOP_K)
            grid[(nprobe, k_cand)] = recall_ppm
            print(f"nprobe={nprobe} k_cand={k_cand}: recall_ppm={recall_ppm}",
                  flush=True)

    print()
    header = "| nprobe \\ k_cand | " + " | ".join(str(k) for k in K_CANDS) + " |"
    print(header)
    print("|" + "---|" * (len(K_CANDS) + 1))
    for nprobe in NPROBES:
        row = [f"| {nprobe} "]
        for k_cand in K_CANDS:
            row.append(f"| {grid[(nprobe, k_cand)]:,} ")
        print("".join(row) + "|")
    print()
    print(json.dumps({
        "sf_dir": sf_dir, "n_centroids": N_CENTROIDS, "top_k": TOP_K,
        "n_queries": N_QUERIES,
        "grid": {f"np{np_}_kc{kc}": v for (np_, kc), v in grid.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()

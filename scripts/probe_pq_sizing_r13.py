"""PQ codebook sizing probe (VERDICT r12 #3 / next-round #3).

The graded PQ head measures recall at k_codes=16 — deliberately crude.
Production PQ deployments use 256 codes per subspace (8-bit codes); this
probe sweeps the (m, k_codes) lattice at sf0.01 and reports compound
ADC->rerank recall@5 vs brute-force truth, alongside the compression
ratio — the sizing table a deployment reads before serving from a PQ
copy. Results land in SCALE.md.

Run: python scripts/probe_pq_sizing_r13.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from distributed_api_etl_spark.operators import similarity as S

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_QUERIES = 10
TOP_K = 5
K_CAND = 20
DIM = 64


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = (
        S.bruteforce_topk(emb, queries, "vec_id", "embedding", TOP_K)
        .select("query_id", "neighbor_id")
        .persist()
    )
    exact.count()
    results = []
    for m in (4, 8, 16):
        for k_codes in (16, 64, 256):
            cb = S.pq_train(
                emb, "vec_id", "embedding", DIM, m=m, k_codes=k_codes, iters=2
            )
            # materialize the codebook once (training is the offline
            # stage; serving plans shouldn't re-train per query batch)
            cb = spark.createDataFrame(
                cb.collect(), "s int, code int, cw array<double>"
            )
            served = S.pq_adc_topk(
                emb,
                queries.select("vec_id"),
                cb,
                "vec_id",
                "embedding",
                DIM,
                m,
                TOP_K,
                K_CAND,
            ).select("query_id", "neighbor_id")
            hits = served.join(exact, ["query_id", "neighbor_id"]).count()
            recall = hits / (N_QUERIES * TOP_K)
            row = {
                "m": m,
                "k_codes": k_codes,
                "bytes_per_vec": m if k_codes <= 256 else 2 * m,
                "compression_vs_float32": (4 * DIM) / m,
                "recall_at_5": round(recall, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"corpus": n_corpus, "results": results}))


if __name__ == "__main__":
    main()

"""OPQ / learned-rotation-ahead-of-PQ probe (VERDICT r13 next-round #4).

The PQ sizing lattice (SCALE.md "IVF-PQ composed") shows m=4 recall topping
out at 0.82 even at 256 codes/subspace — the textbook recovery is a learned
rotation before the subspace split (OPQ, Ge et al. CVPR'13): decorrelate
components and BALANCE variance across subspaces so no subspace carries
more structure than its k_codes centroids can quantize. This probe measures
whether that recovery exists on our synthetic embeddings, which the
dim-truncation probe already showed are nearly isotropic (an honest ~zero
is itself the sizing answer).

Variants, sharing one brute-force truth (orthonormal rotation preserves
cosine, so the original-space truth grades every variant):

- ``identity``   — the shipped pq_train/pq_adc_topk path, the baseline.
- ``perm``       — variance-snake permutation: sort components by corpus
  variance, deal them snake-order across the m subspaces. No rotation
  matrix at all — a static column permutation, pure JVM projection, the
  cheapest possible "OPQ" and fully engine-portable (a graded head could
  adopt it as-is).
- ``opq_ea``     — PCA rotation + eigenvalue allocation: second-moment
  matrix aggregated in Spark (64x64 — a bounded-metadata collect), eigh
  on the driver, eigenvectors dealt to subspaces by greedy log-eigenvalue
  balancing, vectors rotated via one Arrow-batched pandas UDF. The full
  OPQ form (minus the alternating refinement, which needs the codebook in
  the loop).

Run: python scripts/probe_opq_r14.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from distributed_api_etl_spark.operators import similarity as S

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_QUERIES = int(os.environ.get("OPQ_QUERIES", "50"))
TOP_K = 5
K_CAND = 20
DIM = 64
ITERS = 2


def component_variances(emb, vec_col: str) -> np.ndarray:
    rows = (
        emb.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg(F.col("x") * F.col("x")).alias("m2"), F.avg("x").alias("m1"))
        .orderBy("pos")
        .collect()
    )
    return np.array([r.m2 - r.m1 * r.m1 for r in rows])


def second_moment(emb, vec_col: str) -> np.ndarray:
    """X^T X / n as a DIM x DIM aggregate — pairwise component products
    aggregated in Spark (DIM^2 cells, bounded metadata), never a driver
    materialization of the corpus."""
    a = emb.select(F.posexplode(F.col(vec_col)).alias("i", "xi"), F.col(vec_col))
    pairs = a.select("i", "xi", F.posexplode(F.col(vec_col)).alias("j", "xj"))
    cells = (
        pairs.groupBy("i", "j").agg(F.avg(F.col("xi") * F.col("xj")).alias("c"))
        .collect()
    )
    M = np.zeros((DIM, DIM))
    for r in cells:
        M[r.i, r.j] = r.c
    return M


def snake_permutation(var: np.ndarray, m: int) -> list[int]:
    """Deal variance-sorted components snake-order over m subspaces; the
    permutation lists, subspace by subspace, which ORIGINAL component
    lands in each rotated slot."""
    order = np.argsort(-var, kind="stable")
    groups: list[list[int]] = [[] for _ in range(m)]
    for rank, comp in enumerate(order):
        rnd, pos = divmod(rank, m)
        s = pos if rnd % 2 == 0 else m - 1 - pos
        groups[s].append(int(comp))
    return [c for g in groups for c in g]


def eigen_allocation(eigvals: np.ndarray, m: int) -> list[int]:
    """Greedy balanced allocation of eigen-dims to subspaces (Ge et al.'s
    eigenvalue allocation): assign dims in descending-eigenvalue order to
    the non-full subspace with the smallest running log-eigenvalue sum."""
    d_sub = DIM // m
    order = np.argsort(-eigvals, kind="stable")
    sums = [0.0] * m
    groups: list[list[int]] = [[] for _ in range(m)]
    for comp in order:
        open_s = [s for s in range(m) if len(groups[s]) < d_sub]
        s = min(open_s, key=lambda s: (sums[s], s))
        groups[s].append(int(comp))
        sums[s] += float(np.log(max(eigvals[comp], 1e-12)))
    return [c for g in groups for c in g]


def rotate_frame(emb, vec_col: str, R: np.ndarray):
    """v -> R v per row, one Arrow-batched pandas UDF (probe-only: a graded
    head would need an engine-portable rotation — see SCALE.md entry)."""
    Rt = R.T.copy()

    @F.pandas_udf(ArrayType(DoubleType()))
    def rot(col: pd.Series) -> pd.Series:
        M = np.stack(col.to_numpy()).astype(np.float64)
        out = np.round(M @ Rt, 9)
        return pd.Series(list(out))

    return emb.select("vec_id", rot(F.col(vec_col)).alias(vec_col))


def permute_frame(emb, vec_col: str, perm: list[int]):
    arr = F.array(*[F.col(vec_col)[i].cast("double") for i in perm])
    return emb.select("vec_id", arr.alias(vec_col))


def measure(spark, emb, exact, label: str, m: int, k_codes: int) -> dict:
    cb = S.pq_train(emb, "vec_id", "embedding", DIM, m=m, k_codes=k_codes, iters=ITERS)
    cb = spark.createDataFrame(cb.collect(), "s int, code int, cw array<double>")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    served = S.pq_adc_topk(
        emb, queries.select("vec_id"), cb, "vec_id", "embedding",
        DIM, m, TOP_K, K_CAND,
    ).select("query_id", "neighbor_id")
    hits = served.join(exact, ["query_id", "neighbor_id"]).count()
    row = {
        "variant": label,
        "m": m,
        "k_codes": k_codes,
        "recall_at_5": round(hits / (N_QUERIES * TOP_K), 4),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    n = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    exact = (
        S.bruteforce_topk(emb, queries, "vec_id", "embedding", TOP_K)
        .select("query_id", "neighbor_id")
        .persist()
    )
    exact.count()

    var = component_variances(emb, "embedding")
    M = second_moment(emb, "embedding")
    eigvals, eigvecs = np.linalg.eigh(M)  # ascending
    results = [
        {
            "corpus": n,
            "var_min": round(float(var.min()), 6),
            "var_max": round(float(var.max()), 6),
            "var_ratio": round(float(var.max() / var.min()), 3),
            "eig_min": round(float(eigvals[0]), 6),
            "eig_max": round(float(eigvals[-1]), 6),
            "eig_ratio": round(float(eigvals[-1] / max(eigvals[0], 1e-12)), 3),
        }
    ]
    print(json.dumps(results[0]), flush=True)

    frames = {"identity": emb}
    for m in (4, 8):
        frames[f"perm_m{m}"] = permute_frame(
            emb, "embedding", snake_permutation(var, m)
        ).persist()
        alloc = eigen_allocation(eigvals, m)
        R = eigvecs[:, alloc].T  # row i of R = the allocated eigenvector
        frames[f"opq_ea_m{m}"] = rotate_frame(emb, "embedding", R).persist()

    for m in (4, 8):
        for k_codes in (64, 256):
            results.append(measure(spark, frames["identity"], exact, "identity", m, k_codes))
            results.append(measure(spark, frames[f"perm_m{m}"], exact, "perm", m, k_codes))
            results.append(measure(spark, frames[f"opq_ea_m{m}"], exact, "opq_ea", m, k_codes))
    print(json.dumps({"corpus": n, "results": results}))


if __name__ == "__main__":
    main()

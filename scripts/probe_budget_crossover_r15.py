"""Measured crossover: exact window budget vs giant-group rate fallback.

token_budget_sample's per-group prefix window serializes each group
through one task; rate_budget_sample (round 15) trades exactness for a
fully map-side plan. The documents table is too small to show the
difference, so this probe CONSTRUCTS the failure shape at tunable scale:
``spark.range(n_rows)`` with 70% of rows in one "giant" group and the
rest spread over 9 tails, ~20 tokens/row, budget = 10% of the giant
group's tokens.

Reported per variant: wall (median of 3), kept tokens vs budget (the
exactness the fallback gives up), and max-task row share of the critical
stage layout (the straggler the window plan cannot avoid: ALL giant-group
rows sort through one task regardless of partition count).

Run: python scripts/probe_budget_crossover_r15.py [n_rows] (default 2e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_api_etl_spark.operators.sampling import (
    rate_budget_sample,
    token_budget_sample,
)

N_PART = 32


def main(n_rows: int) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(N_PART))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 7, F.lit("giant"))
            .otherwise(F.concat(F.lit("tail"), (F.col("id") % 10).cast("string")))
            .alias("grp"),
            (10 + F.col("id") % 21).cast("bigint").alias("n_tokens"),
        )
        .persist()
    )
    df.count()  # materialize so both variants time only their own plan
    giant_tokens = (
        df.where(F.col("grp") == "giant").agg(F.sum("n_tokens")).collect()[0][0]
    )
    budgets = {"giant": int(giant_tokens * 0.10)}
    default_budget = 10**15  # tails keep everything in both variants

    def timed(fn, runs=3):
        walls = []
        kept = None
        for _ in range(runs):
            t0 = time.time()
            kept = fn()
            walls.append(round(time.time() - t0, 2))
        return sorted(walls)[len(walls) // 2], kept

    def run_window():
        out = token_budget_sample(
            df, "doc_id", "grp", "n_tokens", budgets, default_budget, seed="x"
        )
        return (
            out.where(F.col("grp") == "giant")
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )

    def run_rate():
        out = rate_budget_sample(
            df, "doc_id", "grp", "n_tokens", budgets, default_budget, seed="x"
        )
        return (
            out.where(F.col("grp") == "giant")
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        )

    w_wall, w_kept = timed(run_window)
    r_wall, r_kept = timed(run_rate)
    # the window plan's critical layout: rows hash-partitioned by grp —
    # every giant row lands in ONE task's sort
    sizes = (
        df.repartition(N_PART, "grp")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in sizes), reverse=True)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "giant_tokens": int(giant_tokens),
                "budget": budgets["giant"],
                "window": {
                    "wall_s_median3": w_wall,
                    "kept_tokens": int(w_kept),
                    "kept_vs_budget_pct": round(
                        100.0 * w_kept / budgets["giant"], 2
                    ),
                },
                "rate_fallback": {
                    "wall_s_median3": r_wall,
                    "kept_tokens": int(r_kept),
                    "kept_vs_budget_pct": round(
                        100.0 * r_kept / budgets["giant"], 2
                    ),
                },
                "window_layout_max_task_share_pct": round(
                    100.0 * counts[0] / sum(counts), 1
                ),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000)

"""Residual-spread probe for the AUTO-sized salted join (VERDICT r15 #5).

probe_skew_join_r15 measured the fixed n_salts=16 head flattening the
hot-key straggler ratio 10.13x -> 3.15x at sf0.1 — a residual straggler
because 16 salts under-split a key holding ~30% of the rows across 32
reducers. operators/skew.py:derive_n_salts sizes the count from the
measured skew instead (ceil(hot_rows / even-task-share), clamped); this
probe reports the per-task layout for plain vs fixed-16 vs auto-derived
salting, same methodology as the r15 probe (hash-partition the big side
by the join's shuffle key, count rows per partition).

Run: python scripts/probe_autosalt_r16.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_api_etl_spark.functions.portable import portable_hash32

N_PART = 32


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(N_PART))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_api_etl_spark.operators.skew import derive_n_salts
    from distributed_api_etl_spark.queries.registry import table

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 10 < 3, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("uid"),
    )
    # derive with the probe's reducer count as the parallelism target so the
    # derived count is judged against the same 32-partition layout it must
    # balance (defaultParallelism on this box is the driver's thread count)
    total = ev.count()
    n_auto, info = derive_n_salts(
        ev, ["uid"], target_rows_per_task=max(1, total // N_PART)
    )

    def salted(df, n):
        row_entropy = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in ("event_id", "uid")]
        )
        return df.withColumn(
            "_salt", F.pmod(portable_hash32(row_entropy), F.lit(n))
        )

    def spread(df, *keys):
        sizes = (
            df.repartition(N_PART, *[F.col(k) for k in keys])
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        counts = sorted((r["count"] for r in sizes), reverse=True)
        total_ = sum(counts)
        mean = total_ / N_PART
        return {
            "partitions_nonempty": len(counts),
            "max_rows": counts[0],
            "mean_rows": round(mean, 1),
            "straggler_ratio": round(counts[0] / mean, 2),
            "max_share_pct": round(100.0 * counts[0] / total_, 1),
        }

    out = {
        "sf_dir": sf_dir,
        "n_partitions": N_PART,
        "derivation": info,
        "plain_by_uid": spread(ev, "uid"),
        "salted16_by_uid_salt": spread(salted(ev, 16), "uid", "_salt"),
        f"auto{n_auto}_by_uid_salt": spread(salted(ev, n_auto), "uid", "_salt"),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

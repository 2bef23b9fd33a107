"""Per-task spread probe for the hot-key salted join (VERDICT r14 #6).

events_hot_user_salted_join collapses ~30% of events onto ONE join key
(uid=0). This probe measures what that does to the shuffle layout the join
actually executes on, plain vs salted:

- ``plain``  — rows hash-partitioned by ``uid`` (the layout a plain
  shuffle join deals to reducers): the hot key's entire 30% lands in one
  partition, so max/mean partition size ~ 0.3 * n_partitions.
- ``salted`` — rows hash-partitioned by ``(uid, _salt)`` with the salted
  join's own row-content salt (operators/skew.py:salted_join): the hot
  key spreads over n_salts buckets.

Reported per layout: per-partition row counts (max, mean, p99), the
straggler ratio max/mean, and the hot key's largest single-task share.
The join RESULT equality is the graded head's oracle; this probe is only
about task balance. Run: python scripts/probe_skew_join_r15.py [sf_dir]
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
N_SALTS = 16


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(N_PART))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from distributed_api_etl_spark.queries.registry import table

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 10 < 3, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("uid"),
    )
    row_entropy = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in ("event_id", "uid")]
    )
    salted = ev.withColumn(
        "_salt", F.pmod(portable_hash32(row_entropy), F.lit(N_SALTS))
    )

    def spread(df, *keys):
        sizes = (
            df.repartition(N_PART, *[F.col(k) for k in keys])
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        counts = sorted((r["count"] for r in sizes), reverse=True)
        total = sum(counts)
        mean = total / N_PART
        return {
            "partitions_nonempty": len(counts),
            "max_rows": counts[0],
            "mean_rows": round(mean, 1),
            "straggler_ratio": round(counts[0] / mean, 2),
            "max_share_pct": round(100.0 * counts[0] / total, 1),
        }

    out = {
        "sf_dir": sf_dir,
        "n_partitions": N_PART,
        "n_salts": N_SALTS,
        "plain_by_uid": spread(ev, "uid"),
        "salted_by_uid_salt": spread(salted, "uid", "_salt"),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

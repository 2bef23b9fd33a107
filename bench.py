#!/usr/bin/env python
"""Headline benchmark: runs the bench-tagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query executes to completion through the ``noop`` sink (full pipeline
runs on executors; nothing collected to the driver) — the honest way to time
a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from distributed_api_etl_spark.queries import load_all
    from distributed_api_etl_spark.session import get_spark

    spark = get_spark(app_name="daes-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    # JVM warmup outside the timed region: first parquet read (Hadoop FS +
    # footer machinery), a shuffle agg, a window, and a broadcast join —
    # the codepaths every timed query shares. Uses the tiny region table.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    w = Window.partitionBy("r_regionkey").orderBy("r_name")
    (
        region.join(F.broadcast(region.select("r_regionkey")), "r_regionkey")
        .withColumn("rn", F.row_number().over(w))
        .groupBy("r_name")
        .agg(F.sum("rn"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in bench_specs.items():
        # build inside the timed region: some operators (the API pipeline)
        # execute eagerly during build, and plan construction is cheap anyway
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()

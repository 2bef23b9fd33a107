#!/usr/bin/env python
"""Round-10 A/B (VERDICT r9 #4): xxhash64x2 (128-bit) compressed stream-score
join key for ngram_logprob_scores(order=5), registry-equivalent path (fan_out
+ full output columns to noop), min-of-2 per variant, one session.

Two regimes per key shape: broadcast allowed (the sf0.1 reality — the pruned
score table broadcasts) and autoBroadcastJoinThreshold=-1 + runtime bloom off
(the forced-shuffle 100-TB proxy, where join key width and partitioning reuse
actually bind). Counters decide what ships (SCALE.md discipline)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_api_etl_spark.operators.text import ngram_logprob_scores
from distributed_api_etl_spark.queries.registry import fan_out, table
from distributed_api_etl_spark.session import (
    get_spark,
    release_caches,
    shuffle_bytes_snapshot,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORDER = int(os.environ.get("PROBE_ORDER", "5"))

spark = get_spark(app_name="probe-fp128-join-r10")
spark.sparkContext.setLogLevel("ERROR")
print(f"loadavg={os.getloadavg()[0]:.2f} order={ORDER} sf={SF}", flush=True)

DEFAULT_BCAST = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
DEFAULT_BLOOM = spark.conf.get(
    "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
)

VARIANTS = [
    ("strings, bcast on (shipped)", False, True),
    ("fp128,   bcast on          ", True, True),
    ("strings, FORCED SHUFFLE    ", False, False),
    ("fp128,   FORCED SHUFFLE    ", True, False),
]

for _ in range(2):
    for label, fp, bcast in VARIANTS:
        if bcast:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", DEFAULT_BCAST)
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", DEFAULT_BLOOM
            )
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
            )
        best, mb = None, None
        for _r in range(2):
            release_caches()
            spark.catalog.clearCache()
            w0, _ = shuffle_bytes_snapshot(spark)
            t0 = time.perf_counter()
            docs = fan_out(table(spark, SF, "documents"))
            df = ngram_logprob_scores(
                docs, "doc_id", "text", order=ORDER, fp128_score_join=fp
            )
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            w1, _ = shuffle_bytes_snapshot(spark)
            best = dt if best is None else min(best, dt)
            mb = round((w1 - w0) / 1e6, 2)
        print(f"{label}  shuffle={mb:>7} MB  wall={best:.2f}s", flush=True)
    print("---", flush=True)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", DEFAULT_BCAST)
spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", DEFAULT_BLOOM)
release_caches()
spark.stop()

#!/usr/bin/env python
"""Round-9 A/B: singleton pruning x suffix-aligned cascade partitioning for
ngram_logprob_scores(order=5), registry-equivalent path (fan_out + full
output columns to noop), min-of-2 per variant, one session. Counters decide
what ships (SCALE.md discipline)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_api_etl_spark.session import (
    get_spark,
    release_caches,
    shuffle_bytes_snapshot,
)
from distributed_api_etl_spark.queries.registry import fan_out, table
from distributed_api_etl_spark.operators.text import ngram_logprob_scores

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORDER = int(os.environ.get("PROBE_ORDER", "5"))

spark = get_spark(app_name="probe-ngram-ab-r9")
spark.sparkContext.setLogLevel("ERROR")
print(f"loadavg={os.getloadavg()[0]:.2f} order={ORDER} sf={SF}", flush=True)

VARIANTS = [
    ("r8 shipped (prune=F, sufpart=F)", False, False),
    ("prune only  (prune=T, sufpart=F)", True, False),
    ("sufpart only(prune=F, sufpart=T)", False, True),
    ("BOTH        (prune=T, sufpart=T)", True, True),
]

for _ in range(2):
    for label, ps, sp in VARIANTS:
        best, mb = None, None
        for _r in range(2):
            release_caches()
            spark.catalog.clearCache()
            w0, _ = shuffle_bytes_snapshot(spark)
            t0 = time.perf_counter()
            docs = fan_out(table(spark, SF, "documents"))
            df = ngram_logprob_scores(
                docs, "doc_id", "text", order=ORDER,
                prune_singletons=ps, suffix_partitioning=sp,
            )
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            w1, _ = shuffle_bytes_snapshot(spark)
            best = dt if best is None else min(best, dt)
            mb = round((w1 - w0) / 1e6, 2)
        print(f"{label}  shuffle={mb:>7} MB  wall={best:.2f}s", flush=True)
    print("---", flush=True)
release_caches()
spark.stop()

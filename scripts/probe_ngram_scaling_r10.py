#!/usr/bin/env python
"""Round-10 1x/4x/10x corpus-scaling probe for ngram_logprob_scores(order=5)
on the SHIPPED pruned + suffix-aligned plan (VERDICT r9 #6; methodology:
the r7 winnow/edit-distance probes — union per-copy token-tagged document
copies so content is DISTINCT across copies, the linear-growth regime).

Beyond the exchange-linearity check, this measures the two quantities the
100-TB pruning argument actually rests on, at each scale:
  - distinct 5-gram count vs corpus size (the table-growth exponent), and
  - the singleton share of distinct 5-grams (c_5 = 1) plus the post-prune
    score-table fraction — pruning's value RISES iff the singleton share
    holds or grows with corpus diversity.
min-of-2 walls per scale, counters decide; one session.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_api_etl_spark.operators.text import LM_BOS, ngram_logprob_scores
from distributed_api_etl_spark.queries.registry import fan_out, table
from distributed_api_etl_spark.session import (
    get_spark,
    release_caches,
    shuffle_bytes_snapshot,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORDER = 5

spark = get_spark(app_name="probe-ngram-scaling-r10")
spark.sparkContext.setLogLevel("ERROR")
print(f"loadavg={os.getloadavg()[0]:.2f} order={ORDER} sf={SF}", flush=True)


def tagged_corpus(copies: int):
    base = fan_out(table(spark, SF, "documents")).select("doc_id", "text")
    parts = []
    for i in range(copies):
        tag = F.lit(f"c{i}_")
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "), lambda t: F.concat(tag, t)
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


for copies in (1, 4, 10):
    docs = tagged_corpus(copies)
    # table stats on the same padded-gram universe the operator scores
    toks = F.split(F.col("text"), " ")
    padded = F.concat(F.array(*[F.lit(LM_BOS)] * (ORDER - 1)), toks)
    gcols = [f"g{i}" for i in range(1, ORDER + 1)]
    arr = F.when(
        F.size(toks) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(
                *[F.element_at(padded, i + j).alias(gcols[j]) for j in range(ORDER)]
            ),
        ),
    ).otherwise(
        F.array().cast(
            f"array<struct<{','.join(c + ':string' for c in gcols)}>>"
        )
    )
    stats = (
        docs.select(F.explode(arr).alias("_g"))
        .select(*[F.col(f"_g.{c}").alias(c) for c in gcols])
        .groupBy(*gcols)
        .count()
        .agg(
            F.count("*").alias("distinct_grams"),
            F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).alias("singletons"),
        )
        .collect()[0]
    )
    dg, sg = stats["distinct_grams"], stats["singletons"]
    best, mb = None, None
    for _r in range(2):
        release_caches()
        spark.catalog.clearCache()
        w0, _ = shuffle_bytes_snapshot(spark)
        t0 = time.perf_counter()
        df = ngram_logprob_scores(tagged_corpus(copies), "doc_id", "text", order=ORDER)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        w1, _ = shuffle_bytes_snapshot(spark)
        best = dt if best is None else min(best, dt)
        mb = round((w1 - w0) / 1e6, 2)
    print(
        f"{copies}x  shuffle={mb:>8} MB  wall={best:.2f}s  "
        f"distinct_5grams={dg}  singleton_share={sg / dg:.4f}  "
        f"post_prune_table_frac={(dg - sg) / dg:.4f}",
        flush=True,
    )
release_caches()
spark.stop()

#!/usr/bin/env python
"""Round-9 probe: break down the documents_fivegram_logppl shuffle counter
(40.36 MB at sf0.1, the suite's largest) into its component exchanges, and
print the AQE-final join strategies, BEFORE designing singleton-tail pruning
(VERDICT r8 #1). Probe discipline per SCALE.md round-8 lesson: the full-head
probe materializes the SAME output columns the graded query does.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_api_etl_spark.session import (
    get_spark,
    release_caches,
    scoped_persist,
    shuffle_bytes_snapshot,
)
from distributed_api_etl_spark.queries.registry import fan_out, table
from distributed_api_etl_spark.operators.text import LM_BOS
from distributed_api_etl_spark.functions.textfns import tokens

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ORDER = 5

spark = get_spark(app_name="probe-ngram-breakdown")
spark.sparkContext.setLogLevel("ERROR")


def measure(label, build):
    release_caches()
    spark.catalog.clearCache()
    w0, _ = shuffle_bytes_snapshot(spark)
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    w1, _ = shuffle_bytes_snapshot(spark)
    print(f"{label:40s} shuffle={round((w1 - w0) / 1e6, 2):>8} MB wall={dt:.2f}s",
          flush=True)
    return df


gcols = [f"g{i}" for i in range(1, ORDER + 1)]


def stream_df():
    docs = fan_out(table(spark, SF, "documents"))
    t = tokens(F.col("text"))
    padded = F.concat(F.array(*[F.lit(LM_BOS)] * (ORDER - 1)), t)
    struct_type = f"array<struct<{','.join(c + ':string' for c in gcols)}>>"
    arr = F.when(
        F.size(t) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: F.struct(
                *[F.element_at(padded, i + j).alias(gcols[j]) for j in range(ORDER)]
            ),
        ),
    ).otherwise(F.array().cast(struct_type))
    return docs.select(F.col("doc_id"), F.explode(arr).alias("_g")).select(
        F.col("doc_id"), *[F.col(f"_g.{c}").alias(c) for c in gcols]
    )


# 1. fan_out alone
measure("fan_out(docs)", lambda: fan_out(table(spark, SF, "documents")))

# 2. corpus exchange: s5 materialized with ALL columns
measure(
    "s5 = stream.groupBy(g1..g5).count",
    lambda: stream_df().groupBy(*gcols).agg(F.count("*").alias("c_5")),
)

# 3. s5 + full rollup cascade + x tables (materialize each fully, one job)
def rollups():
    s = {ORDER: scoped_persist(stream_df().groupBy(*gcols).agg(F.count("*").alias(f"c_{ORDER}")))}
    for k in range(ORDER - 1, 0, -1):
        keys = gcols[ORDER - k:]
        s[k] = scoped_persist(s[k + 1].groupBy(*keys).agg(F.sum(f"c_{k+1}").alias(f"c_{k}")))
    x = {
        k: s[k].groupBy(*gcols[ORDER - k: ORDER - 1]).agg(F.sum(f"c_{k}").alias(f"x_{k}"))
        for k in range(2, ORDER + 1)
    }
    out = s[1].select(F.lit(1).alias("one"))
    for k in range(2, ORDER + 1):
        out = out.unionByName(x[k].select(F.lit(1).alias("one")))
    for k in range(ORDER, 1, -1):
        out = out.unionByName(s[k].select(F.lit(1).alias("one")))
    return out

measure("s5 + cascade rollups + x tables", rollups)

# 4. full graded head (registry path), full output columns
from distributed_api_etl_spark.queries import load_all

spec = load_all()["documents_fivegram_logppl"]
df = measure("FULL graded head (registry path)", lambda: spec.build(spark, SF))

# AQE-final plan: join strategies
release_caches()
spark.catalog.clearCache()
df2 = spec.build(spark, SF)
df2.write.format("noop").mode("overwrite").save()
plan = df2._jdf.queryExecution().executedPlan().toString()
import re
joins = [l.strip()[:120] for l in plan.splitlines()
         if re.search(r"Join|Exchange|Broadcast", l)]
print("\n--- AQE-final plan join/exchange lines ---")
for l in joins:
    print(l)

# table cardinalities
s5 = stream_df().groupBy(*gcols).agg(F.count("*").alias("c_5"))
s5 = scoped_persist(s5)
n_all = s5.count()
n_sing = s5.filter("c_5 = 1").count()
n_pos = stream_df().count()
print(f"\npositions={n_pos} distinct5grams={n_all} singletons={n_sing} "
      f"({100.0*n_sing/n_all:.1f}% of table, {100.0*n_sing/n_pos:.1f}% of stream)")
release_caches()
spark.stop()

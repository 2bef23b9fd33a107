#!/usr/bin/env python
"""Round-11 serving-path A/B: linear-scan int8 rerank vs composed
IVF+int8+rerank (operators/similarity.py:quantized_rerank_topk vs
ivf_int8_multiprobe_topk), SAME queries / k / k_cand, sf0.1.

The recall head proved the composed path costs zero compound recall vs
the probed fraction's own ceiling; this probe measures what the IVF
composition BUYS: the number of candidate-generation cosine evaluations
(the scan work that dominates at 100 TB) and the shuffle volume, at
matched output. Expectation: tier-1 scored pairs drop by ~nprobe /
n_centroids, everything else equal — the scan-fraction knob working as
designed. min-of-2 walls (indicative under load), counters + row counts
are the claim.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distributed_api_etl_spark.operators.similarity import (
    ivf_assign,
    ivf_int8_multiprobe_topk,
    ivf_probe_assign,
    quantize_embeddings,
    quantized_rerank_topk,
)
from distributed_api_etl_spark.queries.registry import fan_out, table
from distributed_api_etl_spark.session import (
    get_spark,
    release_caches,
    shuffle_bytes_snapshot,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CENTROIDS, K, K_CAND, NPROBE = 8, 3, 10, 2

spark = get_spark(app_name="probe-ann-serving-ab-r11")
spark.sparkContext.setLogLevel("ERROR")
print(f"loadavg={os.getloadavg()[0]:.2f} sf={SF}", flush=True)

emb = fan_out(table(spark, SF, "embeddings"))
n_corpus = emb.count()
queries = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 110)).select(
    "vec_id"
)
n_q = queries.count()

# candidate-generation work: pairs scored by tier 1 of each path
quant = quantize_embeddings(emb, "vec_id", "embedding", 127)
linear_pairs = n_q * (n_corpus - 1)
cents = quant.orderBy(F.col("vec_id")).limit(N_CENTROIDS).select("vec_id", "qvec")
assigned = ivf_assign(quant, cents, "vec_id", "qvec")
qv = queries.join(quant.select("vec_id", "qvec"), "vec_id")
probes = ivf_probe_assign(qv, cents, "vec_id", "qvec", NPROBE)
ivf_pairs = (
    assigned.select(F.col("vec_id").alias("neighbor_id"), "centroid_id")
    .join(probes.select("query_id", "centroid_id"), "centroid_id")
    .where(F.col("neighbor_id") != F.col("query_id"))
    .count()
)
print(
    f"tier-1 scored pairs: linear={linear_pairs}  ivf(nprobe={NPROBE})={ivf_pairs}"
    f"  ratio={ivf_pairs / linear_pairs:.4f} (expected ~{NPROBE}/{N_CENTROIDS}"
    f"={NPROBE / N_CENTROIDS:.3f})",
    flush=True,
)

for name, build in (
    (
        "linear_int8_rerank",
        lambda: quantized_rerank_topk(
            fan_out(table(spark, SF, "embeddings")),
            queries,
            "vec_id",
            "embedding",
            K,
            K_CAND,
        ),
    ),
    (
        "ivf_int8_rerank",
        lambda: ivf_int8_multiprobe_topk(
            fan_out(table(spark, SF, "embeddings")),
            "vec_id",
            "embedding",
            N_CENTROIDS,
            queries,
            K,
            K_CAND,
            nprobe=NPROBE,
        ),
    ),
):
    best, mb = None, None
    for _r in range(2):
        release_caches()
        spark.catalog.clearCache()
        w0, _ = shuffle_bytes_snapshot(spark)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        w1, _ = shuffle_bytes_snapshot(spark)
        best = dt if best is None else min(best, dt)
        mb = round((w1 - w0) / 1e6, 2)
    print(f"{name}: shuffle={mb} MB  wall={best:.2f}s", flush=True)

# stage 3: the DEPLOYED form — index stored partitionBy(centroid_id),
# served with the router's probed-bucket IN-filter (file-level pruning)
import shutil
import tempfile

from distributed_api_etl_spark.operators.similarity import (
    build_ivf_int8_index,
    ivf_int8_topk_from_index,
)

tmp = tempfile.mkdtemp(prefix="ivf_int8_index_")
try:
    index, cents_df = build_ivf_int8_index(
        fan_out(table(spark, SF, "embeddings")), "vec_id", "embedding", N_CENTROIDS
    )
    t0 = time.perf_counter()
    index.write.partitionBy("centroid_id").parquet(tmp, mode="overwrite")
    print(f"ingest (quantize+assign+write): {time.perf_counter() - t0:.2f}s", flush=True)
    stored = spark.read.parquet(tmp)
    n_files_all = (
        stored.select(F.input_file_name().alias("f")).distinct().count()
    )
    best, mb = None, None
    for _r in range(2):
        release_caches()
        spark.catalog.clearCache()
        w0, _ = shuffle_bytes_snapshot(spark)
        t0 = time.perf_counter()
        ivf_int8_topk_from_index(
            spark.read.parquet(tmp),
            cents_df,
            fan_out(table(spark, SF, "embeddings")),
            queries,
            "vec_id",
            "embedding",
            K,
            K_CAND,
            nprobe=NPROBE,
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        w1, _ = shuffle_bytes_snapshot(spark)
        best = dt if best is None else min(best, dt)
        mb = round((w1 - w0) / 1e6, 2)
    qv2 = queries.join(quant.select("vec_id", "qvec"), "vec_id")
    probed = sorted(
        r.centroid_id
        for r in ivf_probe_assign(qv2, cents, "vec_id", "qvec", NPROBE)
        .select("centroid_id")
        .distinct()
        .collect()
    )
    n_files_probed = (
        stored.where(F.col("centroid_id").isin(probed))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    print(
        f"stored_ivf_int8_rerank: shuffle={mb} MB  wall={best:.2f}s  "
        f"index_files_read={n_files_probed}/{n_files_all} "
        f"(probed buckets {probed})",
        flush=True,
    )
finally:
    shutil.rmtree(tmp, ignore_errors=True)

release_caches()
spark.stop()

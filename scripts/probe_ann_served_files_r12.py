"""Round-12 probe: files ACTUALLY read by the SERVED ANN plan.

VERDICT/ADVICE r11 (medium): the r11 "192/256 index files read" number was
measured on a standalone filtered scan (probe_ann_serving_ab_r11.py stage
3), not on the served job itself — and the served job's query-vector
lookup joined queries against the FULL stored index, so the served plan
scanned every index file for the probe-assignment subtree regardless of
pruning.

Round 12 fixed the lookup (ivf_int8_topk_from_index quantizes query
vectors from the embeddings side — bit-identical to the stored qvec, per
quantize_embeddings determinism), leaving the pruned candidate scan as
the ONLY read of the index layout. This probe verifies that ON THE
SERVED PLAN by walking the executed plan's FileSourceScanExec nodes and
reading their own "number of files read" SQLMetric after the collect —
the measurement the r11 addendum should have made.

Usage: python scripts/probe_ann_served_files_r12.py [sf_dir]
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from distributed_api_etl_spark.operators.similarity import (  # noqa: E402
    build_ivf_int8_index,
    ivf_int8_topk_from_index,
)


def scan_file_metrics(spark):
    """Per-scan "number of files read" for the MOST RECENT SQL execution,
    from the SQLAppStatusStore — the UI's own metric source, populated by
    the executed stages (plan-node accumulators under AQE are re-planned
    copies whose driver-side values stay 0, which is why the r11 probe
    could not measure the served job directly)."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    eid = last.executionId()
    vals = store.executionMetrics(eid)
    graph = store.planGraph(eid)
    nodes = graph.allNodes()
    out = []
    for i in range(nodes.size()):
        node = nodes.apply(i)
        if not node.name().startswith("Scan parquet"):
            continue
        desc = node.desc()
        files = None
        ms = node.metrics()
        for j in range(ms.size()):
            m = ms.apply(j)
            if m.name() == "number of files read":
                aid = m.accumulatorId()
                if vals.contains(aid):
                    files = str(vals.apply(aid))
        loc = ""
        for line in desc.splitlines():
            if "Location" in line:
                loc = line.strip()
        out.append({"location": loc, "files_read": files})
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 4).select("vec_id")
    # fan the build out like the graded head does (fan_out -> 32 upstream
    # partitions), so the partitioned write emits the realistic
    # many-files-per-bucket layout (up to 32 x 8 files) instead of the
    # single-upstream-file degenerate 8
    index, cents = build_ivf_int8_index(
        emb.repartition(32), "vec_id", "embedding", 8
    )
    out_dir = tempfile.mkdtemp(prefix="probe_served_files_")
    path = os.path.join(out_dir, "idx")
    try:
        index.write.partitionBy("centroid_id").parquet(path)
        stored = spark.read.parquet(path)
        n_parquet_files = sum(
            1
            for root, _d, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

        results = {}
        for pruned in (True, False):
            t0 = time.time()
            served = ivf_int8_topk_from_index(
                stored, cents, emb, queries, "vec_id", "embedding",
                3, 10, nprobe=2, prune_partitions=pruned,
            )
            n_rows = served.count()
            wall = time.time() - t0
            scans = scan_file_metrics(spark)
            idx_scans = [s for s in scans if "probe_served_files_" in s["location"]]
            results["pruned" if pruned else "unpruned"] = {
                "rows": n_rows,
                "wall_s": round(wall, 2),
                "index_scans_in_served_plan": len(idx_scans),
                "index_files_read": [s["files_read"] for s in idx_scans],
                "all_scans": scans,
            }
        print(json.dumps({
            "sf_dir": sf_dir,
            "index_parquet_files_on_disk": n_parquet_files,
            "loadavg": os.getloadavg()[0],
            "results": {
                k: {kk: vv for kk, vv in v.items() if kk != "all_scans"}
                for k, v in results.items()
            },
        }, indent=2))
        for k, v in results.items():
            print(f"-- {k}: all scans:")
            for s in v["all_scans"]:
                frag = s["location"].split("/")[-1][:40]
                print(f"   {frag}: files_read={s['files_read']}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-13 probe: files ACTUALLY read by the metadata-FILTERED served plan.

Same SQLAppStatusStore measurement as probe_ann_served_files_r12.py,
applied to the filtered serving path (ivf_int8_filtered_topk_from_index):
the per-query label-equality predicate must NOT change what the
probed-bucket IN-filter prunes at the file level — the predicate rides
the broadcast bucket join over rows the pruned scan already read, so
pruned files-read must equal the unfiltered roundtrip's, and the pruned
candidate scan must be the only read of the index directory.

Usage: python scripts/probe_filtered_served_files_r13.py [sf_dir]
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
    ivf_int8_filtered_topk_from_index,
    ivf_int8_topk_from_index,
)
from scripts.probe_ann_served_files_r12 import scan_file_metrics  # noqa: E402


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
    index, cents = build_ivf_int8_index(
        emb.repartition(32), "vec_id", "embedding", 8, carry_cols=("label",)
    )
    out_dir = tempfile.mkdtemp(prefix="probe_flt_served_files_")
    path = os.path.join(out_dir, "idx")
    try:
        index.write.partitionBy("centroid_id").parquet(path)
        stored = spark.read.parquet(path)
        n_parquet_files = sum(
            1
            for _root, _d, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
        results = {}
        cases = {
            "filtered_pruned": lambda: ivf_int8_filtered_topk_from_index(
                stored, cents, emb, queries, "vec_id", "embedding", "label",
                3, 10, nprobe=2, prune_partitions=True,
            ),
            "filtered_unpruned": lambda: ivf_int8_filtered_topk_from_index(
                stored, cents, emb, queries, "vec_id", "embedding", "label",
                3, 10, nprobe=2, prune_partitions=False,
            ),
            "unfiltered_pruned": lambda: ivf_int8_topk_from_index(
                stored, cents, emb, queries, "vec_id", "embedding",
                3, 10, nprobe=2, prune_partitions=True,
            ),
        }
        for label, build in cases.items():
            t0 = time.time()
            served = build()
            n_rows = served.count()
            wall = time.time() - t0
            scans = scan_file_metrics(spark)
            idx_scans = [
                s for s in scans if "probe_flt_served_files_" in s["location"]
            ]
            results[label] = {
                "rows": n_rows,
                "wall_s": round(wall, 2),
                "index_scans_in_served_plan": len(idx_scans),
                "index_files_read": [s["files_read"] for s in idx_scans],
            }
        print(json.dumps({
            "sf_dir": sf_dir,
            "index_parquet_files_on_disk": n_parquet_files,
            "loadavg": os.getloadavg()[0],
            "results": results,
        }, indent=2))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

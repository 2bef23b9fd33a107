#!/usr/bin/env python
"""spark-submit entry point: run a configured API-ETL pipeline on a cluster.

Reference parity: dags/scripts/run_demo_pipeline.py (the driver script the
reference's Airflow DAG submits to the Spark standalone REST API). Usage:

    spark-submit [cluster flags] scripts/submit_pipeline.py \
        --config configs/examples/noauth_demo.yml \
        --source-parquet /data/tracking_ids.parquet --id-column tracking_id

    # or synthesize a demo source of N ids (reference demo behavior):
    spark-submit ... scripts/submit_pipeline.py \
        --config configs/examples/noauth_demo.yml --generate-ids 10000

The script never sets master/deploy-mode itself — those belong to
spark-submit (see scripts/submit_demo.sh) so the same file runs under
local[*], standalone, YARN, or k8s unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="pipeline YAML/JSON path")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--source-table", help="catalog table to read the source from")
    src.add_argument("--source-parquet", help="parquet path to read the source from")
    src.add_argument(
        "--generate-ids",
        type=int,
        metavar="N",
        help="synthesize N sha2(uuid) tracking ids as the source (demo mode)",
    )
    ap.add_argument("--id-column", default="tracking_id")
    ap.add_argument("--dry-run", action="store_true", help="skip the sink write")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from distributed_api_etl_spark.config.loader import load_config
    from distributed_api_etl_spark.orchestration import (
        generate_tracking_ids,
        run_pipeline,
    )

    spark = SparkSession.builder.appName("distributed-api-etl-spark").getOrCreate()
    config = load_config(args.config)

    if args.generate_ids:
        source = generate_tracking_ids(spark, args.generate_ids)
    elif args.source_parquet:
        source = spark.read.parquet(args.source_parquet)
    else:
        source = spark.table(args.source_table)

    result = run_pipeline(
        spark,
        config,
        source_df=source,
        source_id=args.id_column,
        dry_run=args.dry_run,
    )
    stats = result.stats
    print(
        json.dumps(
            {
                "total_rows": stats.total_rows,
                "processed_rows": stats.processed_rows,
                "batches_ok": stats.batches_ok,
                "batches_failed": stats.batches_failed,
                "attempts": stats.attempts,
                "errors": stats.errors[:5],
            }
        )
    )
    return 1 if stats.batches_failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

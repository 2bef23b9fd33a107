#!/usr/bin/env bash
# Cluster submission examples for scripts/submit_pipeline.py.
# Reference parity: the Airflow DAG submits the equivalent driver script to
# the Spark standalone master's REST API (dags/demo_pipelines_dag.py); with
# spark-submit the same submission is one command per cluster manager.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CONFIG="${1:-$REPO/configs/examples/noauth_demo.yml}"

# Local smoke (what this sandbox can actually run):
spark-submit \
  --master "local[*]" \
  --conf spark.sql.shuffle.partitions=32 \
  --py-files <(cd "$REPO" && zip -qr - distributed_api_etl_spark) \
  "$REPO/scripts/submit_pipeline.py" \
  --config "$CONFIG" --generate-ids 1000 --dry-run

# Standalone cluster (the reference's docker-compose topology):
#   spark-submit --master spark://spark-master:7077 --deploy-mode client \
#     --conf spark.executor.instances=2 \
#     --py-files dist/distributed_api_etl_spark.zip \
#     scripts/submit_pipeline.py --config configs/pipeline.yml \
#     --source-table demo.tracking_ids
#
# YARN / k8s: swap --master yarn / k8s://https://<apiserver>; package the
# library with --py-files (zip) or a venv archive via --archives.

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All graded operators live in ``distributed_api_etl_spark.queries`` — each
module registers (spark builder, oracle SQL) pairs with identical output
column names/types on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from distributed_api_etl_spark.queries import load_all
    from distributed_api_etl_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    registry = load_all()
    flagship = registry.get("api_pipeline_bronze") or registry["q1_pricing_summary"]
    return flagship.build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from distributed_api_etl_spark.queries import load_all
    from distributed_api_etl_spark.session import apply_runtime_conf

    registry = load_all()

    def wrap(build):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return build(spark, sf_dir)

        return run

    return {name: wrap(spec.build) for name, spec in sorted(registry.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    from distributed_api_etl_spark.queries import load_all

    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
